package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier

/** The connector's WRITE surface: every route (`df.write`, SQL `INSERT
  * INTO` / `INSERT OVERWRITE`, `DELETE FROM`) is the CDC merge discipline
  * — upserts, tombstones, positions — not a blind append. */
class GraftWritesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("graft_writes").toString + "/t"

  private def accts(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi + 1).select(
      $"id".as("k"), ($"id" % 5).as("grp"),
      ($"id" * 1.5).as("bal"), concat(lit("t"), $"id" % 3).as("tag"))

  private def read(target: String): DataFrame =
    spark.read.format("graft").load(target).drop("_graft_pos")

  test("df.write append creates the layout and upserts on rewrite") {
    val target = newDir()
    accts(1, 100).write.format("graft")
      .option("pk", "k").option("buckets", "8").mode("append").save(target)
    assert(read(target).count() == 100)

    // second append of overlapping keys is an UPSERT, not duplication
    accts(1, 20).withColumn("bal", lit(999.0))
      .write.format("graft").mode("append").save(target)
    val got = read(target)
    assert(got.count() == 100)
    assert(got.filter($"k" <= 20 && $"bal" === 999.0).count() == 20)
    assert(got.filter($"k" > 20 && $"bal" === 999.0).count() == 0)
  }

  test("df.write overwrite replaces contents through tombstones") {
    val target = newDir()
    accts(1, 50).write.format("graft")
      .option("pk", "k").mode("append").save(target)
    accts(40, 60).write.format("graft").mode("overwrite").save(target)
    val keys = read(target).select($"k").as[Long].collect().toSet
    assert(keys == (40L to 60L).toSet)
  }

  test("first write without pk is refused with a naming error") {
    val target = newDir()
    val e = intercept[Exception] {
      accts(1, 5).write.format("graft").mode("append").save(target)
    }
    assert(e.getMessage.contains("pk"), e.getMessage)
  }

  test("SQL INSERT INTO a USING graft table upserts; INSERT OVERWRITE replaces") {
    val target = newDir()
    accts(1, 30).write.format("graft")
      .option("pk", "k").mode("append").save(target)
    spark.sql("DROP TABLE IF EXISTS graft_w")
    spark.sql(s"CREATE TABLE graft_w USING graft OPTIONS (path '$target')")
    try {
      // upsert k=1 with a new balance; position column explicit NULL → auto
      spark.sql(
        "INSERT INTO graft_w SELECT 1L AS k, 1L AS grp, 777.0 AS bal, " +
          "'tX' AS tag, CAST(NULL AS BIGINT) AS _graft_pos")
      val one = spark.sql("SELECT bal, tag FROM graft_w WHERE k = 1").collect()
      assert(one.map(r => (r.getDouble(0), r.getString(1))).toSeq == Seq((777.0, "tX")))
      assert(spark.sql("SELECT count(*) FROM graft_w").first.getLong(0) == 30)

      // explicit per-row position: a LOWER position than the stored row
      // loses last-writer-wins and must NOT change the state
      spark.sql(
        "INSERT INTO graft_w SELECT 1L, 1L, 111.0, 'tOld', CAST(1 AS BIGINT)")
      val still = spark.sql("SELECT bal FROM graft_w WHERE k = 1").first.getDouble(0)
      assert(still == 777.0)

      spark.sql(
        "INSERT OVERWRITE graft_w SELECT id AS k, id % 5 AS grp, " +
          "id * 2.0 AS bal, 'ow' AS tag, CAST(NULL AS BIGINT) AS _graft_pos " +
          "FROM range(100, 110)")
      val keys = spark.sql("SELECT k FROM graft_w").as[Long].collect().toSet
      assert(keys == (100L until 110L).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS graft_w")
  }

  test("SQL DELETE FROM tombstones selected keys, bucket-pruned") {
    val target = newDir()
    accts(1, 100).write.format("graft")
      .option("pk", "k").option("buckets", "8").mode("append").save(target)
    spark.sql("DROP TABLE IF EXISTS graft_d")
    spark.sql(s"CREATE TABLE graft_d USING graft OPTIONS (path '$target')")
    try {
      // pruning is observable: only buckets holding victim keys may be
      // swapped by the delete's applyBatch
      val root = new org.apache.hadoop.fs.Path(target)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def mtimes: Map[String, Long] = fs.listStatus(root)
        .filter(_.getPath.getName.startsWith("graft_bucket="))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
      val before = mtimes
      spark.sql("DELETE FROM graft_d WHERE k IN (3, 7, 9)")
      val touched = mtimes.filter { case (d, t) => before(d) != t }
      assert(touched.size <= 3, s"delete rewrote ${touched.keys}")
      val keys = spark.sql("SELECT k FROM graft_d").as[Long].collect().toSet
      assert(keys == (1L to 100L).toSet -- Set(3L, 7L, 9L))
      // deletion went through the applier: tombstones replay-safe (a
      // re-delete of a gone key is a no-op, not an error)
      spark.sql("DELETE FROM graft_d WHERE k = 3")
      assert(spark.sql("SELECT count(*) FROM graft_d").first.getLong(0) == 97)
    } finally spark.sql("DROP TABLE IF EXISTS graft_d")
  }

  test("writes to a mor target append versions visible to the change feed") {
    val target = newDir()
    accts(1, 10).write.format("graft")
      .option("pk", "k").option("storage", "mor").option("position", "100")
      .mode("append").save(target)
    accts(1, 3).withColumn("bal", lit(5.0))
      .write.format("graft").option("position", "200").mode("append").save(target)
    // latest-per-key through the read path
    assert(read(target).filter($"bal" === 5.0).count() == 3)
    // the SQL writes ARE the change history
    val feed = spark.read.format("graft").option("changesFrom", 150).load(target)
    assert(feed.count() == 3)
    assert(feed.select($"op").distinct().as[String].collect().toSeq == Seq("update"))
  }

  test("as-of / change-feed projections refuse writes") {
    val target = newDir()
    accts(1, 10).write.format("graft")
      .option("pk", "k").option("storage", "mor").option("position", "10")
      .mode("append").save(target)
    val e = intercept[Exception] {
      accts(1, 2).write.format("graft").option("asOfPos", "10")
        .mode("append").save(target)
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }

  test("adopted layout: a writer cannot re-bucket an existing target") {
    val target = newDir()
    accts(1, 40).write.format("graft")
      .option("pk", "k").option("buckets", "4").mode("append").save(target)
    // different buckets option on the second write is ignored (meta wins)
    accts(41, 45).write.format("graft")
      .option("pk", "k").option("buckets", "32").mode("append").save(target)
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(CdcApplier.bucketIds(fs, new org.apache.hadoop.fs.Path(target)).forall(_ < 4))
    assert(read(target).count() == 45)
  }
}
