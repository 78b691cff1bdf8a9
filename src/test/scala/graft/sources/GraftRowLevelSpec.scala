package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier

/** SQL UPDATE / MERGE INTO via the delta-based row-level operation
  * (SupportsRowLevelOperations + SupportsDelta): every statement folds to
  * ONE applier change batch, so DML composes with history, change feeds
  * and MOR semantics. */
class GraftRowLevelSpec extends AnyFunSuite {
  private val warehouse = Files.createTempDirectory("graft_rowlevel").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.rl", "graft.catalog.GraftCatalog")
    .config("spark.sql.catalog.rl.root", warehouse)
    .getOrCreate()

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.ns")
  }

  test("UPDATE: non-PK columns, predicated") {
    setup()
    spark.sql("""CREATE TABLE rl.ns.u1 (k BIGINT, grp BIGINT, bal DOUBLE, tag STRING)
                 OPTIONS (pk 'k', buckets '8')""")
    spark.sql("""INSERT INTO rl.ns.u1
                 SELECT id, id % 5, id * 1.0, 'a', CAST(NULL AS BIGINT)
                 FROM range(1, 51)""")
    spark.sql("UPDATE rl.ns.u1 SET bal = bal * 2, tag = 'boosted' WHERE grp = 3")
    val got = spark.sql("SELECT k, bal, tag FROM rl.ns.u1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.length == 50)
    got.foreach { case (k, bal, tag) =>
      if (k % 5 == 3) assert(bal == k * 2.0 && tag == "boosted", s"k=$k")
      else assert(bal == k * 1.0 && tag == "a", s"k=$k")
    }
  }

  test("UPDATE: PK move retires the old key") {
    spark.sql("""CREATE TABLE rl.ns.u2 (k BIGINT, v STRING)
                 OPTIONS (pk 'k', buckets '4')""")
    spark.sql("""INSERT INTO rl.ns.u2
                 SELECT id, concat('v', id), CAST(NULL AS BIGINT)
                 FROM range(1, 6)""")
    // move k=2 to k=200: old key must disappear, new key carries the row
    spark.sql("UPDATE rl.ns.u2 SET k = 200 WHERE k = 2")
    val keys = spark.sql("SELECT k FROM rl.ns.u2").collect().map(_.getLong(0)).toSet
    assert(keys == Set(1L, 3L, 4L, 5L, 200L), keys.toString)
    val moved = spark.sql("SELECT v FROM rl.ns.u2 WHERE k = 200").collect()
    assert(moved.map(_.getString(0)).toSeq == Seq("v2"))
  }

  test("MERGE INTO: update + delete + insert branches in one statement") {
    spark.sql("""CREATE TABLE rl.ns.m1 (k BIGINT, bal DOUBLE, st STRING)
                 OPTIONS (pk 'k', buckets '8')""")
    spark.sql("""INSERT INTO rl.ns.m1
                 SELECT id, id * 10.0, 'live', CAST(NULL AS BIGINT)
                 FROM range(1, 11)""")
    spark.sql("""SELECT id AS k, id * 100.0 AS amt FROM range(5, 16)""")
      .createOrReplaceTempView("m1_src")
    spark.sql("""MERGE INTO rl.ns.m1 t USING m1_src s ON t.k = s.k
                 WHEN MATCHED AND s.k % 2 = 0 THEN UPDATE SET bal = s.amt, st = 'merged'
                 WHEN MATCHED THEN DELETE
                 WHEN NOT MATCHED THEN
                   INSERT (k, bal, st, _graft_pos)
                   VALUES (s.k, s.amt, 'new', CAST(NULL AS BIGINT))""")
    val got = spark.sql("SELECT k, bal, st FROM rl.ns.m1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    // 1-4 untouched; 5,7,9 deleted; 6,8,10 updated; 11-15 inserted
    val expected =
      (1L to 4L).map(k => (k, k * 10.0, "live")) ++
      Seq(6L, 8L, 10L).map(k => (k, k * 100.0, "merged")) ++
      (11L to 15L).map(k => (k, k * 100.0, "new"))
    assert(got == expected.sortBy(_._1), got.mkString(", "))
  }

  test("MERGE on a MOR target records ordinary versions (change feed sees them)") {
    spark.sql("""CREATE TABLE rl.ns.m2 (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', buckets '4', storage 'mor')""")
    spark.sql("""INSERT INTO rl.ns.m2
                 SELECT id, id * 1.0, CAST(NULL AS BIGINT) FROM range(1, 6)""")
    spark.sql("SELECT 3L AS k, 333.0 AS nv").createOrReplaceTempView("m2_src")
    spark.sql("""MERGE INTO rl.ns.m2 t USING m2_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.nv""")
    val got = spark.sql("SELECT k, v FROM rl.ns.m2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 333.0), (4L, 4.0), (5L, 5.0)))
    // the merge landed as a versioned delta: the feed carries an update for k=3
    val dir = s"$warehouse/ns/m2"
    val feed = CdcApplier.changeFeed(spark, dir, Long.MinValue)
      .selectExpr("op", "after.k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(feed.count(_ == ("update", 3L)) == 1 || feed.count(_ == ("insert", 3L)) == 2,
      feed.mkString(", "))
  }

  test("scale shape: a single-key UPDATE rewrites only the covered bucket") {
    spark.sql("""CREATE TABLE rl.ns.s1 (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', buckets '8')""")
    spark.sql("""INSERT INTO rl.ns.s1
                 SELECT id, id * 1.0, CAST(NULL AS BIGINT) FROM range(1, 201)""")
    val dir = new Path(s"$warehouse/ns/s1")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketFiles: Map[String, Set[String]] =
      fs.listStatus(dir).filter(_.getPath.getName.startsWith("graft_bucket="))
        .map(b => b.getPath.getName ->
          fs.listStatus(b.getPath).map(_.getPath.getName).toSet).toMap
    val before = bucketFiles
    spark.sql("UPDATE rl.ns.s1 SET v = -1.0 WHERE k = 42")
    val after = bucketFiles
    val changed = before.keySet.filter(b => before(b) != after.getOrElse(b, Set()))
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
    assert(spark.sql("SELECT v FROM rl.ns.s1 WHERE k = 42").first.getDouble(0) == -1.0)
  }

  test("statement atomicity: one position step, staging reclaimed") {
    spark.sql("""CREATE TABLE rl.ns.a1 (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', buckets '4')""")
    spark.sql("""INSERT INTO rl.ns.a1
                 SELECT id, id * 1.0, CAST(NULL AS BIGINT) FROM range(1, 6)""")
    spark.sql("UPDATE rl.ns.a1 SET v = v + 0.5 WHERE k <= 2")
    val dir = new Path(s"$warehouse/ns/a1")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(dir.getParent)
      .map(_.getPath.getName).filter(_.contains(".rowlevel-"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
    // both updated rows share one statement position pair
    val pos = spark.sql("SELECT DISTINCT _graft_pos FROM rl.ns.a1 WHERE k <= 2")
      .collect().map(_.getLong(0)).toSet
    assert(pos.size == 1, pos.toString)
  }
}
