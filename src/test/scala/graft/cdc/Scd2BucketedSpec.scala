package graft.cdc

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed SCD2 history layout: the per-batch IO must be proportional
  * to the TOUCHED buckets (untouched bucket dirs byte-identical across a
  * batch), with per-bucket exactly-once under crash replay. */
class Scd2BucketedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def rows(ids: Seq[Long], v: String): DataFrame =
    ids.map(id => (id, s"$v$id")).toDF("id", "v")

  private def newDir(): String =
    Files.createTempDirectory("graft_scd2b").toString + "/hist"

  private def histSet(df: DataFrame): Set[(Long, Long, Long, String, Boolean)] =
    df.select($"id", $"valid_from", $"valid_to", $"v", $"is_current").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3), r.getBoolean(4)))
      .toSet

  private def bucketFiles(dir: String): Map[String, Seq[(String, Long, Long)]] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).filter(_.isDirectory).map { d =>
      d.getPath.getName ->
        fs.listStatus(d.getPath).map(f =>
          (f.getPath.getName, f.getLen, f.getModificationTime)).toSeq.sortBy(_._1)
    }.toMap
  }

  test("a batch rewrites only the touched buckets; the rest are byte-identical") {
    val dir = newDir()
    val b1 = ChangeFeed.inserts(rows(1L to 64L, "a"), col("id") * 10)
    Scd2.applyHistoryBatchBucketed(spark, b1, 0L, dir, "id", Seq("v"), numBuckets = 8)
    val before = bucketFiles(dir)
    assert(before.size > 1, "need multiple buckets for the test to mean anything")

    // batch 1 touches a single key -> exactly one bucket may change
    val b2 = ChangeFeed.updates(rows(Seq(5L), "a"), Map("v" -> lit("upd")), lit(9999L))
    val rewritten = Scd2.applyHistoryBatchBucketed(spark, b2, 1L, dir, "id", Seq("v"), 8)
    assert(rewritten.size == 1, s"one key touches one bucket, rewrote $rewritten")
    val after = bucketFiles(dir)
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size == 1, s"exactly one bucket dir may differ, got $changed")

    // and the fold still lands on the fresh derivation
    val fresh = histSet(Scd2.history(b1.unionByName(b2), "id", Seq("v")))
    assert(histSet(Scd2.snapshotBucketed(spark, dir)) == fresh)
  }

  test("per-bucket replay guard: re-delivered batch is an exact no-op, older id fails") {
    val dir = newDir()
    val b1 = ChangeFeed.inserts(rows(1L to 32L, "a"), col("id") * 10)
    val b2 = ChangeFeed.updates(rows(Seq(3L, 4L), "a"), Map("v" -> lit("u")), lit(8888L))
    Scd2.applyHistoryBatchBucketed(spark, b1, 0L, dir, "id", Seq("v"), 8)
    Scd2.applyHistoryBatchBucketed(spark, b2, 1L, dir, "id", Seq("v"), 8)
    val snap = histSet(Scd2.snapshotBucketed(spark, dir))
    val files = bucketFiles(dir)

    // crash replay of the LAST batch: no bucket rewritten, bytes untouched
    val again = Scd2.applyHistoryBatchBucketed(spark, b2, 1L, dir, "id", Seq("v"), 8)
    assert(again.isEmpty && bucketFiles(dir) == files)
    assert(histSet(Scd2.snapshotBucketed(spark, dir)) == snap)

    // a batch id BELOW a touched bucket's marker = checkpoint/view mismatch
    val e = intercept[IllegalStateException](
      Scd2.applyHistoryBatchBucketed(spark, b2, 0L, dir, "id", Seq("v"), 8))
    assert(e.getMessage.contains("checkpoint/view mismatch"))

    assert(Scd2.lastAppliedBucketed(spark, dir).contains(1L))
  }

  test("the on-disk modulus wins over a differently-configured later run") {
    val dir = newDir()
    Scd2.applyHistoryBatchBucketed(spark,
      ChangeFeed.inserts(rows(1L to 16L, "a"), col("id") * 10),
      0L, dir, "id", Seq("v"), numBuckets = 4)
    // a run configured with 32 buckets must adopt the persisted 4
    Scd2.applyHistoryBatchBucketed(spark,
      ChangeFeed.inserts(rows(Seq(99L), "z"), lit(5000L)),
      1L, dir, "id", Seq("v"), numBuckets = 32)
    val ids = bucketFiles(dir).keySet.map(_.stripPrefix("graft_bucket=").toInt)
    assert(ids.forall(_ < 4), s"bucket ids must stay under the persisted modulus: $ids")
    assert(histSet(Scd2.snapshotBucketed(spark, dir)).exists(_._1 == 99L))
  }
}
