package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApplier, ChangeFeed}
import graft.cdc.CdcApplier.TargetMeta

/** The `graft` STREAMING source: change-feed tailing with checkpointed
  * offsets, metadata-driven polling, and the guards a cursor inherits from
  * the batch feed. */
class GraftStreamSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("graft_stream_src").toString

  private def accts(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi + 1).select(
      $"id".as("k"), ($"id" % 5).as("grp"),
      ($"id" * 1.5).as("bal"), concat(lit("t"), $"id" % 3).as("tag"))

  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)

  test("applyBatchMor maintains the maxPos high-water mark in meta") {
    val base = newDir()
    val target = base + "/t"
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(accts(1, 20), $"k" * 10),
      target, opts)
    val hconf = spark.sparkContext.hadoopConfiguration
    assert(TargetMeta.read(hconf, new Path(target)).flatMap(_.maxPos) == Some(200L))
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(accts(1, 3), Map("bal" -> lit(9.0)), lit(777L)),
      target, opts)
    assert(TargetMeta.read(hconf, new Path(target)).flatMap(_.maxPos) == Some(777L))
    // maintenance preserves it (compactMor rewrites meta via copy)
    CdcApplier.compactMor(spark, target)
    assert(TargetMeta.read(hconf, new Path(target)).flatMap(_.maxPos) == Some(777L))
  }

  test("tail delivers each lifecycle batch as one envelope micro-batch") {
    val base = newDir()
    val target = base + "/t"
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(accts(1, 50), $"k" * 10),
      target, opts)
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft").load(target)
      .writeStream.option("checkpointLocation", base + "/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select($"op", $"next_position").collect()
        got.synchronized {
          got ++= rows.map(r => (r.getString(0), r.getLong(1)))
          batchSizes += rows.length.toLong
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.size == 50 && got.forall(_._1 == "insert"))
      CdcApplier.applyBatchMor(spark,
        ChangeFeed.updates(accts(1, 5), Map("bal" -> lit(1.0)), $"k" * 10 + 1000)
          .union(ChangeFeed.deletes(accts(6, 7), $"k" * 10 + 1000)),
        target, opts)
      q.processAllAvailable()
      assert(got.size == 57)
      val second = got.drop(50)
      assert(second.count(_._1 == "update") == 5 && second.count(_._1 == "delete") == 2)
      // no new data -> no new batch (getOffset returned nothing fresh)
      q.processAllAvailable()
      assert(got.size == 57 && batchSizes.forall(_ > 0))
    } finally q.stop()
  }

  test("checkpoint restart resumes the cursor exactly once") {
    val base = newDir()
    val target = base + "/t"
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(accts(1, 30), $"k" * 10),
      target, opts)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(target)
        .writeStream.option("checkpointLocation", base + "/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val rows = df.select($"next_position").as[Long].collect()
          got.synchronized { got ++= rows }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(got.size == 30)
    // changes while the stream is DOWN, then a fresh run on the checkpoint
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(accts(1, 4), Map("tag" -> lit("x")), $"k" * 10 + 500),
      target, opts)
    run()
    // exactly the 4 new envelopes — the first 30 were not re-served
    assert(got.size == 34, s"got ${got.size}")
    assert(got.drop(30).toSet == (1 to 4).map(k => k * 10L + 500).toSet)
  }

  test("cow targets and pre-floor cursors are refused") {
    val base = newDir()
    val cow = base + "/cow"
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(accts(1, 5), lit(10L)), cow, opts)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(cow)
        .writeStream.option("checkpointLocation", base + "/ckpt1")
        .format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("copy-on-write") ||
      Option(e.getCause).exists(_.getMessage.contains("copy-on-write")), e.getMessage)

    val mor = base + "/mor"
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(accts(1, 5), lit(100L)), mor, opts)
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(accts(1, 5), Map("bal" -> lit(2.0)), lit(200L)), mor, opts)
    CdcApplier.compactMor(spark, mor)
    // collapsed floor is now >= 200; a cursor at 150 must refuse, not serve
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("graft").option("changesFrom", 150L).load(mor)
        .writeStream.option("checkpointLocation", base + "/ckpt2")
        .format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e2).exists(_.contains("retained history")), messages(e2).mkString(" | "))
  }
}
