package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApplier, ChangeFeed}

/** The `graft` STREAMING sink: micro-batches land through the applier —
  * envelope frames replicate, plain rows upsert, replay is a no-op. */
class GraftSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("graft_sink").toString

  private def accts(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi + 1).select(
      $"id".as("k"), ($"id" % 5).as("grp"),
      ($"id" * 1.5).as("bal"), concat(lit("t"), $"id" % 3).as("tag"))

  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)

  test("plain-row stream upserts with batch-id positions; restart replays as no-op") {
    val base = newDir()
    val target = base + "/t"
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double, String)]
    def run(): Unit = {
      val q = in.toDF().toDF("k", "grp", "bal", "tag")
        .writeStream.format("graft")
        .option("checkpointLocation", base + "/ckpt")
        .option("pk", "k").option("position", "1000")
        .start(target)
      try q.processAllAvailable() finally q.stop()
    }
    in.addData((1L, 1L, 1.0, "a"), (2L, 2L, 2.0, "b"))
    run()
    in.addData((1L, 1L, 9.0, "a2"), (3L, 3L, 3.0, "c"))
    run()
    val got = CdcApplier.snapshot(spark, target)
      .select($"k", $"bal").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 9.0, 2L -> 2.0, 3L -> 3.0))
    // a third run with no new data replays nothing and changes nothing
    run()
    val again = CdcApplier.snapshot(spark, target)
      .select($"k", $"bal").as[(Long, Double)].collect().toMap
    assert(again == got)
  }

  test("one-query replication: graft source into graft sink") {
    val base = newDir()
    val src = base + "/src"
    val dst = base + "/dst"
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(accts(1, 40), $"k" * 10),
      src, opts)
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", base + "/ckpt")
      .option("pk", "k")
      .start(dst)
    try {
      q.processAllAvailable()
      // positions are the stream's TOTAL order: later batches sit above
      // the earlier high-water mark or the cursor has already passed them
      CdcApplier.applyBatchMor(spark,
        ChangeFeed.updates(accts(1, 5), Map("bal" -> lit(0.5)), $"k" * 10 + 1000)
          .union(ChangeFeed.deletes(accts(39, 40), $"k" * 10 + 1000)),
        src, opts)
      q.processAllAvailable()
    } finally q.stop()
    val exp = CdcApplier.snapshot(spark, src).drop("_graft_pos")
      .as[(Long, Long, Double, String)].collect().toSet
    val got = CdcApplier.snapshot(spark, dst).drop("_graft_pos")
      .as[(Long, Long, Double, String)].collect().toSet
    assert(got == exp && got.size == 38)
  }

  test("partitionBy is refused (layout owns the physical shape)") {
    val base = newDir()
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val e = intercept[Exception] {
      in.toDF().toDF("k").writeStream.format("graft")
        .option("checkpointLocation", base + "/ckpt")
        .option("pk", "k")
        .partitionBy("k")
        .start(base + "/t")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bucketed by their persisted layout")),
      messages(e).mkString(" | "))
  }
}
