package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier

/** Streaming MinHash-LSH admission: applier-target state, seen-based
  * rejection, exactly-once by position. */
class StreamNearDupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)
  private val a = "the quick brown fox jumps over the lazy dog again and again today"
  private val b = "completely different content about spark structured streaming state stores"
  private val c = "third unrelated text mentioning parquet buckets and tombstone compaction"

  test("cross-batch rejection, seen-based blocking, replay no-op") {
    val base = Files.createTempDirectory("snd").toString
    // batch 1: two distinct docs
    StreamNearDup.applyBatch(spark, Seq(doc(1, a), doc(2, b)).toDF("doc_id", "text"), base)
    // batch 2: an exact recrawl of 1 (rejected), a fresh doc (admitted),
    // and a recrawl of the recrawl (rejected — seen-based: blocked by BOTH)
    StreamNearDup.applyBatch(spark,
      Seq(doc(3, a), doc(4, c), doc(5, a)).toDF("doc_id", "text"), base)
    def admitted = StreamNearDup.admitted(spark, base).as[Long].collect().toSeq
    assert(admitted == Seq(1L, 2L, 4L), admitted.toString)

    // replay batch 2 verbatim: stores and admitted set must not change
    val before = spark.read.parquet(s"$base/docs").count()
    StreamNearDup.applyBatch(spark,
      Seq(doc(3, a), doc(4, c), doc(5, a)).toDF("doc_id", "text"), base)
    assert(admitted == Seq(1L, 2L, 4L), "replay changed the admitted set")
    assert(spark.read.parquet(s"$base/docs").count() == before,
      "replay grew the doc store")
    // band store still owned by the FIRST claimant (min doc_id via -pos LWW)
    val owners = CdcApplier.snapshot(spark, s"$base/bands")
      .select("doc_id").as[Long].collect().toSet
    assert(!owners.contains(3L) && !owners.contains(5L),
      s"later recrawls must not steal band ownership: $owners")
  }
}
