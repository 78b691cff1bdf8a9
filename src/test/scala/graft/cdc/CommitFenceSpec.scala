package graft.cdc

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q257 commit fence: every bucket-swapping publisher claims the next
  * commit ticket before touching state; conflicts are typed and loud;
  * failed bodies release without advancing; whole-target swaps carry the
  * sequence; reclaim is the explicit restart-only path. Plus the q256
  * named-tag guards and their history pinning. */
class CommitFenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def newTarget(): String =
    Files.createTempDirectory("graft_fence").toString + "/t"
  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)

  private def rows(n: Int): DataFrame =
    spark.range(1, n + 1).select($"id".as("k"), ($"id" * 2.0).as("v"))

  private def fsOf(target: String) =
    new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("sequence advances once per publish, across publisher kinds") {
    val t = newTarget()
    val fs = fsOf(t)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(50), $"k" * 10), t, opts)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 1L)
    CdcApplier.applyBatch(spark, ChangeFeed.updates(rows(50).filter($"k" % 3 === 0),
      Map("v" -> ($"v" * 2)), $"k" * 10 + 5), t, opts)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 2L)
    CdcApplier.optimize(spark, t, 64L << 20)
    // optimize may be a no-op (nothing oversized) but still commits
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 3L)
    CdcApplier.compact(spark, t, 100L)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 4L)
  }

  test("a held ticket fences every publisher with the typed conflict") {
    val t = newTarget()
    val fs = fsOf(t)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(30), $"k" * 10), t, opts)
    CdcApplier.claimCommit(fs, new Path(t))
    def conflicts(f: => Any): Boolean =
      intercept[CdcApplier.GraftConcurrentWriteException] { f; () } != null
    assert(conflicts(CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(rows(5), lit(999L)), t, opts)))
    assert(conflicts(CdcApplier.optimize(spark, t, 1L << 20)))
    assert(conflicts(CdcApplier.rebucket(spark, t, 8)))
    assert(conflicts(CdcApplier.compact(spark, t, 50L)))
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 1L)
    assert(CdcApplier.reclaimCommit(spark, t))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(5), lit(999L)), t, opts)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 2L)
  }

  test("a failing body releases the ticket without advancing") {
    val t = newTarget()
    val fs = fsOf(t)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(20), $"k" * 10), t, opts)
    // schema drift refusal: a dropped column
    val bad = rows(20).select($"k")
    intercept[Exception] {
      CdcApplier.applyBatch(spark, ChangeFeed.inserts(bad, lit(500L)), t, opts)
    }
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 1L,
      "refusals must not burn sequence numbers")
    // and the target is NOT left fenced
    CdcApplier.applyBatch(spark, ChangeFeed.updates(rows(20).filter($"k" === 1),
      Map("v" -> lit(99.0)), lit(600L)), t, opts)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 2L)
  }

  test("whole-target swaps (rebucket) carry the sequence across the new dir") {
    val t = newTarget()
    val fs = fsOf(t)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(40), $"k" * 10), t, opts)
    CdcApplier.applyBatch(spark, ChangeFeed.updates(rows(40).filter($"k" % 2 === 0),
      Map("v" -> ($"v" + 1)), $"k" * 10 + 5), t, opts)
    CdcApplier.rebucket(spark, t, 8)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 3L,
      "the swap must re-seed the done marker in the fresh dir")
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(2), lit(900L)), t,
      CdcApplier.Options(Seq("k"), numBuckets = 8))
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 4L)
  }

  test("orphan claim markers at or below the sequence are garbage-collected") {
    val t = newTarget()
    val fs = fsOf(t)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(10), $"k" * 10), t, opts)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(12), $"k" * 10 + 5), t, opts)
    // a crash between finalize-rename and cleanup leaves an orphan BELOW
    // the current sequence — it must never wedge later claims
    fs.create(new Path(t, ".graft_commits/c1"), true).close()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(13), $"k" * 10 + 7), t, opts)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 3L)
    assert(!fs.exists(new Path(t, ".graft_commits/c1")), "orphan GC'd at claim")
  }

  test("reclaim returns false when no stale ticket exists") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(8), $"k" * 10), t, opts)
    assert(!CdcApplier.reclaimCommit(spark, t))
  }

  // ---- q256 tags ----------------------------------------------------------

  private def morLifecycle(): String = {
    val t = newTarget()
    val o = CdcApplier.Options(Seq("k"))
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(30), lit(100L)), t, o)
    // the middle stamp makes a vacuum retaining from 200 land its floor at
    // 150 — strictly ABOVE a genesis@100 tag, the stranding shape
    CdcApplier.applyBatchMor(spark, ChangeFeed.updates(rows(30).filter($"k" % 3 === 0),
      Map("v" -> ($"v" + 0.5)), lit(150L)), t, o)
    CdcApplier.applyBatchMor(spark, ChangeFeed.updates(rows(30).filter($"k" % 2 === 0),
      Map("v" -> ($"v" * 10)), lit(200L)), t, o)
    t
  }

  test("tag guards: layout, name shape, bounds, duplicates, unknown drops") {
    val t = morLifecycle()
    CdcApplier.createTag(spark, t, "rel-1", 100L)
    intercept[IllegalStateException] { CdcApplier.createTag(spark, t, "rel-1", 200L) }
    intercept[IllegalArgumentException] { CdcApplier.createTag(spark, t, "42", 100L) }
    intercept[IllegalArgumentException] { CdcApplier.createTag(spark, t, "a b", 100L) }
    intercept[IllegalArgumentException] { CdcApplier.createTag(spark, t, "future", 999L) }
    intercept[IllegalArgumentException] { CdcApplier.dropTag(spark, t, "nope") }
    // cow targets refuse tags outright
    val cow = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(5), lit(10L)), cow, opts)
    intercept[IllegalStateException] { CdcApplier.createTag(spark, cow, "x", 10L) }
  }

  test("tags pin history against compactMor and vacuumMor; drop releases") {
    val t = morLifecycle()
    CdcApplier.createTag(spark, t, "genesis", 100L)
    val before = CdcApplier.snapshotAsOfTag(spark, t, "genesis")
      .select($"k", $"v").as[(Long, Double)].collect().toSet
    assert(before.forall { case (k, v) => v == k * 2.0 })
    intercept[IllegalStateException] { CdcApplier.compactMor(spark, t) }
    intercept[IllegalStateException] { CdcApplier.vacuumMor(spark, t, 200L) }
    // still answerable after the refused collapses
    assert(CdcApplier.snapshotAsOfTag(spark, t, "genesis")
      .select($"k", $"v").as[(Long, Double)].collect().toSet == before)
    CdcApplier.dropTag(spark, t, "genesis")
    assert(CdcApplier.compactMor(spark, t).nonEmpty)
  }

  test("every meta mutation ticks the commit sequence exactly once") {
    // q261's commit_seq oracle counts on this arithmetic: applies, tags,
    // renames, drops, and maintenance each claim one ticket per publish
    val t = morLifecycle() // 3 applies
    val fs = fsOf(t)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 3L)
    CdcApplier.createTag(spark, t, "a", 150L)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 4L)
    CdcApplier.renameColumn(spark, t, "v", "value")
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 5L)
    CdcApplier.dropColumn(spark, t, "value")
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 6L)
    CdcApplier.dropTag(spark, t, "a")
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 7L)
    // a REFUSED mutation burns nothing
    intercept[IllegalArgumentException] { CdcApplier.dropTag(spark, t, "ghost") }
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 7L)
  }

  test("a tag AT the new floor survives the collapse and answers identically") {
    val t = morLifecycle()
    CdcApplier.createTag(spark, t, "head", 200L)
    val before = CdcApplier.snapshotAsOfTag(spark, t, "head")
      .select($"k", $"v").as[(Long, Double)].collect().toSet
    CdcApplier.compactMor(spark, t) // floor lands ON 200 — head stays legal
    assert(CdcApplier.snapshotAsOfTag(spark, t, "head")
      .select($"k", $"v").as[(Long, Double)].collect().toSet == before)
  }
}
