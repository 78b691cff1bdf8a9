package graft.cdc

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier.TargetMeta

/** Round-13 surfaces: the sorted-bucket layout's order maintenance (q262),
  * commit stamps + theft detection (q265/the ADVICE fence hole), rollback
  * floor edges (q263), branch pinning (q264), timestamp resolution edges
  * (q265), index-route refusals (q266), and the optimize rebase fence
  * arithmetic (q267). The oracle gates cover the happy paths; these pin
  * the guard rails and maintenance interactions. */
class Round13Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def newTarget(): String =
    Files.createTempDirectory("graft_r13").toString + "/t"
  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)

  private def rows(n: Int): DataFrame =
    spark.range(1, n + 1).select($"id".as("k"), ($"id" * 2.0).as("v"))

  private def fsOf(target: String) =
    new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def meta(t: String): TargetMeta =
    TargetMeta.read(spark.sparkContext.hadoopConfiguration, new Path(t)).get

  /** Every data file of every bucket, read alone, must be internally
    * ascending on `k` — the q262 write invariant. */
  private def assertBucketFilesSorted(t: String): Unit = {
    val fs = fsOf(t)
    CdcApplier.bucketIds(fs, new Path(t)).foreach { b =>
      val dir = new Path(t, s"graft_bucket=$b")
      fs.listStatus(dir).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        .foreach { f =>
          val ks = spark.read.parquet(f.getPath.toString)
            .select($"k").as[Long].collect().toSeq
          assert(ks == ks.sorted, s"file ${f.getPath} not sorted: $ks")
        }
    }
  }

  test("q262: apply/compact/rebucket keep every bucket file PK-sorted and recorded") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(200), $"k" * 10), t, opts)
    assert(meta(t).sorted.contains(Seq("k")), "creation records the sort")
    assertBucketFilesSorted(t)
    CdcApplier.applyBatch(spark, ChangeFeed.deletes(rows(200).filter($"k" % 5 === 0),
      $"k" * 10 + 5), t, opts)
    CdcApplier.compact(spark, t, 3000L) // drops tombstones, rewrites buckets
    assert(meta(t).sorted.contains(Seq("k")))
    assertBucketFilesSorted(t)
    CdcApplier.rebucket(spark, t, 8)
    assert(meta(t).sorted.contains(Seq("k")), "rebucket re-records the sort")
    assertBucketFilesSorted(t)
    // file-order verdict: single sorted file per bucket = full depth
    val fs = fsOf(t)
    CdcApplier.bucketIds(fs, new Path(t)).foreach { b =>
      val (_, depth) = FileStats.bucketFileOrder(fs, new Path(t, s"graft_bucket=$b"), "k")
      assert(depth == 2, s"bucket $b must serve full-depth order, got $depth")
    }
  }

  test("q262: clusterBy optimize re-records the order; a PK apply degrades it") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(100), $"k" * 10), t, opts)
    CdcApplier.optimize(spark, t, 1L << 20, clusterBy = Seq("v"))
    assert(meta(t).sorted.contains(Seq("v")), "clustering records the new order")
    // the next PK-sorted bucket rewrite leaves MIXED per-bucket orders — no
    // single truth, so the flag must degrade rather than lie
    CdcApplier.applyBatch(spark, ChangeFeed.updates(rows(100).filter($"k" === 1),
      Map("v" -> lit(0.5)), lit(5000L)), t, opts)
    assert(meta(t).sorted.isEmpty, "mixed orders must clear the recorded sort")
  }

  test("fence: a stolen claim is a typed conflict, not a silent double-publish") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(10), $"k" * 10), t, opts)
    val fs = fsOf(t)
    intercept[CdcApplier.GraftConcurrentWriteException] {
      CdcApplier.withCommitTicket(spark, t) {
        // the adversary: a second writer "reclaims" the LIVE holder's ticket
        val seq = CdcApplier.commitSeq(fs, new Path(t)) + 1
        fs.delete(new Path(t, s".graft_commits/c$seq"), false)
        ()
      }
    }
    // the sequence did not advance; the target is not left fenced
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 1L)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(2), lit(900L)), t, opts)
    assert(CdcApplier.commitSeq(fs, new Path(t)) == 2L)
  }

  test("q265: stamps carry a monotone clock, the position, and the bucket set") {
    val t = newTarget()
    val morOpts = CdcApplier.Options(Seq("k"), numBuckets = 4)
    spark.conf.set("spark.graft.commit.clock.ms", "5000")
    try {
      CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(20), lit(100L)), t, morOpts)
      // same injected instant: the second stamp must bump by 1 (ties
      // resolve upward, the Delta adjustment)
      CdcApplier.applyBatchMor(spark, ChangeFeed.updates(rows(20).filter($"k" === 1),
        Map("v" -> lit(9.0)), lit(200L)), t, morOpts)
      CdcApplier.createTag(spark, t, "rel", 200L)
    } finally spark.conf.unset("spark.graft.commit.clock.ms")
    val stamps = CdcApplier.commitStamps(spark, t)
    assert(stamps.map(_.seq) == Seq(1L, 2L, 3L))
    assert(stamps.map(_.ts.get) == Seq(5000L, 5001L, 5002L), s"monotone: $stamps")
    assert(stamps(0).pos.contains(100L) && stamps(1).pos.contains(200L))
    assert(stamps(1).buckets.exists(_.nonEmpty), "data publishes record buckets")
    assert(stamps(2).buckets.contains(Seq.empty), "meta-only mutations record none")
  }

  test("q265: timestamp resolution edges — below, at, between, beyond") {
    val t = newTarget()
    def at[T](ts: Long)(f: => T): T = {
      spark.conf.set("spark.graft.commit.clock.ms", ts.toString)
      try f finally spark.conf.unset("spark.graft.commit.clock.ms")
    }
    at(1000L)(CdcApplier.applyBatchMor(spark,
      ChangeFeed.inserts(rows(10), lit(100L)), t, opts))
    at(2000L)(CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(rows(10).filter($"k" === 2), Map("v" -> lit(7.0)),
        lit(200L)), t, opts))
    intercept[IllegalArgumentException] {
      CdcApplier.positionAsOfTimestamp(spark, t, 999L)
    }
    assert(CdcApplier.positionAsOfTimestamp(spark, t, 1000L) == 100L)
    assert(CdcApplier.positionAsOfTimestamp(spark, t, 1999L) == 100L)
    assert(CdcApplier.positionAsOfTimestamp(spark, t, 2000L) == 200L)
    assert(CdcApplier.positionAsOfTimestamp(spark, t, 99999L) == 200L)
  }

  test("q263: rollback floor guard and no-op form") {
    val t = newTarget()
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(10), lit(100L)), t, opts)
    CdcApplier.applyBatchMor(spark, ChangeFeed.updates(rows(10).filter($"k" % 2 === 0),
      Map("v" -> lit(1.5)), lit(200L)), t, opts)
    // rollback to (or past) the head is an empty commit, not an error
    assert(CdcApplier.rollback(spark, t, 200L) == 200L)
    CdcApplier.vacuumMor(spark, t, 200L) // floor -> 100
    intercept[IllegalArgumentException] { CdcApplier.rollback(spark, t, 50L) }
    // cow targets refuse outright
    val cow = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(5), lit(10L)), cow, opts)
    intercept[IllegalStateException] { CdcApplier.rollback(spark, cow, 10L) }
  }

  test("q264: a live branch pins main's history; drop releases it") {
    val t = newTarget()
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(20), lit(100L)), t, opts)
    Branch.create(spark, t, "wip")
    // main advances; the branch point (100) would be stranded by a collapse
    CdcApplier.applyBatchMor(spark, ChangeFeed.updates(rows(20).filter($"k" === 3),
      Map("v" -> lit(4.0)), lit(200L)), t, opts)
    intercept[IllegalStateException] { CdcApplier.compactMor(spark, t) }
    // and the outrun branch refuses to fast-forward, with staged work intact
    Branch.applyBatch(spark, t, "wip", ChangeFeed.updates(
      rows(20).filter($"k" === 5), Map("v" -> lit(5.5)), lit(150L)))
    intercept[CdcApplier.GraftConcurrentWriteException] {
      Branch.fastForward(spark, t, "wip")
    }
    Branch.drop(spark, t, "wip")
    assert(CdcApplier.compactMor(spark, t).nonEmpty, "drop releases the pin")
    intercept[IllegalArgumentException] { Branch.drop(spark, t, "wip") }
  }

  test("q264: the branch-pin tag namespace is fenced off from user tags") {
    val t = newTarget()
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(10), lit(100L)), t, opts)
    // a user tag cannot fabricate a phantom branch
    intercept[IllegalArgumentException] {
      CdcApplier.createTag(spark, t, "branch-ghost", 100L)
    }
    // a user drop cannot silently release a live branch's pin
    Branch.create(spark, t, "live")
    intercept[IllegalArgumentException] {
      CdcApplier.dropTag(spark, t, "branch-live")
    }
    Branch.drop(spark, t, "live") // the lifecycle's own release still works
  }

  test("q266: the route declines compound predicates and foreign stores") {
    import graft.plans.GraftIndexRoute
    val base = Files.createTempDirectory("graft_r13").toString
    val store = base + "/st"
    val index = base + "/ix"
    val data = rows(50).withColumn("c", $"k" % 7)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store,
      CdcApplier.Options(Seq("k")))
    CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(data.select($"c", $"k"), $"k" * 10), index,
      CdcApplier.Options(Seq("c", "k"), bucketCols = Some(Seq("c"))))
    GraftIndexRoute.install(spark)
    GraftIndexRoute.register(store, "c", index)
    try {
      def run(df: DataFrame): Unit = { df.queryExecution.optimizedPlan; () }
      val f0 = GraftIndexRoute.fired
      run(CdcApplier.snapshot(spark, store).filter($"c" === 3L).select($"k", $"c"))
      assert(GraftIndexRoute.fired > f0, "point predicate fires")
      // r15 contract change (q289): an extra conjunct on another column no
      // longer declines — the indexed half routes and the residual applies
      // above the fetched frame, answers identical to the scan
      val f0b = GraftIndexRoute.fired
      val mixed = CdcApplier.snapshot(spark, store)
        .filter($"c" === 3L && $"v" > 10.0).select($"k", $"c")
      val got = mixed.collect().map(_.toString).sorted.toSeq
      assert(GraftIndexRoute.fired > f0b,
        "routed-with-residual fires (q289)")
      val want = data.filter($"c" === 3L && $"v" > 10.0)
        .select($"k", $"c").collect().map(_.toString).sorted.toSeq
      assert(got == want, "the residual must filter above the routed frame")
      // a different (unregistered) store is never consulted
      val other = base + "/other"
      CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), other,
        CdcApplier.Options(Seq("k")))
      val f1 = GraftIndexRoute.fired; val d1 = GraftIndexRoute.declined
      run(CdcApplier.snapshot(spark, other).filter($"c" === 3L).select($"k", $"c"))
      assert(GraftIndexRoute.fired == f1 && GraftIndexRoute.declined == d1)
    } finally GraftIndexRoute.unregister(store, "c")
  }

  test("q266: a STRING-typed indexed column routes (internal literals convert)") {
    import graft.plans.GraftIndexRoute
    val base = Files.createTempDirectory("graft_r13").toString
    val store = base + "/sst"
    val index = base + "/six"
    val data = rows(30).withColumn("tag", concat(lit("t"), ($"k" % 5).cast("string")))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store,
      CdcApplier.Options(Seq("k")))
    CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(data.select($"tag", $"k"), $"k" * 10), index,
      CdcApplier.Options(Seq("tag", "k"), bucketCols = Some(Seq("tag"))))
    GraftIndexRoute.install(spark)
    GraftIndexRoute.register(store, "tag", index)
    try {
      val f0 = GraftIndexRoute.fired
      val got = CdcApplier.snapshot(spark, store).filter($"tag" === "t2")
        .select($"k").as[Long].collect().toSet
      assert(GraftIndexRoute.fired > f0, "string point predicate must route")
      assert(got == (1L to 30L).filter(_ % 5 == 2).toSet, s"wrong rows: $got")
    } finally GraftIndexRoute.unregister(store, "tag")
  }

  test("q272: zorder guards, state identity, and sorted-flag clearing") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(40), $"k" * 10), t, opts)
    val good = (1 to 15).map(_.toLong * 3)
    intercept[IllegalArgumentException] {
      CdcApplier.zorder(spark, t, Seq("k"), Seq(good)) // one column: not a curve
    }
    // q279 relaxed the arity to 1-15 bounds (low-NDV columns collapse
    // their quantiles); EMPTY and OVERSIZED bound lists still refuse
    intercept[IllegalArgumentException] {
      CdcApplier.zorder(spark, t, Seq("k", "v"), Seq(good, Seq.empty))
    }
    intercept[IllegalArgumentException] {
      CdcApplier.zorder(spark, t, Seq("k", "v"),
        Seq(good, (1 to 16).map(_.toLong)))
    }
    intercept[IllegalArgumentException] {
      CdcApplier.zorder(spark, t, Seq("k", "nope"), Seq(good, good))
    }
    assert(meta(t).sorted.nonEmpty)
    val before = CdcApplier.snapshot(spark, t).select($"k", $"v")
      .as[(Long, Double)].collect().toSet
    CdcApplier.zorder(spark, t, Seq("k", "v"), Seq(good, good))
    assert(meta(t).sorted.isEmpty, "a Morton layout must not claim a column order")
    val after = CdcApplier.snapshot(spark, t).select($"k", $"v")
      .as[(Long, Double)].collect().toSet
    assert(after == before, "zorder must carry state verbatim")
  }

  test("q271: rollbackToTag restores the named state; unknown tags refuse") {
    val t = newTarget()
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(15), lit(100L)), t, opts)
    CdcApplier.createTag(spark, t, "good", 100L)
    CdcApplier.applyBatchMor(spark, ChangeFeed.updates(rows(15).filter($"k" % 2 === 0),
      Map("v" -> lit(0.0)), lit(200L)), t, opts)
    assert(CdcApplier.rollbackToTag(spark, t, "good") == 201L)
    val head = CdcApplier.snapshot(spark, t).select($"k", $"v")
      .as[(Long, Double)].collect().toSet
    assert(head.forall { case (k, v) => v == k * 2.0 }, "the tagged state is back")
    intercept[IllegalArgumentException] { CdcApplier.rollbackToTag(spark, t, "nope") }
  }

  test("q267: the no-op optimize still commits; a held ticket still fences it") {
    val t = newTarget()
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(30), lit(100L)), t, opts)
    CdcApplier.optimize(spark, t) // bin-packs to one file per bucket
    val fs = fsOf(t)
    val s0 = CdcApplier.commitSeq(fs, new Path(t))
    CdcApplier.optimize(spark, t) // nothing oversized — still one commit
    assert(CdcApplier.commitSeq(fs, new Path(t)) == s0 + 1)
    CdcApplier.claimCommit(fs, new Path(t))
    intercept[CdcApplier.GraftConcurrentWriteException] {
      CdcApplier.optimize(spark, t)
    }
    assert(CdcApplier.reclaimCommit(spark, t))
  }
}
