package graft.cdc

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier.TargetMeta

/** Round-15 surfaces: the CREATE INDEX lifecycle (q283 — resumable seed,
  * building-vs-live routing discipline, evolution guards), plus the
  * round-14 ADVICE fixes (range-route domain-edge overflow, the dv fold
  * crash window, all-digit branch names). The oracle gate covers the DDL
  * happy path; these pin the refusals, the crash windows, and the
  * maintenance interactions. */
class Round15Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)

  private def meta(t: String): TargetMeta =
    TargetMeta.read(spark.sparkContext.hadoopConfiguration, new Path(t)).get

  private def newStore(n: Int): String = {
    val store = Files.createTempDirectory("graft_r15").toString + "/store"
    val data = spark.range(1, n + 1)
      .select($"id".as("k"), ($"id" % 7).as("v"), ($"id" % 13).cast("int").as("w"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    store
  }

  // ---- q283: resumable seed + building/live discipline ----------------

  test("create_index: bounded slices resume to a complete, maintained index") {
    val store = newStore(40)
    import graft.plans.GraftIndexRoute
    try {
      val r1 = IndexLifecycle.createIndex(spark, store, "v",
        covering = Seq("w"), maxBuckets = 2)
      assert(r1.state == "building" && r1.seeded.size == 2)
      assert(meta(store).indexes.contains(Map("v" -> "building")))
      // building: registerLive must NOT register the route
      IndexLifecycle.registerLive(spark, store)
      GraftIndexRoute.install(spark)
      val f0 = GraftIndexRoute.fired
      CdcApplier.snapshot(spark, store).filter($"v" === 3L)
        .select($"k", $"v").collect()
      assert(GraftIndexRoute.fired == f0, "a building index must never route")
      // a MID-SEED batch maintains seeded and unseeded buckets alike:
      // move one key's indexed value, delete another
      val moved = spark.range(5, 6).select($"id".as("k"), lit(99L).as("v"),
        lit(1).cast("int").as("w"))
      val gone = spark.range(6, 7).select($"id".as("k"), ($"id" % 7).as("v"),
        ($"id" % 13).cast("int").as("w"))
      CdcApplier.applyBatch(spark,
        ChangeFeed.updates(
            spark.range(5, 6).select($"id".as("k"), ($"id" % 7).as("v"),
              ($"id" % 13).cast("int").as("w")),
            Map("v" -> lit(99L)), $"k" * 10 + 3)
          .union(ChangeFeed.deletes(gone, $"k" * 10 + 5)),
        store, opts)
      // resume (the crash-resume path: a fresh call picks up the marker)
      val r2 = IndexLifecycle.createIndex(spark, store, "v", covering = Seq("w"))
      assert(r2.state == "live")
      assert(meta(store).indexes.contains(Map("v" -> "live")))
      // the index equals the store's own (v, k, w) projection — stale
      // entries retired, the moved key under its NEW value only
      val expect = CdcApplier.snapshot(spark, store)
        .select($"v", $"k", $"w").collect().map(_.toString).sorted.toSeq
      val idx = IndexLifecycle.indexDir(store, "v")
      val got = CdcApplier.snapshot(spark, idx)
        .select($"v", $"k", $"w").collect().map(_.toString).sorted.toSeq
      assert(got == expect)
      assert(got.exists(_.contains("[99,5,")), "moved key indexed under new value")
      // live: the route serves the point query
      val f1 = GraftIndexRoute.fired
      val routed = CdcApplier.snapshot(spark, store).filter($"v" === 99L)
        .select($"k", $"v").collect()
      assert(GraftIndexRoute.fired > f1 && routed.map(_.getLong(0)).toSeq == Seq(5L))
      // POST-live maintenance keeps flowing with no hand-wired feed
      CdcApplier.applyBatch(spark,
        ChangeFeed.deletes(moved, $"k" * 10 + 7), store, opts)
      val after = CdcApplier.snapshot(spark, idx).filter($"v" === 99L).count()
      assert(after == 0L, "post-live deletes retire index entries automatically")
      // double-create refuses; drop releases and deletes the table
      intercept[IllegalArgumentException] {
        IndexLifecycle.createIndex(spark, store, "v")
      }
      IndexLifecycle.dropIndex(spark, store, "v")
      assert(meta(store).indexes.isEmpty)
      val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new Path(idx)))
    } finally GraftIndexRoute.unregister(store, "v")
  }

  test("create_index guards: PK / missing / delimiter columns refuse") {
    val store = newStore(10)
    intercept[IllegalArgumentException] {
      IndexLifecycle.createIndex(spark, store, "k") // PK column
    }
    intercept[IllegalArgumentException] {
      IndexLifecycle.createIndex(spark, store, "nope")
    }
    intercept[IllegalArgumentException] {
      IndexLifecycle.createIndex(spark, store, "v", covering = Seq("nope"))
    }
  }

  test("evolution guards: rename/drop/widen refuse on index-served columns") {
    val store = newStore(10)
    val r = IndexLifecycle.createIndex(spark, store, "v", covering = Seq("w"))
    assert(r.state == "live")
    try {
      intercept[IllegalStateException] {
        CdcApplier.renameColumn(spark, store, "v", "v2")
      }
      intercept[IllegalStateException] {
        CdcApplier.dropColumn(spark, store, "w")
      }
      intercept[IllegalStateException] {
        CdcApplier.widenColumn(spark, store, "w",
          org.apache.spark.sql.types.LongType)
      }
      // after drop_index the same evolutions proceed
      IndexLifecycle.dropIndex(spark, store, "v")
      CdcApplier.widenColumn(spark, store, "w",
        org.apache.spark.sql.types.LongType)
      CdcApplier.renameColumn(spark, store, "v", "v2")
    } finally graft.plans.GraftIndexRoute.unregister(store, "v")
  }

  // ---- ADVICE r14: range-route domain-edge strict bounds --------------

  test("indexroute: strict bounds at the Long domain edge decline, not wrap") {
    val base = Files.createTempDirectory("graft_r15").toString
    val store = base + "/store"
    val index = base + "/index"
    val data = spark.range(1, 41).select($"id".as("k"), ($"id" % 7).as("v"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(data.select($"v", $"k"), $"k" * 10), index,
      CdcApplier.Options(Seq("v", "k"), bucketCols = Some(Seq("v")),
        rangeBounds = Some(Seq(2L, 4L))))
    import graft.plans.GraftIndexRoute
    GraftIndexRoute.install(spark)
    GraftIndexRoute.register(store, "v", index)
    try {
      def q(cond: org.apache.spark.sql.Column) =
        CdcApplier.snapshot(spark, store).filter(cond).select($"k", $"v")
      val f0 = GraftIndexRoute.fired
      // always-false strict bounds: naive +1/-1 wraps to the WHOLE domain
      // and (covered) would serve every row; the rule must decline and the
      // scan answers zero
      assert(q($"v" > Long.MaxValue).count() == 0L)
      assert(q($"v" < Long.MinValue).count() == 0L)
      assert(GraftIndexRoute.fired == f0,
        "domain-edge strict bounds must not route")
      // the non-degenerate neighbours still route
      val f1 = GraftIndexRoute.fired
      assert(q($"v" >= 5L && $"v" <= 6L).count() ==
        data.filter($"v" >= 5L && $"v" <= 6L).count())
      assert(GraftIndexRoute.fired > f1)
    } finally GraftIndexRoute.unregister(store, "v")
  }

  // ---- ADVICE r14: dv fold gated on on-disk evidence -------------------

  test("dv crash window: a merge after flag-less tombstones still folds") {
    val store = Files.createTempDirectory("graft_r15").toString + "/t"
    val data = spark.range(1, 21).select($"id".as("k"), ($"id" * 2.0).as("v"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    CdcApplier.applyBatchDv(spark,
      ChangeFeed.deletes(data.filter($"k" === 5L), lit(1000L)), store, opts)
    // simulate the documented crash window: tombstone files visible, the
    // meta `dv` flag never landed
    val hconf = spark.sparkContext.hadoopConfiguration
    TargetMeta.write(hconf, new Path(store), meta(store).copy(dv = None))
    // an ordinary merge touching every bucket must resolve `current` from
    // the on-disk dv evidence — trusting the absent flag would duplicate
    // key 5's (live row + tombstone) through the full-outer join
    CdcApplier.applyBatch(spark,
      ChangeFeed.updates(data.filter($"k" =!= 5L),
        Map("v" -> ($"v" + 0.5)), $"k" * 10 + 5), store, opts)
    val out = CdcApplier.snapshot(spark, store).select($"k").as[Long].collect().sorted
    assert(out.toSeq == (1L to 20L).filterNot(_ == 5L),
      s"key 5 stays deleted and nothing duplicates, got ${out.mkString(",")}")
  }

  // ---- ADVICE r14: all-digit branch names refuse ------------------------

  test("branch: purely numeric names refuse (VERSION AS OF ambiguity)") {
    val store = Files.createTempDirectory("graft_r15").toString + "/t"
    val data = spark.range(1, 6).select($"id".as("k"), ($"id" * 2.0).as("v"))
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    intercept[IllegalArgumentException] {
      Branch.create(spark, store, "2024")
    }
    // mixed names keep working
    Branch.create(spark, store, "rel2024")
    Branch.drop(spark, store, "rel2024")
  }

  // ---- q291: audit edge semantics ----------------------------------------

  test("q291 audit: dv crash-window direction and version-bearing skips") {
    val store = Files.createTempDirectory("graft_r15").toString + "/dvstore"
    val data = spark.range(1, 21)
      .select($"id".as("k"), ($"id" * 2.0).as("v"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    CdcApplier.applyBatchDv(spark,
      ChangeFeed.deletes(data.filter($"k" % 5 === 0), $"k" * 10 + 5),
      store, opts)
    def row(c: String) = TableAudit.audit(spark, store).find(_.check == c).get
    // outstanding vectors: flag == disk → clean; pk_uniqueness skips
    // (dv makes the layout version-bearing)
    assert(row("dv_flag").ok.contains(true))
    assert(row("pk_uniqueness").ok.isEmpty)
    val hconf = spark.sparkContext.hadoopConfiguration
    val meta = TargetMeta.read(hconf, new Path(store)).get
    // disk > flag is the DOCUMENTED crash window (files publish first) —
    // legal, never flagged
    TargetMeta.write(hconf, new Path(store),
      meta.copy(dv = meta.dv.map(_ - 1)))
    assert(row("dv_flag").ok.contains(true))
    // flag > disk is impossible under the publish order — flagged
    TargetMeta.write(hconf, new Path(store),
      meta.copy(dv = meta.dv.map(_ + 5)))
    val bad = row("dv_flag")
    assert(bad.ok.contains(false) && bad.violations == 5L)
    TargetMeta.write(hconf, new Path(store), meta)
    // a mor store skips pk_uniqueness too (delta chains are multi-version)
    val mor = Files.createTempDirectory("graft_r15").toString + "/morstore"
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(data, $"k" * 10), mor, opts)
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(data.filter($"k" % 3 === 0),
        Map("v" -> ($"v" * 2.0)), $"k" * 10 + 3), mor, opts)
    val morAudit = TableAudit.audit(spark, mor).map(r => r.check -> r).toMap
    assert(morAudit("pk_uniqueness").ok.isEmpty)
    assert(morAudit("bucket_assignment").ok.contains(true))
  }

  // ---- q288: autoMerge surfaces ------------------------------------------

  test("q288: autoMerge conf gates capabilities and by-name INSERT reconcile") {
    import org.apache.spark.sql.connector.catalog.TableCapability
    val store = newStore(20)
    val t = new graft.sources.GraftTable(store,
      graft.sources.GraftTable.tableSchema(spark, store))
    // AUTOMATIC_SCHEMA_EVOLUTION is a prerequisite Spark checks, not a
    // trigger — always advertised (evolution still needs the statement's
    // WITH SCHEMA EVOLUTION); ACCEPT_ANY_SCHEMA (the INSERT leg) is
    // conf-gated, default OFF
    assert(t.capabilities().contains(TableCapability.AUTOMATIC_SCHEMA_EVOLUTION))
    assert(!t.capabilities().contains(TableCapability.ACCEPT_ANY_SCHEMA))
    try {
      spark.conf.set("spark.graft.schema.autoMerge", "true")
      assert(t.capabilities().contains(TableCapability.ACCEPT_ANY_SCHEMA))
      // by-name reconcile: PK must be present
      val noPk = spark.range(1, 3).select(($"id" * 5).as("v"))
      val e = intercept[IllegalArgumentException] {
        graft.sources.GraftWrites.insertInto(store, noPk, overwrite = false,
          Map.empty)
      }
      assert(e.getMessage.contains("must carry the PK"))
      // extra column evolves, absent stored column NULL-pads
      val byName = spark.range(100, 103)
        .select($"id".as("k"), lit("new").as("tag"))
      graft.sources.GraftWrites.insertInto(store, byName, overwrite = false,
        Map.empty)
      val snap = CdcApplier.snapshot(spark, store)
      assert(snap.columns.contains("tag"), "the new column must evolve the store")
      val fresh = snap.filter($"k" >= 100).select($"v", $"w", $"tag")
        .collect()
      assert(fresh.length == 3 && fresh.forall(r =>
        r.isNullAt(0) && r.isNullAt(1) && r.getString(2) == "new"),
        "absent stored columns NULL-pad; the carried column lands")
      val old = snap.filter($"k" < 100)
      assert(old.filter($"tag".isNotNull).count() == 0,
        "pre-evolution rows surface NULL in the evolved column")
    } finally spark.conf.unset("spark.graft.schema.autoMerge")
  }
}
