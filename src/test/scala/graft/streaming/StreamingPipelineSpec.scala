package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier
import graft.streaming.StreamingPipeline.{Metrics, PipelineOptions}

case class SRow(sn: Int, id: Int, score: Int, name: String, rem: String)
case class SEvent(op: String, table: String, next_position: Long,
    before: Option[SRow], after: Option[SRow])
case class TsEvent(ts: Timestamp, event_type: String, value: Double)
case class JsonEvent(op: String, table: String, next_position: Long,
    before_json: String, after_json: String)

/** Structured Streaming coverage promised by SURVEY §2.2 (streaming row) and
  * VERDICT round-1 item 3: MemoryStream -> foreachBatch(CdcApplier) with a
  * real checkpoint dir, restart-from-checkpoint, the S5 filtered-offset
  * invariant, the S13 retry policy, S17 metrics, and a watermarked window
  * that drops late data. */
class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val pk = Seq("sn", "id")
  private def opts(mapped: Set[String] = Set("student")) =
    PipelineOptions(CdcApplier.Options(pk), mappedTables = mapped)

  private def tmpdir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def state(target: String): Set[SRow] =
    CdcApplier.snapshot(spark, target).drop("_graft_pos").as[SRow].collect().toSet

  private def ins(pos: Long, r: SRow, table: String = "student") =
    SEvent("insert", table, pos, None, Some(r))
  private def upd(pos: Long, b: SRow, a: SRow) = SEvent("update", "student", pos, Some(b), Some(a))
  private def del(pos: Long, r: SRow) = SEvent("delete", "student", pos, Some(r), None)

  val r1 = SRow(1, 1, 90, "ann", "a")
  val r1v2 = SRow(1, 1, 95, "ann", "b")
  val r2 = SRow(2, 7, 80, "bob", "x")

  test("CDC stream end-to-end, then restart from checkpoint continues cleanly") {
    val target = tmpdir("sp_t") + "/student"
    val ckpt = tmpdir("sp_c")
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    src.addData(ins(10, r1), ins(11, r2))

    val q1 = StreamingPipeline.start(src.toDF(), target, ckpt, opts())
    q1.processAllAvailable()
    q1.stop()
    assert(state(target) == Set(r1, r2))
    val batchesAfterFirst = Metrics.batchCount(target)

    // restart against the same checkpoint: only NEW data is processed
    src.addData(upd(20, r1, r1v2), del(21, r2))
    val q2 = StreamingPipeline.start(src.toDF(), target, ckpt, opts())
    q2.processAllAvailable()
    q2.stop()
    assert(state(target) == Set(r1v2))
    assert(Metrics.batchCount(target) == batchesAfterFirst + 1,
      "restart must process exactly the one new batch, not replay old ones")
    assert(Metrics.opCount(target, "student", "insert") == 2)
    assert(Metrics.opCount(target, "student", "update") == 1)
    assert(Metrics.opCount(target, "student", "delete") == 1)
    assert(Metrics.recentLatenciesMs(target).nonEmpty)
  }

  test("S5: unmapped-table burst advances the high-watermark without touching state") {
    val target = tmpdir("sp_t") + "/student"
    val ckpt = tmpdir("sp_c")
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    val q = StreamingPipeline.start(src.toDF(), target, ckpt, opts(mapped = Set("student")))

    src.addData(ins(10, r1))
    q.processAllAvailable()
    assert(state(target) == Set(r1))
    assert(StreamingPipeline.readHighWater(spark, target).contains(10L))

    // burst of events for a table we do not replicate
    src.addData((100 to 120).map(p => ins(p, SRow(p, p, 0, "z", "z"), table = "other")): _*)
    q.processAllAvailable()
    q.stop()
    assert(state(target) == Set(r1), "unmapped rows must not be applied")
    assert(StreamingPipeline.readHighWater(spark, target).contains(120L),
      "filtered traffic must still advance the position high-watermark (invariant 5)")
  }

  test("S13: failing batch is retried, then fails the query after maxRetries") {
    val target = tmpdir("sp_t") + "/student"
    Metrics.reset(target)
    // fails twice, succeeds on the 3rd attempt (maxRetries = 2)
    var calls = 0
    val flaky = opts().copy(preApplyHook = () => {
      calls += 1
      if (calls <= 2) throw new RuntimeException("transient sink failure")
    })
    val src1 = MemoryStream[SEvent]
    src1.addData(ins(10, r1))
    val q1 = StreamingPipeline.start(src1.toDF(), target, tmpdir("sp_c"), flaky)
    q1.processAllAvailable()
    q1.stop()
    assert(calls == 3)
    assert(state(target) == Set(r1))

    // always fails: the query must surface the failure (dead-letter = stop)
    val target2 = tmpdir("sp_t") + "/student"
    val broken = opts().copy(preApplyHook = () => throw new RuntimeException("permanent"))
    val src2 = MemoryStream[SEvent]
    src2.addData(ins(10, r1))
    val q2 = StreamingPipeline.start(src2.toDF(), target2, tmpdir("sp_c"), broken)
    val e = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    assert(e.getMessage.contains("attempts") || e.getCause != null)
  }

  test("per-table topology: one generic JSON feed fans out to typed per-table merges") {
    import org.apache.spark.sql.types._
    val root = tmpdir("sp_multi")
    val studentSchema = StructType(Seq(
      StructField("sn", IntegerType), StructField("score", IntegerType)))
    val courseSchema = StructType(Seq(
      StructField("cid", LongType), StructField("title", StringType)))
    val src = MemoryStream[JsonEvent]
    src.addData(
      JsonEvent("insert", "student", 10, null, """{"sn":1,"score":90}"""),
      JsonEvent("insert", "course", 11, null, """{"cid":7,"title":"spark"}"""),
      JsonEvent("update", "student", 12, """{"sn":1,"score":90}""", """{"sn":1,"score":95}"""),
      JsonEvent("insert", "other", 13, null, """{"x":1}""")) // no mapping -> ignored
    val queries = StreamingPipeline.startPerTable(
      src.toDF(),
      Map(
        "student" -> (studentSchema, s"$root/student"),
        "course" -> (courseSchema, s"$root/course")),
      s"$root/ckpt",
      table => PipelineOptions(CdcApplier.Options(
        if (table == "student") Seq("sn") else Seq("cid"))))
    queries.values.foreach(_.processAllAvailable())
    queries.values.foreach(_.stop())

    val students = CdcApplier.snapshot(spark, s"$root/student")
      .select("sn", "score").as[(Int, Int)].collect().toSet
    val courses = CdcApplier.snapshot(spark, s"$root/course")
      .select("cid", "title").as[(Long, String)].collect().toSet
    assert(students == Set((1, 95)))
    assert(courses == Set((7L, "spark")))
  }

  test("GraftConf builds PipelineOptions from spark.graft.* conf keys") {
    spark.conf.set("spark.graft.pk", "sn, id")
    spark.conf.set("spark.graft.maxRetries", "5")
    spark.conf.set("spark.graft.numBuckets", "8")
    spark.conf.set("spark.graft.mappedTables", "student,course")
    spark.conf.set("spark.graft.secondaryDir", "/tmp/replica")
    spark.conf.set("spark.graft.earliestPos", "42")
    spark.conf.set("spark.graft.compactEvery", "16")
    try {
      val o = GraftConf.pipelineOptions(spark)
      assert(o.applier.pkCols == Seq("sn", "id"))
      assert(o.maxRetries == 5)
      assert(o.applier.numBuckets == 8)
      assert(o.applier.strictPk)
      assert(o.mappedTables == Set("student", "course"))
      assert(o.secondaryDir.contains("/tmp/replica"))
      assert(o.earliestPos.contains(42L))
      assert(o.compactEvery == 16)
    } finally Seq("pk", "maxRetries", "numBuckets", "mappedTables", "secondaryDir",
      "earliestPos", "compactEvery")
      .foreach(k => spark.conf.unset(s"spark.graft.$k"))
  }

  test("auto-compaction: tombstones drop in steady state, replays still converge") {
    val target = tmpdir("sp_t") + "/student"
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    val o = opts().copy(compactEvery = 1)
    src.addData(ins(10, r1), ins(11, r2))
    val q1 = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c"), o)
    q1.processAllAvailable()
    src.addData(del(20, r2))
    q1.processAllAvailable()
    q1.stop()
    assert(state(target) == Set(r1))
    assert(spark.read.parquet(target).count() == 1,
      "steady-state compaction must physically drop the delete tombstone")

    // a full below-horizon replay (fresh checkpoint, the whole feed again)
    // must not resurrect the compacted delete's victim
    val src2 = MemoryStream[SEvent]
    src2.addData(ins(10, r1), ins(11, r2), del(20, r2))
    val q2 = StreamingPipeline.start(src2.toDF(), target, tmpdir("sp_c2"), o)
    q2.processAllAvailable()
    q2.stop()
    assert(state(target) == Set(r1),
      "below-horizon replay after compaction must converge to the same state")
  }

  test("consolidated topology: 3 tables through ONE streaming query converge identically") {
    import org.apache.spark.sql.types._
    val root = tmpdir("sp_consol")
    val studentSchema = StructType(Seq(
      StructField("sn", IntegerType), StructField("score", IntegerType)))
    val courseSchema = StructType(Seq(
      StructField("cid", LongType), StructField("title", StringType)))
    val roomSchema = StructType(Seq(
      StructField("rid", IntegerType), StructField("cap", IntegerType)))
    Seq("student", "course", "room").foreach(t => Metrics.reset(s"$root/$t"))
    val src = MemoryStream[JsonEvent]
    src.addData(
      JsonEvent("insert", "student", 10, null, """{"sn":1,"score":90}"""),
      JsonEvent("insert", "course", 11, null, """{"cid":7,"title":"spark"}"""),
      JsonEvent("insert", "room", 12, null, """{"rid":3,"cap":40}"""),
      JsonEvent("insert", "other", 13, null, """{"x":1}""")) // no mapping -> ignored
    val q = StreamingPipeline.startConsolidated(
      src.toDF(),
      Map(
        "student" -> (studentSchema, s"$root/student"),
        "course" -> (courseSchema, s"$root/course"),
        "room" -> (roomSchema, s"$root/room")),
      s"$root/ckpt",
      table => PipelineOptions(CdcApplier.Options(table match {
        case "student" => Seq("sn")
        case "course" => Seq("cid")
        case _ => Seq("rid")
      })))
    q.processAllAvailable()
    // second micro-batch touches only two of the three tables
    src.addData(
      JsonEvent("update", "student", 20, """{"sn":1,"score":90}""", """{"sn":1,"score":95}"""),
      JsonEvent("delete", "course", 21, """{"cid":7,"title":"spark"}""", null))
    q.processAllAvailable()
    q.stop()

    assert(CdcApplier.snapshot(spark, s"$root/student")
      .select("sn", "score").as[(Int, Int)].collect().toSet == Set((1, 95)))
    assert(CdcApplier.snapshot(spark, s"$root/course")
      .select("cid", "title").as[(Long, String)].collect().isEmpty)
    assert(CdcApplier.snapshot(spark, s"$root/room")
      .select("rid", "cap").as[(Int, Int)].collect().toSet == Set((3, 40)))
    // per-target metrics flow through the shared query, counting only the
    // micro-batches in which each table actually appeared
    assert(Metrics.batchCount(s"$root/student") == 2)
    assert(Metrics.batchCount(s"$root/room") == 1)
  }

  test("streaming exact dedup emits only first-seen content across batches") {
    val sink = s"dedup_${System.nanoTime()}"
    val src = MemoryStream[(Long, String)]
    val q = StreamingPipeline.streamingDedup(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    src.addData((3L, "alpha"), (1L, "alpha"), (2L, "beta"))
    q.processAllAvailable()
    val b1 = spark.table(sink).as[(String, Long)].collect().map(_._2).toSet
    assert(b1 == Set(1L, 2L), "within a batch the lowest doc_id wins per content hash")

    // replays and new dups of already-seen content are suppressed; new wins
    src.addData((9L, "alpha"), (10L, "gamma"))
    q.processAllAvailable()
    val b2 = spark.table(sink).as[(String, Long)].collect().map(_._2).toSet
    q.stop()
    assert(b2 == Set(1L, 2L, 10L), "cross-batch duplicate must not re-emit")
  }

  test("streaming budget admission meters per-source token budgets across batches") {
    val sink = s"budget_${System.nanoTime()}"
    val src = MemoryStream[(Long, String, Long)]
    val q = StreamingPipeline.streamingBudgetAdmit(
        src.toDF().toDF("doc_id", "source", "n_tokens"),
        s => if (s == "a") 100L else 50L)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // batch 1: a consumes 40+50=90 (both admitted, still < 100); the 30 in b
    // lands, then b is at 30 < 50 so the 40 crosses the boundary and is KEPT
    src.addData((2L, "a", 40L), (1L, "a", 50L), (3L, "b", 30L), (4L, "b", 40L))
    q.processAllAvailable()
    val b1 = spark.table(sink).as[(Long, String, Long, Long)].collect().toSet
    assert(b1 == Set((1L, "a", 50L, 0L), (2L, "a", 40L, 50L),
      (3L, "b", 30L, 0L), (4L, "b", 40L, 30L)),
      s"doc_id order within batch + crossing doc kept: $b1")

    // batch 2: a is at 90 < 100 so doc 5 crosses and is kept, then a is
    // full (doc 6 dropped); b is at 70 >= 50, everything dropped
    src.addData((5L, "a", 25L), (6L, "a", 1L), (7L, "b", 1L))
    q.processAllAvailable()
    val b2 = spark.table(sink).as[(Long, String, Long, Long)].collect().toSet
    q.stop()
    assert(b2 == b1 + ((5L, "a", 25L, 90L)),
      s"state must carry the running count across batches: $b2")
  }

  test("streaming near-dup admission rejects Hamming<=3 simhash matches across batches") {
    import org.apache.spark.unsafe.types.UTF8String
    val tA = "spark window shuffle join aggregate partition"
    val tB = "completely different words appear here entirely unrelated"
    val tC = "third vocabulary cluster with novel distinct tokens everywhere"
    // fixture preconditions, asserted via the SAME kernel the operator uses:
    // distinct texts must be far apart, so only true dups are rejected
    def sh(t: String) = graft.functions.HashUtil.simhash(UTF8String.fromString(t))
    for (Seq(x, y) <- Seq(tA, tB, tC).combinations(2))
      assert(java.lang.Long.bitCount(sh(x) ^ sh(y)) > 3, s"fixture too close: '$x' vs '$y'")

    val sink = s"nd_admit_${System.nanoTime()}"
    val src = MemoryStream[(Long, String)]
    val q = StreamingPipeline.streamingNearDupAdmit(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // batch 1: doc 2 is an exact dup of doc 1 (hamming 0 -> all blocks match)
    src.addData((1L, tA), (2L, tA), (3L, tB))
    q.processAllAvailable()
    val b1 = spark.table(sink).as[(Long, Boolean)].collect().toMap
    assert(b1 == Map(1L -> true, 2L -> false, 3L -> true), s"$b1")

    // batch 2: doc 9 duplicates batch-1 content (state must remember it);
    // doc 10 is novel, admitted, AND redelivered within the same batch —
    // the at-least-once copy must not self-match and veto the original
    src.addData((9L, tB), (10L, tC), (10L, tC))
    q.processAllAvailable()
    val b2 = spark.table(sink).as[(Long, Boolean)].collect().toMap
    q.stop()
    assert(b2 == b1 ++ Map(9L -> false, 10L -> true), s"$b2")
  }

  test("consolidated epoch marker: a mid-batch reader sees all-or-none") {
    import org.apache.spark.sql.types._
    val root = tmpdir("sp_epoch")
    val studentSchema = StructType(Seq(
      StructField("sn", IntegerType), StructField("score", IntegerType)))
    val roomSchema = StructType(Seq(
      StructField("rid", IntegerType), StructField("cap", IntegerType)))
    Seq("student", "room").foreach(t => Metrics.reset(s"$root/$t"))
    val targets = Map("student" -> s"$root/student", "room" -> s"$root/room")
    def pipeOpts(table: String) = PipelineOptions(CdcApplier.Options(
      if (table == "student") Seq("sn") else Seq("rid")))

    val src = MemoryStream[JsonEvent]
    src.addData(
      JsonEvent("insert", "student", 10, null, """{"sn":1,"score":90}"""),
      JsonEvent("insert", "room", 11, null, """{"rid":3,"cap":40}"""))
    val q = StreamingPipeline.startConsolidated(
      src.toDF(),
      Map("student" -> (studentSchema, s"$root/student"),
        "room" -> (roomSchema, s"$root/room")),
      s"$root/ckpt", pipeOpts, epochDir = Some(root))
    q.processAllAvailable()

    // a reader BETWEEN batches pins cleanly: both tables at the epoch
    val (b1, snaps1) = StreamingPipeline.Epoch.consistentSnapshot(spark, root, targets)
    assert(b1 == 0L)
    assert(snaps1("student").select("sn", "score").as[(Int, Int)].collect().toSet
      == Set((1, 90)))

    // simulate a reader landing MID-batch: student publishes (out-of-band
    // applyMicroBatch advances its high-watermark) but the batch's epoch
    // marker is not yet written — the pinned read must refuse a torn view
    val oob = Seq(SEvent("update", "student", 20,
        Some(SRow(1, 0, 90, null, null)), Some(SRow(1, 0, 95, null, null))))
      .toDS().toDF()
      .select($"op", $"table", $"next_position",
        struct($"after.sn".as("sn"), $"after.score".as("score")).as("after"),
        struct($"before.sn".as("sn"), $"before.score".as("score")).as("before"))
    StreamingPipeline.applyMicroBatch(spark, oob, s"$root/student", pipeOpts("student"))
    val e = intercept[IllegalStateException](
      StreamingPipeline.Epoch.consistentSnapshot(spark, root, targets,
        maxRetries = 2, retrySleepMs = 10L))
    assert(e.getMessage.contains("no consistent cross-table epoch"))

    // the next streaming batch completes the epoch; the pinned read returns
    // the all-tables state including the out-of-band advance
    src.addData(
      JsonEvent("update", "student", 20, """{"sn":1,"score":90}""", """{"sn":1,"score":95}"""),
      JsonEvent("update", "room", 21, """{"rid":3,"cap":40}""", """{"rid":3,"cap":45}"""))
    q.processAllAvailable()
    q.stop()
    val (b2, snaps2) = StreamingPipeline.Epoch.consistentSnapshot(spark, root, targets)
    assert(b2 == 1L)
    assert(snaps2("student").select("sn", "score").as[(Int, Int)].collect().toSet
      == Set((1, 95)))
    assert(snaps2("room").select("rid", "cap").as[(Int, Int)].collect().toSet
      == Set((3, 45)))
  }

  test("bounded near-dup admission evicts registry state past the watermark horizon") {
    import org.apache.spark.unsafe.types.UTF8String
    val tA = "spark window shuffle join aggregate partition"
    val tB = "completely different words appear here entirely unrelated"
    def sh(t: String) = graft.functions.HashUtil.simhash(UTF8String.fromString(t))
    assert(java.lang.Long.bitCount(sh(tA) ^ sh(tB)) > 3, "fixture too close")

    def ts(min: Long) = new Timestamp(1735689600000L + min * 60000L)
    val sink = s"nd_bounded_${System.nanoTime()}"
    val src = MemoryStream[(Long, Timestamp, String)]
    // chained stateful stages; see the operator's scaladoc for why the
    // global-watermark pattern check is a false positive here
    val q = GraftConf.withChainedStatefulStart(spark) {
      StreamingPipeline.streamingNearDupAdmitBounded(
        src.toDF().toDF("doc_id", "ts", "text"), "1 hour")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    }

    // batch 1: doc 1 admitted; doc 2 (same text, 1 min later) rejected —
    // the registry entry is alive well inside the horizon
    src.addData((1L, ts(0), tA), (2L, ts(1), tA))
    q.processAllAvailable()
    val b1 = spark.table(sink).as[(Long, Boolean)].collect().toMap
    assert(b1 == Map(1L -> true, 2L -> false), s"$b1")

    // batch 2: an unrelated doc 2h later advances the watermark past every
    // batch-1 entry's expiry (ts + 1h < 120min - 60min delay... wm = 60min)
    src.addData((3L, ts(120), tB))
    q.processAllAvailable()
    // batch 3: the same advance again so stage-1 timeouts FIRE (timeouts
    // are evaluated against the watermark set by the PREVIOUS batch)
    src.addData((4L, ts(121), tB))
    q.processAllAvailable()

    // batch 4: doc 9 repeats doc 1's text at minute 122. Doc 1/2's entries
    // carry ts 0-1min; the watermark is now ~61min, far past them — both
    // pruned, so doc 9 must be ADMITTED (the unbounded variant would veto)
    src.addData((9L, ts(122), tA))
    q.processAllAvailable()
    val b4 = spark.table(sink).as[(Long, Boolean)].collect().toMap
    assert(b4(9L), s"expired registry entries must not veto: $b4")
    // doc 4 duplicates doc 3 WITHIN the horizon: still rejected
    assert(!b4(4L) && b4(3L), s"in-horizon dups must still be rejected: $b4")

    // physical eviction: the state store must have REMOVED rows (stage-1
    // registries + stage-2 replay guards whose event time timed out)
    val totalRemoved = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()
    assert(totalRemoved > 0, s"expected state rows physically removed, got $totalRemoved")
  }

  test("bounded admission runs unchanged on the RocksDB state store (production backend)") {
    import org.apache.spark.unsafe.types.UTF8String
    val tA = "spark window shuffle join aggregate partition"
    val tB = "completely different words appear here entirely unrelated"
    def sh(t: String) = graft.functions.HashUtil.simhash(UTF8String.fromString(t))
    assert(java.lang.Long.bitCount(sh(tA) ^ sh(tB)) > 3, "fixture too close")
    def ts(min: Long) = new Timestamp(1735689600000L + min * 60000L)

    // the 100 TB state backend: same operator, same verdicts, state spilled
    // to RocksDB instead of the executor heap. conf is read at query
    // START, so apply the production profile + restore around it.
    val sink = s"nd_rocks_${System.nanoTime()}"
    val src = MemoryStream[(Long, Timestamp, String)]
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(provKey) // getOption surfaces the built-in default
    val chk = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val chkBefore = spark.conf.getOption(chk)
    val prev = GraftConf.applyProductionStreamingProfile(spark)
    // the profile sets ONLY state-store keys; the chained-stateful disable
    // is scoped per-start (the session-global safety check stays on)
    assert(spark.conf.getOption(chk) == chkBefore,
      "production profile must not touch the session-global correctness check")
    val q = try GraftConf.withChainedStatefulStart(spark) {
      StreamingPipeline.streamingNearDupAdmitBounded(
        src.toDF().toDF("doc_id", "ts", "text"), "1 hour")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    } finally GraftConf.restoreConf(spark, prev)
    assert(spark.conf.getOption(provKey) == before,
      "restoreConf must return the session to its prior state")
    src.addData((1L, ts(0), tA), (2L, ts(1), tA), (3L, ts(2), tB))
    q.processAllAvailable()
    val got = spark.table(sink).as[(Long, Boolean)].collect().toMap
    // RocksDB actually backed the state stores of this run
    val providers = q.lastProgress.stateOperators
      .flatMap(op => Option(op.customMetrics).toSeq)
      .flatMap(m => { import scala.jdk.CollectionConverters._; m.keySet().asScala })
    q.stop()
    assert(got == Map(1L -> true, 2L -> false, 3L -> true), s"$got")
    assert(providers.exists(_.toLowerCase.contains("rocksdb")),
      s"expected rocksdb state-store metrics, got: ${providers.toSeq.sorted.take(10)}")
  }

  test("bounded budget admission resets an idle source's window past the horizon") {
    def ts(min: Long) = new Timestamp(1735689600000L + min * 60000L)
    val sink = s"budget_bounded_${System.nanoTime()}"
    val src = MemoryStream[(Long, String, Long, Timestamp)]
    val q = StreamingPipeline.streamingBudgetAdmitBounded(
        src.toDF().toDF("doc_id", "source", "n_tokens", "ts"),
        _ => 100L, "1 hour")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // window 1: source a fills its 100-token budget (110 crosses, kept)
    src.addData((1L, "a", 60L, ts(0)), (2L, "a", 50L, ts(1)), (3L, "a", 5L, ts(2)))
    q.processAllAvailable()
    val b1 = spark.table(sink).as[(Long, String, Long, Long)].collect().map(_._1).toSet
    assert(b1 == Set(1L, 2L), s"budget window 1 must cap at 100 tokens: $b1")

    // push the watermark far past window 1, then fire the timeout
    src.addData((4L, "zz_other", 1L, ts(180)))
    q.processAllAvailable()
    src.addData((5L, "zz_other", 1L, ts(181)))
    q.processAllAvailable()

    // window 2: source a returns after >1h idle — its counter expired, so
    // the budget RESTARTS (the unbounded variant would admit nothing)
    src.addData((6L, "a", 80L, ts(185)))
    q.processAllAvailable()
    val b2 = spark.table(sink).as[(Long, String, Long, Long)].collect()
      .filter(_._1 == 6L)
    q.stop()
    assert(b2.map(r => (r._1, r._4)).toSeq == Seq((6L, 0L)),
      s"idle source must restart at start=0 after horizon expiry: ${b2.toSeq}")
  }

  test("S12 as explicit state: mapGroupsWithState tracks per-key latest position") {
    val sink = s"lpk_${System.nanoTime()}"
    val src = MemoryStream[SEvent]
    val q = StreamingPipeline.latestPerKey(src.toDS())(e => (e.before, e.after) match {
        case (_, Some(a)) => s"${a.sn}:${a.id}"
        case (Some(b), _) => s"${b.sn}:${b.id}"
        case _ => "?"
      }, _.next_position)
      .toDF("key", "latest_pos")
      .writeStream.format("memory").queryName(sink).outputMode("update").start()

    src.addData(ins(10, r1), ins(11, r2))
    q.processAllAvailable()
    src.addData(upd(20, r1, r1v2), ins(5, r1)) // pos 5 is stale for key 1:1
    q.processAllAvailable()
    val latest = spark.table(sink).as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    q.stop()
    assert(latest("1:1") == 20L, "stale position must not regress the per-key state")
    assert(latest("2:7") == 11L)
  }

  test("S20 as a streaming dual sink: coerced replica follows the primary") {
    val target = tmpdir("sp_t") + "/student"
    val second = tmpdir("sp_s") + "/student_replica"
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    val q = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c"),
      opts().copy(secondaryDir = Some(second)))
    src.addData(ins(10, r1), ins(11, r2))
    q.processAllAvailable()
    src.addData(del(20, r2))
    q.processAllAvailable()
    q.stop()
    val replica = spark.read.parquet(second)
      .select("sn", "id", "score", "name", "rem").as[SRow].collect().toSet
    assert(replica == Set(r1), "second sink must track the converged primary state")
  }

  test("binlog-purged gap on resume fails with an explicit rebootstrap error") {
    val target = tmpdir("sp_t") + "/student"
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    src.addData(ins(10, r1))
    val q1 = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c"), opts())
    q1.processAllAvailable()
    q1.stop()
    assert(StreamingPipeline.readHighWater(spark, target).contains(10L))

    // source purged everything below 50: positions 11..49 are gone forever
    src.addData(ins(50, r2))
    val q2 = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c2"),
      opts().copy(earliestPos = Some(50L)))
    val e = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("rebootstrap required")), messages(e).mkString("; "))
    assert(state(target) == Set(r1), "no partial apply past a purged gap")

    // a source whose retention still covers the watermark resumes fine
    val q3 = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c3"),
      opts().copy(earliestPos = Some(11L)))
    q3.processAllAvailable()
    q3.stop()
    assert(state(target) == Set(r1, r2))
  }

  test("S17 via JMX: pipeline metrics are readable from the platform MBeanServer") {
    import java.lang.management.ManagementFactory
    val target = tmpdir("sp_t") + "/student"
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    src.addData(ins(10, r1), ins(11, r2))
    val q = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c"), opts())
    q.processAllAvailable()
    q.stop()

    val name = Metrics.registerJmx(target) // idempotent re-register
    val server = ManagementFactory.getPlatformMBeanServer
    assert(server.isRegistered(name))
    assert(server.getAttribute(name, "BatchCount").asInstanceOf[Long] >= 1L)
    assert(server.getAttribute(name, "OpCounts").asInstanceOf[String]
      .contains("student.insert=2"))
    assert(server.getAttribute(name, "RecentLatenciesMs").asInstanceOf[Array[Long]].nonEmpty)

    // reset() tears the bean down — long-lived drivers cycling through
    // many targets must not accumulate beans on the platform server
    Metrics.reset(target)
    assert(!server.isRegistered(name))
  }

  test("S18: status server serves metrics JSON over HTTP") {
    val target = tmpdir("sp_t") + "/student"
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    src.addData(ins(10, r1))
    val q = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c"), opts())
    q.processAllAvailable()
    q.stop()

    val server = new StatusServer(port = 0)
    try {
      def get(path: String): (Int, String) = {
        val url = java.net.URI.create(s"http://localhost:${server.boundPort}$path").toURL
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        // HttpURLConnection's DEFAULT Accept header leads with text/html;
        // be explicit, like any real JSON consumer
        conn.setRequestProperty("Accept", "application/json")
        val code = conn.getResponseCode
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        val body = new String(is.readAllBytes(), "UTF-8")
        (code, body)
      }
      assert(get("/health") == (200, "ok"))
      val enc = java.net.URLEncoder.encode(target, "UTF-8")
      val (code, body) = get(s"/status?target=$enc")
      assert(code == 200)
      assert(body.contains("\"batches\":1"))
      assert(body.contains("\"student.insert\":1"))
      assert(get("/status")._1 == 400)
    } finally server.stop()
  }

  test("S18: /status renders HTML tables when the client prefers text/html; /jmx dumps any platform MBean") {
    val target = tmpdir("sp_t") + "/student"
    Metrics.reset(target)
    val src = MemoryStream[SEvent]
    src.addData(ins(10, r1))
    val q = StreamingPipeline.start(src.toDF(), target, tmpdir("sp_c"), opts())
    q.processAllAvailable()
    q.stop()
    val jmxName = Metrics.registerJmx(target)

    val server = new StatusServer(port = 0)
    try {
      def get(path: String, accept: String = "application/json"): (Int, String, String) = {
        val url = java.net.URI.create(s"http://localhost:${server.boundPort}$path").toURL
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestProperty("Accept", accept)
        val code = conn.getResponseCode
        val ctype = Option(conn.getContentType).getOrElse("")
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        val body = new String(is.readAllBytes(), "UTF-8")
        (code, ctype, body)
      }
      val enc = java.net.URLEncoder.encode(target, "UTF-8")

      // content negotiation: same endpoint, both representations
      // a browser-style Accept leading with text/html gets the HTML page
      val (hc, hct, html) = get(s"/status?target=$enc",
        accept = "text/html,application/xhtml+xml,*/*;q=0.8")
      assert(hc == 200 && hct.startsWith("text/html"), s"$hc $hct")
      assert(html.contains("<table border=1") && html.contains("student.insert"), html)
      val (jc, jct, json) = get(s"/status?target=$enc")
      assert(jc == 200 && jct.startsWith("application/json"), s"$jc $jct")
      assert(json.contains("\"student.insert\":1"))

      // q-value negotiation: an explicit JSON preference wins even when
      // text/html appears first, and ties fall back to JSON
      val (qc, qct, _) = get(s"/status?target=$enc",
        accept = "text/html;q=0.1, application/json")
      assert(qc == 200 && qct.startsWith("application/json"), s"$qc $qct")
      assert(get(s"/status?target=$enc", accept = "*/*")._2
        .startsWith("application/json"))

      // the generic /jmx surface: a JVM platform bean nobody registered...
      val (mc, mct, mem) = get("/jmx?qry=" + java.net.URLEncoder.encode("java.lang:type=Memory", "UTF-8"))
      assert(mc == 200 && mct.startsWith("application/json"), s"$mc $mct")
      assert(mem.contains("\"HeapMemoryUsage\"") && mem.contains("\"used\":"),
        mem.take(500)) // CompositeData expanded into a JSON object
      // ...the graft pipeline bean through the same endpoint...
      val (_, _, pipe) = get("/jmx?qry=" + java.net.URLEncoder.encode(jmxName.toString, "UTF-8"))
      assert(pipe.contains("\"BatchCount\":") && pipe.contains("student.insert"), pipe.take(500))
      // ...the default pattern covers all beans, and bad patterns are a 400
      val (_, _, all) = get("/jmx")
      assert(all.contains("java.lang:type=Runtime"), all.take(200))
      assert(get("/jmx?qry=%3A%3A%3A")._1 == 400)
    } finally {
      server.stop()
      Metrics.reset(target)
    }
  }

  test("watermarked tumbling window emits finalized windows and drops late data") {
    val sink = s"win_${System.nanoTime()}"
    val src = MemoryStream[TsEvent]
    val q = StreamingPipeline.windowedCounts(src.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    src.addData(TsEvent(ts(9, 10), "click", 1.0), TsEvent(ts(9, 40), "click", 2.0))
    q.processAllAvailable()
    // advance event time far enough that the 09:00 window finalizes
    src.addData(TsEvent(ts(12, 0), "view", 5.0))
    q.processAllAvailable()
    val after2 = spark.table(sink).as[(Timestamp, String, Long, Double)].collect().toSet
    assert(after2.contains((ts(9, 0), "click", 2L, 3.0)), s"9:00 window should be emitted, got $after2")

    // late event inside an already-finalized window: dropped by the watermark
    src.addData(TsEvent(ts(9, 20), "click", 100.0))
    q.processAllAvailable()
    val after3 = spark.table(sink).as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(after3 == after2, "late data beyond the watermark must be dropped")
  }

  test("streaming session windows merge across batches and emit once closed") {
    val sink = s"sess_${System.nanoTime()}"
    val src = MemoryStream[(Long, Timestamp, Double)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val q = StreamingPipeline.sessionizedCounts(
        src.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // u1: one tight session + a separate later one; u2: two sessions 50min
    // apart that only a later bridging event will merge
    src.addData((1L, ts(10, 0), 1.0), (1L, ts(10, 10), 2.0),
      (2L, ts(10, 0), 1.0), (2L, ts(10, 50), 1.0))
    q.processAllAvailable()
    assert(spark.table(sink).isEmpty, "append mode: nothing closes before the watermark")
    // the bridge is out-of-order (10:25 after 10:50 was seen) but inside
    // the 1h delay -> u2's two sessions must MERGE into one
    src.addData((2L, ts(10, 25), 1.0), (1L, ts(11, 30), 5.0))
    q.processAllAvailable()
    // advance event time so every session's end is behind the watermark
    src.addData((9L, ts(15, 0), 0.0))
    q.processAllAvailable()

    val got = spark.table(sink)
      .as[(Timestamp, Timestamp, Long, Long, Double)].collect().toSet
    q.stop()
    assert(got.contains((ts(10, 0), ts(10, 40), 1L, 2L, 3.0)), s"u1 first session: $got")
    assert(got.contains((ts(11, 30), ts(12, 0), 1L, 1L, 5.0)), s"u1 second session: $got")
    assert(got.contains((ts(10, 0), ts(11, 20), 2L, 3L, 3.0)),
      s"u2 sessions must merge through the bridge: $got")
    assert(!got.exists(r => r._3 == 2L && r._1 == ts(10, 50)),
      s"no unmerged u2 fragment may emit: $got")
  }

  test("bounded streaming dedup suppresses within the horizon, re-admits after it") {
    val sink = s"bdedup_${System.nanoTime()}"
    val src = MemoryStream[(Long, Timestamp, String)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val q = StreamingPipeline.streamingDedupBounded(
        src.toDF().toDF("doc_id", "ts", "text"), delay = "1 hour")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // same content twice in one batch: one survivor
    src.addData((1L, ts(10, 0), "alpha"), (2L, ts(10, 1), "alpha"), (3L, ts(10, 2), "beta"))
    q.processAllAvailable()
    // duplicate inside the watermark horizon: suppressed
    src.addData((4L, ts(10, 30), "alpha"))
    q.processAllAvailable()
    val inside = spark.table(sink).as[(String, Long)].collect().map(_._2).toSet
    assert(inside.intersect(Set(1L, 2L)).size == 1 && inside.contains(3L) &&
      !inside.contains(4L), s"within-horizon dup must be suppressed: $inside")

    // advance the watermark far past alpha's entry (+delay), then replay
    // the content: state was dropped, so it re-emits — the documented
    // bounded-state trade-off
    src.addData((5L, ts(13, 0), "gamma"))
    q.processAllAvailable()
    src.addData((6L, ts(13, 1), "alpha"))
    q.processAllAvailable()
    val after = spark.table(sink).as[(String, Long)].collect().map(_._2).toSet
    q.stop()
    assert(after.contains(6L), s"post-horizon duplicate must re-admit: $after")
  }

  test("stream-stream attribution join matches across batches, both arrival orders") {
    val sink = s"attr_${System.nanoTime()}"
    val srcC = MemoryStream[(Long, Long, Timestamp)]
    val srcP = MemoryStream[(Long, Long, Timestamp, Double)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val q = StreamingPipeline.attributionJoin(
        srcC.toDF().toDF("click_id", "c_user_id", "click_ts"),
        srcP.toDF().toDF("conv_id", "p_user_id", "conv_ts", "conv_value"))
      .select($"click_id", $"conv_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // batch 1: two clicks, no conversions yet
    srcC.addData((1L, 1L, ts(10, 0)), (2L, 2L, ts(10, 5)))
    q.processAllAvailable()
    // batch 2: in-window conv (u1), out-of-window conv (u1, +45min),
    // in-window conv (u2), and a conv whose CLICK has not arrived yet (u3)
    srcP.addData((101L, 1L, ts(10, 20), 5.0), (102L, 1L, ts(10, 45), 6.0),
      (103L, 2L, ts(10, 25), 7.0), (105L, 3L, ts(11, 10), 8.0))
    q.processAllAvailable()
    // batch 3: an out-of-order conv for u1 (earlier event time than batch
    // 2's rows, but within the 1h delay -> must still match), plus the
    // late-arriving click that completes conv 105
    srcP.addData((104L, 1L, ts(10, 29), 9.0))
    srcC.addData((3L, 3L, ts(11, 0)))
    q.processAllAvailable()

    val got = spark.table(sink).as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((1L, 101L), (2L, 103L), (1L, 104L), (3L, 105L)),
      s"attribution pairs wrong: $got")
  }

  test("outer attribution join emits NULL row only after the match horizon closes") {
    val sink = s"attro_${System.nanoTime()}"
    val srcC = MemoryStream[(Long, Long, Timestamp)]
    val srcP = MemoryStream[(Long, Long, Timestamp, Double)]
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val q = StreamingPipeline.attributionJoinOuter(
        srcC.toDF().toDF("click_id", "c_user_id", "click_ts"),
        srcP.toDF().toDF("conv_id", "p_user_id", "conv_ts", "conv_value"))
      .select($"click_id", $"conv_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()

    // u1 converts in-window; u2 never converts
    srcC.addData((1L, 1L, ts(10, 0)), (2L, 2L, ts(10, 5)))
    srcP.addData((101L, 1L, ts(10, 20), 5.0))
    q.processAllAvailable()
    // horizon for click 2 is 10:35 + 1h delay; watermark is still at the
    // feed's max - delay, so the NULL row must NOT have emitted yet
    val early = spark.table(sink).as[(Long, Option[Long])].collect().toSet
    assert(!early.contains((2L, None)),
      s"null row emitted before the horizon closed: $early")
    // sentinel on BOTH streams (watermark = min across inputs) pushes the
    // watermark past click 2's horizon -> exactly one NULL row appears
    srcC.addData((-1L, -1L, ts(23, 0)))
    srcP.addData((-2L, -1L, ts(23, 0), 0.0))
    q.processAllAvailable()
    val got = spark.table(sink).as[(Long, Option[Long])].collect().toSet
      .filter(_._1 >= 0)
    q.stop()
    assert(got == Set((1L, Some(101L)), (2L, None)),
      s"outer attribution rows wrong: $got")
  }

  test("slidingWindowedCounts: every event lands in exactly two windows") {
    // batch execution of the same plan (window() is mode-agnostic;
    // withWatermark is a no-op on batch) — the q162 gate covers the
    // streaming run, this pins the double-assignment algebra directly
    val events = Seq(
      TsEvent(Timestamp.valueOf("2026-01-01 10:15:00"), "click", 1.0),
      TsEvent(Timestamp.valueOf("2026-01-01 10:45:00"), "click", 2.0),
      TsEvent(Timestamp.valueOf("2026-01-01 11:05:00"), "view", 4.0)).toDF()
    val got = StreamingPipeline.slidingWindowedCounts(events)
      .select(unix_timestamp($"ws").as("ws"), $"event_type", $"n", $"total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    def h(hh: Int) = Timestamp.valueOf(f"2026-01-01 $hh%02d:00:00").getTime / 1000
    assert(got == Set(
      (h(9), "click", 2L, 3.0), (h(10), "click", 2L, 3.0),   // both 10:xx clicks
      (h(10), "view", 1L, 4.0), (h(11), "view", 1L, 4.0)),   // the 11:05 view
      got.toString)
    // conservation: Σn over all windows = 2 x events
    assert(got.toSeq.map(_._3).sum == 2L * events.count())
  }
}
