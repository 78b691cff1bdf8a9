package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed feed row for the q71 event streams (MemoryStream needs a
  * product encoder). */
case class EventRow(event_id: Long, user_id: Long, event_type: String,
    ts: java.sql.Timestamp, value: Double)

/** Typed feed row for q84's windowed-aggregation stream. */
case class WindowEventRow(ts: java.sql.Timestamp, event_type: String, value: Double)

/** Driver-gated STREAMING analytics queries (beyond the CDC merge gates in
  * [[graft.cdc.CdcQueries]]): real `writeStream` runs whose final output is
  * compared against the equivalent batch SQL in DuckDB — proving the
  * streaming plan computes the same relation, not just that it runs.
  */
object StreamQueries {

  /** q127 count-min geometry: d rows x w columns = the ENTIRE streaming
    * state, regardless of vocabulary size. Bases are distinct primes
    * feeding the portable polyhash as the row-hash family. */
  val CmsD = 4
  val CmsW = 512
  val CmsBases = Seq(31, 37, 41, 43)
  /** Probe set = the distinct terms of this fixed doc prefix (driver-
    * bounded by construction — a fixed number of docs at every SF). */
  val CmsProbeDocs = 40

  /** q128 HyperLogLog geometry: m registers per group; rho is the
    * trailing-zeros+1 of the post-register hash bits (a geometric variable,
    * Flajolet et al. 2007), capped where the portable hash runs out of
    * bits. 2^-rho is materialized from EXACT decimal literals (generated
    * once here), never a runtime pow() whose libm could differ. */
  val HllM = 256
  val HllMaxRho = 23

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q182: STREAMING chi-square drift — q177 as a live monitor: the
    //      (event_type, bucket) baseline/current counters accumulate in a
    //      complete-mode stateful agg as events arrive, and the chi2
    //      report is computed from the final cell frame by the SAME
    //      chi2FromCells the batch gate uses. The split point (the
    //      training-snapshot boundary — known in a real deployment) is
    //      resolved batch-side with q177's exact integer-midpoint rule
    //      and baked into the streaming projection as a literal. The b/o
    //      counters are commuting sums, so micro-batch boundaries,
    //      shuffle placement, and replays cannot change the final cells —
    //      which is exactly why q177's batch oracle gates this run
    //      verbatim (the q137/q149 one-decision-procedure discipline).
    //      State is bounded at types x 10 buckets x 2 counters regardless
    //      of stream length.
    "q182_stream_chi2_drift" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val ev = graft.operators.Analytics.chi2Projected(Tables.load(s, dir, "events"))
      val mid = ev.agg(expr("(min(tsec) + max(tsec)) div 2").as("mid"))
        .collect()(0).getLong(0)
      val rows = ev.select($"event_type", $"tsec", $"bkt")
        .as[(String, Long, Long)].collect()
      val src = MemoryStream[(String, Long, Long)]
      val cellStream = src.toDF().toDF("event_type", "tsec", "bkt")
        .groupBy($"event_type", $"bkt")
        .agg(sum(when($"tsec" < mid, 1L).otherwise(0L)).as("b"),
          sum(when($"tsec" >= mid, 1L).otherwise(0L)).as("o"))
      val qname = "q182_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = cellStream.writeStream.format("memory").queryName(qname)
          .outputMode("complete").start()
        try {
          rows.grouped(math.max(500, (rows.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val cells0 = s.table(qname)
      val cells = s.createDataFrame(
        java.util.Arrays.asList(cells0.collect(): _*), cells0.schema)
      s.catalog.dropTempView(qname)
      graft.operators.Analytics.chi2FromCells(cells)
    }),

    // ---- q194: STREAMING event-transition mining — q192 as a live
    //      pipeline: per-user adjacency extracted by a keyed stateful
    //      operator (one (seq, last-type) pair of state per user,
    //      StreamingPipeline.streamingTransitions) with the feed in
    //      global (ts, event_id) order chunked ARBITRARILY — the state
    //      carries each user's last event across micro-batch boundaries,
    //      so chunking cannot break adjacency. The transition COUNTING is
    //      commutative, so the sunk rows fold through the same
    //      transitionReport as batch and q192's oracle gates this run
    //      verbatim (the q137/q149/q182 one-decision-procedure
    //      discipline).
    "q194_stream_transitions" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = Tables.load(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .as[(Long, java.sql.Timestamp, Long, String)].collect()
        .sortBy { case (_, ts, eid, _) => (ts.getTime, ts.getNanos, eid) }
        .zipWithIndex
        .map { case ((uid, _, _, tp), i) => (uid, i.toLong, tp) }
      val src = MemoryStream[(Long, Long, String)]
      val stream = graft.streaming.StreamingPipeline
        .streamingTransitions(src.toDS()).toDF("from_type", "to_type")
      val qname = "q194_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = stream.writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
        try {
          rows.grouped(math.max(500, (rows.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk0 = s.table(qname)
      val sunk = s.createDataFrame(
        java.util.Arrays.asList(sunk0.collect(): _*), sunk0.schema)
      s.catalog.dropTempView(qname)
      graft.operators.Analytics.transitionReport(sunk)
    }),

    // ---- q210: STREAMING last-touch attribution — q188's last-touch
    //      model live (StreamingPipeline.streamingLastTouch): one
    //      (click id, click tsec) pair of state per user, purchases
    //      credit it inside the trailing window. The feed orders by
    //      (tsec, click-before-purchase, event_id) — the exact order
    //      under which the stateful rule equals the batch rank window
    //      (see the operator's scaladoc for the tie algebra) — and
    //      chunks arbitrarily (state carries across boundaries). The
    //      oracle replays the batch arm.
    "q210_stream_attribution" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = Tables.load(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", unix_timestamp($"ts").as("tsec"), $"event_id",
          $"event_type")
        .as[(Long, Long, Long, String)].collect()
        .sortBy { case (_, ts, eid, typ) =>
          (ts, if (typ == "click") 0 else 1, eid) }
        .zipWithIndex
        .map { case ((uid, ts, eid, typ), i) => (uid, i.toLong, typ, eid, ts) }
      val src = MemoryStream[(Long, Long, String, Long, Long)]
      val stream = graft.streaming.StreamingPipeline
        .streamingLastTouch(src.toDS()).toDF("cid", "pid")
      val qname = "q210_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = stream.writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
        try {
          rows.grouped(math.max(500, (rows.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk0 = s.table(qname)
      val sunk = s.createDataFrame(
        java.util.Arrays.asList(sunk0.collect(): _*), sunk0.schema)
      s.catalog.dropTempView(qname)
      sunk.groupBy(col("cid"))
        .agg(graft.util.Sumd.sumd(lit(1.0)).as("credit"),
          count(lit(1)).as("n_purchases"))
        .repartition(1).sortWithinPartitions(col("cid"))
    }),

    // ---- q215: STREAMING CUSUM — q212 as a live monitor
    //      (StreamingPipeline.streamingCusum): per-type state is the
    //      (prefix sum, running min) pair the recurrence needs; the feed
    //      orders by (tsec, event_id) and chunks arbitrarily (state
    //      carries across boundaries), deviations come from the SAME
    //      cusumDevs quantization as batch, so the emitted statistic
    //      series equals the batch window computation row for row and
    //      q212's oracle gates this run verbatim through the shared
    //      cusumReport (the q137/q149/q182/q194 discipline).
    "q215_stream_cusum" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = graft.operators.Analytics.cusumDevs(s, dir)
        .as[(String, Long, Long, Long)].collect()
        .sortBy { case (_, ts, eid, _) => (ts, eid) }
        .zipWithIndex
        .map { case ((tp, ts, _, dq), i) => (tp, i.toLong, ts, dq) }
      val src = MemoryStream[(String, Long, Long, Long)]
      val stream = graft.streaming.StreamingPipeline
        .streamingCusum(src.toDS()).toDF("event_type", "tsec", "s")
      val qname = "q215_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = stream.writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
        try {
          rows.grouped(math.max(500, (rows.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk0 = s.table(qname)
      val sunk = s.createDataFrame(
        java.util.Arrays.asList(sunk0.collect(): _*), sunk0.schema)
      s.catalog.dropTempView(qname)
      graft.operators.Analytics.cusumReport(sunk)
    }),

    // ---- q149: STREAMING KMV sketch — the deterministic member of the
    //      commuting-sketch family (q127 CMS: counters add; q128 HLL:
    //      registers max; KMV: k-smallest-distinct, a union-trim that is
    //      associative, commutative AND idempotent — so batch boundaries,
    //      shuffle placement, and replays provably cannot change the
    //      final sketch). The SAME typed Aggregator as batch q148 runs in
    //      complete mode; the run shares q148's report arithmetic and
    //      ORACLE verbatim (q137's one-decision-procedure discipline —
    //      sound because the streaming and batch sketches are equal by
    //      the set-function theorem, and the shared gate enforces it).
    "q149_stream_kmv" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = graft.operators.Advanced.kmvHashed(s, dir)
        .select($"event_type", $"h")
        .orderBy($"event_type", $"h").as[(String, Long)].collect()
      val src = MemoryStream[(String, Long)]
      val kmv = new graft.operators.KmvAgg(graft.operators.Advanced.KmvK)
      val sketchStream = src.toDS()
        .groupByKey(_._1).mapValues(_._2)
        .agg(kmv.toColumn.name("kmv"))
        .toDF("event_type", "kmv")
      val qname = "q149_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = sketchStream.writeStream.format("memory").queryName(qname)
          .outputMode("complete").start()
        try {
          rows.grouped(math.max(500, (rows.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sk0 = s.table(qname)
      val sketches = s.createDataFrame(
        java.util.Arrays.asList(sk0.collect(): _*), sk0.schema)
      s.catalog.dropTempView(qname)
      graft.operators.Advanced.kmvReport(s, dir, sketches)
    }),

    // ---- q154: STREAMING paragraph-level dedup — q141 as a live
    //      pipeline (two chained append-mode stateful stages: first-seen
    //      registry on the paragraph digest, then watermark-closed
    //      per-doc reassembly). The feed is (doc_id, pi)-ordered and
    //      chunked at DOC boundaries (a doc split across micro-batches
    //      would lose its tail as late data once the watermark passed it
    //      — the streaming contract this gate therefore exercises), so
    //      arrival order equals q141's global first-occurrence order and
    //      q141's oracle gates both execution modes verbatim.
    "q154_stream_para_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      graft.functions.GraftFunctions.register(s)
      val paras = graft.ext.Corpus.paragraphs(s, dir)
        .orderBy($"doc_id", $"pi")
        .as[(Long, Long, String)].collect()
      val sentinel = 10000000L
      // chunk at doc boundaries, 4 chunks; sentinel doc closes the tail
      val docs = paras.map(_._1).distinct.sorted
      val docChunk = docs.zipWithIndex
        .map { case (d, i) => d -> i * 4 / docs.length }.toMap
      val chunks = paras.groupBy(r => docChunk(r._1)).toSeq.sortBy(_._1).map(_._2)
      val src = MemoryStream[(Long, Long, String)]
      val qname = "q154_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = GraftConf.withChainedStatefulStart(s) {
          StreamingPipeline.streamingParaDedup(
              src.toDF().toDF("doc_id", "pi", "para"))
            .writeStream.format("memory").queryName(qname)
            .outputMode("append").start()
        }
        try {
          chunks.foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
          src.addData((sentinel, 0L, "sentinel")); query.processAllAvailable()
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname).filter($"doc_id" < sentinel)
        .select($"doc_id", $"paras_total", $"paras_kept", $"clean_hash")
        .orderBy($"doc_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q128: STREAMING HyperLogLog — distinct-count estimation whose
    //      per-group state is m=256 registers however many distinct users
    //      exist: the cardinality sibling of q127's count-min (the two
    //      classic bounded sketches, both streaming-stateful here).
    //      Register updates are MAX operations — commutative and
    //      idempotent — so the final registers are independent of
    //      micro-batch boundaries, shuffle placement, and replays, and the
    //      gate is an EXACT DuckDB replay of registers AND estimate (same
    //      portable hash, same trailing-zero rho, same exact 2^-rho
    //      literals, same register-ordered fold, same alpha arithmetic) —
    //      stronger than q29's self-validated error bound, which this
    //      complements. Streaming plan: project to (type, reg, rho),
    //      complete-mode groupBy max — partial aggs combine map-side, the
    //      shuffle carries at most groups x m rows per batch.
    "q128_stream_hll" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      graft.functions.GraftFunctions.register(s)
      import graft.ext.TextOps
      // rho from the post-register bits: trailing zeros + 1, capped
      def rhoOf(h2: org.apache.spark.sql.Column) = {
        val arms = (0 until HllMaxRho - 1).foldLeft(
          when(h2 === 0, HllMaxRho)) { (acc, k) =>
          acc.when(h2 % (1L << (k + 1)) === (1L << k), k + 1)
        }
        arms.otherwise(HllMaxRho)
      }
      val rows = Tables.load(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"event_type")
        .orderBy($"user_id").as[(Long, String)].collect()
      val src = MemoryStream[(Long, String)]
      val regs = src.toDF().toDF("user_id", "event_type")
        .select($"event_type",
          TextOps.polyHash($"user_id".cast("string"), 31).as("h"))
        .select($"event_type", ($"h" % HllM).cast("int").as("reg"),
          expr(s"h DIV $HllM").as("h2"))
        .select($"event_type", $"reg", rhoOf($"h2").as("rho"))
        .groupBy($"event_type", $"reg")
        .agg(max($"rho").as("mr"))
      val qname = "q128_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = regs.writeStream.format("memory").queryName(qname)
          .outputMode("complete").start()
        try {
          rows.grouped(math.max(500, (rows.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sk0 = s.table(qname).select($"event_type", $"reg", $"mr")
      val sk = s.createDataFrame(
        java.util.Arrays.asList(sk0.collect(): _*), sk0.schema)
      s.catalog.dropTempView(qname)
      // exact 2^-rho literals (generated once; no runtime pow)
      val inv = (1 to HllMaxRho).foldLeft(when(lit(false), 0.0)) { (acc, k) =>
        acc.when($"mr" === k, lit(1.0 / (1L << k)))
      }.otherwise(0.0)
      // per-type register-ordered fold + untouched registers at 2^0 = 1
      val folded = sk
        .select($"event_type", struct($"reg", inv.as("inv")).as("ri"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("touched"),
          aggregate(sort_array(collect_list($"ri")), lit(0.0),
            (acc, x) => acc + x.getField("inv")).as("s"))
        .select($"event_type", (lit(HllM) - $"touched").cast("long").as("zero_regs"),
          ($"s" + (lit(HllM) - $"touched").cast("double")).as("total"))
      val exact = Tables.load(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type").agg(countDistinct($"user_id").as("n_exact"))
      exact.join(folded, "event_type")
        .withColumn("est",
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) / $"total")
        .select($"event_type", $"n_exact", $"zero_regs", $"est")
        .repartition(1).sortWithinPartitions($"event_type")
    }),

    // ---- q127: STREAMING count-min sketch — frequency estimation whose
    //      state is a fixed d x w counter grid (2048 cells here) no matter
    //      how large the vocabulary grows: the bounded-memory answer to
    //      "how often does any term occur" that per-term state (q94's
    //      family) cannot give at 100 TB. CMS updates are pure additions,
    //      so the sketch is ORDER-INDEPENDENT: micro-batch boundaries,
    //      shuffle placement, and retry replays cannot change the final
    //      counters — which is what makes an EXACT oracle possible (DuckDB
    //      rebuilds the identical grid declaratively; estimates = min over
    //      the d probed cells, deterministic, no probabilistic assertion
    //      anywhere). The streaming plan is one explode (d rows per token)
    //      into a complete-mode groupBy((r, c)) — Spark's partial aggs do
    //      the map-side combine, the shuffle carries at most d*w rows per
    //      batch. Estimates for the probe terms then read the final grid
    //      with d broadcast lookups + a per-term min; `cnt` (the exact
    //      batch count) rides along so the report exposes estimate vs
    //      truth — the CMS >= -truth guarantee is structural, the oracle
    //      equality is the gate. (Cormode & Muthukrishnan 2005.)
    "q127_stream_cms" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      graft.functions.GraftFunctions.register(s)
      import graft.ext.TextOps
      def cells(term: org.apache.spark.sql.Column) =
        explode(array((0 until CmsD).map(r =>
          struct(lit(r).as("r"),
            (TextOps.polyHash(term, CmsBases(r)) % CmsW).as("c"))): _*)).as("rc")
      // Driver feed synthesis, same note as q71/q87.
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
        .orderBy($"doc_id").as[(Long, String)].collect()
      val src = MemoryStream[(Long, String)]
      val counters = src.toDF().toDF("doc_id", "text")
        .select(explode(TextOps.words($"text")).as("term"))
        .select(cells($"term"))
        .groupBy($"rc.r".as("r"), $"rc.c".as("c")).agg(count(lit(1)).as("n"))
      val qname = "q127_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = counters.writeStream.format("memory").queryName(qname)
          .outputMode("complete").start()
        try {
          docs.grouped(math.max(100, (docs.length + 3) / 4)).foreach { ch =>
            src.addData(ch.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // The final grid is d*w rows — bounded by construction, like the
      // other memory-sink drains in this file.
      val sk0 = s.table(qname).select($"r", $"c", $"n")
      val sk = s.createDataFrame(
        java.util.Arrays.asList(sk0.collect(): _*), sk0.schema)
      s.catalog.dropTempView(qname)
      val corpus = Tables.load(s, dir, "documents")
      val probes = corpus.filter($"doc_id" < CmsProbeDocs)
        .select(explode(TextOps.words($"text")).as("term")).distinct()
      val exact = corpus.select(explode(TextOps.words($"text")).as("term"))
        .join(broadcast(probes), "term")
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
      val est = probes.select($"term", cells($"term"))
        .join(broadcast(sk), col("rc.r") === sk("r") && col("rc.c") === sk("c"))
        .groupBy($"term").agg(min($"n").as("est"))
      exact.join(est, "term")
        .select($"term", $"cnt", $"est")
        .repartition(1).sortWithinPartitions($"term")
    }),
    // ---- q71: watermarked stream-stream interval join. The click and
    //      purchase halves of the events table are replayed in event-time
    //      order as two MemoryStreams; the attribution join emits every
    //      (click, purchase-within-30-min) pair for the same user. The
    //      batch oracle is the identical interval join in DuckDB — an
    //      append-mode inner join with in-order feeds emits EXACTLY the
    //      batch answer (the watermark only bounds state, it drops
    //      nothing that can still match). Covers SURVEY §2.2's streaming
    //      row beyond aggregation: two-sided join state, watermark-driven
    //      eviction.
    "q71_stream_join" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext

      // Driver feed synthesis, same note as q33: MemoryStream data must
      // originate on the driver; a deployment reads Kafka/binlog and no
      // pipeline step below touches the driver with row data.
      val rows = Tables.load(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
        .orderBy($"ts", $"event_id")
        .as[EventRow].collect()

      val srcC = MemoryStream[EventRow]
      val srcP = MemoryStream[EventRow]
      val clicks = srcC.toDF().select($"event_id".as("click_id"),
        $"user_id".as("c_user_id"), $"ts".as("click_ts"))
      val purchases = srcP.toDF().select($"event_id".as("conv_id"),
        $"user_id".as("p_user_id"), $"ts".as("conv_ts"), $"value".as("conv_value"))
      val joined = StreamingPipeline.attributionJoin(clicks, purchases)
        .select($"click_id", $"conv_id", $"c_user_id".as("user_id"),
          unix_timestamp($"click_ts").as("click_s"),
          unix_timestamp($"conv_ts").as("conv_s"),
          $"conv_value")

      val qname = "q71_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      // Stream-stream join state costs scale with micro-batch count x
      // shuffle partitions x the join's 4 state stores — for this bounded
      // test harness, run the streaming query at a small partition count
      // (state is tiny here) and restore the session conf after. A real
      // deployment sizes this to the key cardinality, not the default.
      // The conf set AND the query start both live inside the try: a throw
      // from start() must not leave the shared session at 8 partitions.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = joined.writeStream
          .format("memory").queryName(qname).outputMode("append").start()
        try {
          // FOUR micro-batches in global event-time order at any scale, so
          // both join state and watermark eviction actually cycle (one giant
          // batch would never evict anything mid-run; per-fixed-size chunks
          // would make the batch count — and the harness cost — grow with SF)
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { chunk =>
            val cs = chunk.filter(_.event_type == "click")
            val ps = chunk.filter(_.event_type == "purchase")
            if (cs.nonEmpty) srcC.addData(cs.toIndexedSeq)
            if (ps.nonEmpty) srcP.addData(ps.toIndexedSeq)
            query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // Detach the (small) result from the memory sink and DROP the sink
      // table — each invocation would otherwise pin a full copy of the
      // join output in the driver for the session's lifetime.
      val sunk = s.table(qname).orderBy($"click_id", $"conv_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q101: LEFT-OUTER watermarked stream-stream interval join —
    //      q71's attribution with the un-attributed half kept: a click
    //      with no purchase within 30 min emits with a NULL conversion
    //      side, but only once the watermark proves no match can still
    //      arrive. Append mode therefore needs the q84 sentinel trick: a
    //      far-future event on BOTH streams (the watermark is the min
    //      across inputs) pushes the watermark past every real click's
    //      match horizon so each unmatched click actually resolves; the
    //      sentinel itself stays inside its own watermark and never
    //      emits (and is filtered by id regardless). The oracle is the
    //      identical batch LEFT JOIN.
    "q101_stream_outer_join" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext

      // Driver feed synthesis, same note as q33/q71.
      val rows = Tables.load(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
        .orderBy($"ts", $"event_id")
        .as[EventRow].collect()
      val sentinelTs = new java.sql.Timestamp(
        rows.last.ts.getTime + 10L * 3600 * 1000)

      val srcC = MemoryStream[EventRow]
      val srcP = MemoryStream[EventRow]
      val clicks = srcC.toDF().select($"event_id".as("click_id"),
        $"user_id".as("c_user_id"), $"ts".as("click_ts"))
      val purchases = srcP.toDF().select($"event_id".as("conv_id"),
        $"user_id".as("p_user_id"), $"ts".as("conv_ts"), $"value".as("conv_value"))
      val joined = StreamingPipeline.attributionJoinOuter(clicks, purchases)
        .select($"click_id", $"conv_id", $"c_user_id".as("user_id"),
          unix_timestamp($"click_ts").as("click_s"),
          unix_timestamp($"conv_ts").as("conv_s"),
          $"conv_value")

      val qname = "q101_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = joined.writeStream
          .format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { chunk =>
            val cs = chunk.filter(_.event_type == "click")
            val ps = chunk.filter(_.event_type == "purchase")
            if (cs.nonEmpty) srcC.addData(cs.toIndexedSeq)
            if (ps.nonEmpty) srcP.addData(ps.toIndexedSeq)
            query.processAllAvailable()
          }
          srcC.addData(EventRow(-1L, -1L, "click", sentinelTs, 0.0))
          srcP.addData(EventRow(-2L, -1L, "purchase", sentinelTs, 0.0))
          query.processAllAvailable()
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname).filter($"click_id" >= 0)
        .orderBy($"click_id", $"conv_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q165: FULL-outer watermarked stream-stream interval join —
    //      the last join mode after q71 (inner) and q101 (left-outer):
    //      un-attributed clicks AND orphan conversions both emit with a
    //      NULL other side once the watermark proves their match window
    //      closed, exercising state eviction on BOTH inputs. q101's
    //      sentinel discipline: one far-future event on each stream (the
    //      watermark is the min across inputs) pushes the watermark past
    //      every real row's horizon so both unmatched halves resolve; the
    //      sentinels match each other and are filtered by id. The oracle
    //      is the identical batch FULL JOIN.
    "q165_stream_full_outer" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext

      // Driver feed synthesis, same note as q33/q71.
      val rows = Tables.load(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
        .orderBy($"ts", $"event_id")
        .as[EventRow].collect()
      val sentinelTs = new java.sql.Timestamp(
        rows.last.ts.getTime + 10L * 3600 * 1000)

      val srcC = MemoryStream[EventRow]
      val srcP = MemoryStream[EventRow]
      val clicks = srcC.toDF().select($"event_id".as("click_id"),
        $"user_id".as("c_user_id"), $"ts".as("click_ts"))
      val purchases = srcP.toDF().select($"event_id".as("conv_id"),
        $"user_id".as("p_user_id"), $"ts".as("conv_ts"), $"value".as("conv_value"))
      val joined = StreamingPipeline.attributionJoinFull(clicks, purchases)
        .select($"click_id", $"conv_id", $"c_user_id".as("user_id"),
          unix_timestamp($"click_ts").as("click_s"),
          unix_timestamp($"conv_ts").as("conv_s"),
          $"conv_value")

      val qname = "q165_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = joined.writeStream
          .format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { chunk =>
            val cs = chunk.filter(_.event_type == "click")
            val ps = chunk.filter(_.event_type == "purchase")
            if (cs.nonEmpty) srcC.addData(cs.toIndexedSeq)
            if (ps.nonEmpty) srcP.addData(ps.toIndexedSeq)
            query.processAllAvailable()
          }
          srcC.addData(EventRow(-1L, -1L, "click", sentinelTs, 0.0))
          srcP.addData(EventRow(-2L, -1L, "purchase", sentinelTs, 0.0))
          query.processAllAvailable()
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // both sentinel halves are filtered: the matched (-1,-2) pair, and
      // (defensively) any unmatched sentinel emission
      val sunk = s.table(qname)
        .filter(coalesce($"click_id", lit(0L)) >= 0 &&
          coalesce($"conv_id", lit(0L)) >= 0)
        .orderBy($"click_id", $"conv_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q84: watermarked tumbling-window aggregation as a REAL
    //      streaming run vs the batch oracle (windowedCounts is q22's
    //      streaming form; this gate proves the streaming plan computes
    //      the same relation, the way q33 gates the CDC applier and q71
    //      the interval join). Append mode emits a window only once the
    //      watermark closes it, so after the in-order feed a far-future
    //      sentinel event pushes the watermark past every real window;
    //      the sentinel's own rows are filtered from the result.
    "q84_stream_window" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = Tables.load(s, dir, "events")
        .select($"ts", $"event_type", $"value")
        .orderBy($"ts")
        .as[WindowEventRow].collect()
      val sentinel = WindowEventRow(
        new java.sql.Timestamp(rows.last.ts.getTime + 10L * 3600 * 1000),
        "zzz_sentinel", 0.0)
      val src = MemoryStream[WindowEventRow]
      val qname = "q84_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = StreamingPipeline.windowedCounts(src.toDF())
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
          src.addData(sentinel)
          query.processAllAvailable()
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname)
        .filter($"event_type" =!= "zzz_sentinel")
        .select(unix_timestamp($"ws").as("ws"), $"event_type", $"n", $"total_value")
        .orderBy($"ws", $"event_type")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q162: streaming SLIDING windows — q84 gates tumbling; this
    //      gates the overlapping form (2-hour windows sliding by 1 hour:
    //      every event contributes to exactly TWO windows — the rolling-
    //      dashboard shape). The oracle replays the double assignment
    //      declaratively (each event exploded to its two window starts),
    //      so a missed overlap, wrong window edge, or premature emission
    //      breaks the hash.
    "q162_stream_sliding" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = Tables.load(s, dir, "events")
        .select($"ts", $"event_type", $"value")
        .orderBy($"ts")
        .as[WindowEventRow].collect()
      val sentinel = WindowEventRow(
        new java.sql.Timestamp(rows.last.ts.getTime + 10L * 3600 * 1000),
        "zzz_sentinel", 0.0)
      val src = MemoryStream[WindowEventRow]
      val qname = "q162_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = StreamingPipeline.slidingWindowedCounts(src.toDF())
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
          src.addData(sentinel)
          query.processAllAvailable()
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname)
        .filter($"event_type" =!= "zzz_sentinel")
        .select(unix_timestamp($"ws").as("ws"), $"event_type", $"n", $"total_value")
        .orderBy($"ws", $"event_type")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q85: streaming exact dedup vs the batch oracle — q40's
    //      recrawl scenario (every doc re-arrives at doc_id+10000) fed
    //      in doc_id order through the stateful first-seen gate. With an
    //      ordered feed, first-seen IS min(doc_id), so the emitted
    //      survivors must equal the batch dedup exactly — across chunk
    //      boundaries (keyed state) and within a chunk (the operator's
    //      lowest-id-wins batch rule).
    "q85_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val rows = docs
        .union(docs.select(($"doc_id" + 10000).as("doc_id"), $"text"))
        .orderBy($"doc_id")
        .as[(Long, String)].collect()
      val src = MemoryStream[(Long, String)]
      val qname = "q85_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = StreamingPipeline.streamingDedup(
            src.toDF().toDF("doc_id", "text"))
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname)
        .select($"keep_id", substring($"content_sha", 1, 16).as("sha_prefix"))
        .orderBy($"keep_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q237: streaming MinHash-LSH near-dup ADMISSION — the q42
    //      operator the way a crawl pipeline actually runs it: each doc
    //      admitted at ingest iff no earlier-SEEN doc is a verified
    //      near-duplicate (exact Jaccard >= t; LSH bands are candidate
    //      generation only, the shared q42 geometry). State lives in
    //      applier targets (band first-owners via -doc_id positions, seen
    //      shingle sets, admitted set), so exactly-once is idempotence-
    //      by-position, not executor memory. Feed = documents plus a
    //      recrawl of every %5 doc at +10000 (exact dups, all rejected),
    //      doc_id-ordered in 4 chunks — rejections must hold both within
    //      a chunk and across the store boundary. Oracle: the order-free
    //      seen-based rule — rejected iff ANY lower-id doc has J >= t —
    //      over exact shingle sets (q41/q42's decision procedure).
    "q237_stream_neardup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val rows = docs
        .union(docs.filter($"doc_id" % 5 === 0)
          .select(($"doc_id" + 10000).as("doc_id"), $"text"))
        .orderBy($"doc_id")
        .as[(Long, String)].collect()
      val base = java.nio.file.Files.createTempDirectory("graft_snd").toString
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val src = MemoryStream[(Long, String)]
        val query = StreamNearDup.start(
          src.toDF().toDF("doc_id", "text"), base + "/state", base + "/ckpt")
        try {
          val chunkSize = math.max(100, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      StreamNearDup.admitted(s, base + "/state")
    }),

    // ---- q86: streaming budget admission vs the batch oracle. The
    //      streaming form admits in ARRIVAL order (a stream has no global
    //      content-hash sort — q65's ohash ordering is the batch
    //      operator's job), so the feed is doc_id-ordered and the oracle
    //      is the same budget-window rule over doc_id order. Gates the
    //      keyed running-token state across batches and the
    //      crossing-doc-kept boundary rule.
    "q86_stream_admission" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      val rows = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source",
          graft.ext.Corpus.wsTokenCount($"text").as("n_tokens"))
        .orderBy($"doc_id")
        .as[(Long, String, Long)].collect()
      val src = MemoryStream[(Long, String, Long)]
      val qname = "q86_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = StreamingPipeline.streamingBudgetAdmit(
            src.toDF().toDF("doc_id", "source", "n_tokens"),
            graft.ext.Corpus.mixBudgetFor)
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(100, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname).orderBy($"doc_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q88: streaming SESSION windows vs the batch oracle (q24's
    //      streaming form). Sessions are the one window type that can MERGE
    //      as events arrive, so append mode emits a session only once the
    //      watermark proves no bridging event can still extend it; the
    //      far-future sentinel (distinct user, filtered from the result)
    //      pushes the watermark past every real session's close. With the
    //      in-order feed nothing is late, so the emitted sessions must
    //      equal the batch gaps-and-islands oracle exactly — across chunk
    //      boundaries (keyed session state, cross-batch merges) and within
    //      them.
    "q88_stream_sessions" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      // Driver feed synthesis, same note as q71: MemoryStream data must
      // originate on the driver; a deployment reads Kafka and nothing
      // below touches the driver with row data.
      val rows = Tables.load(s, dir, "events")
        .select($"ts", $"user_id", $"value")
        .orderBy($"ts", $"user_id")
        .as[(java.sql.Timestamp, Long, Double)].collect()
      val sentinel = (new java.sql.Timestamp(rows.last._1.getTime + 10L * 3600 * 1000),
        -1L, 0.0)
      val src = MemoryStream[(java.sql.Timestamp, Long, Double)]
      val qname = "q88_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query = StreamingPipeline.sessionizedCounts(
            src.toDF().toDF("ts", "user_id", "value"))
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        try {
          val chunkSize = math.max(1000, (rows.length + 3) / 4)
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
          src.addData(sentinel)
          query.processAllAvailable()
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname)
        .filter($"user_id" >= 0)
        .select($"user_id", unix_timestamp($"ss").as("ss"),
          unix_timestamp($"se").as("se"), $"n", $"total_value")
        .orderBy($"user_id", $"ss")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    }),

    // ---- q87: BOUNDED streaming near-dup admission vs the batch oracle.
    //      The recrawl scenario (every doc re-arrives at doc_id+10000) is
    //      fed in doc_id order with a synthetic 1-second-per-rank event
    //      time; the horizon is 1.5 chunks, so registry entries from more
    //      than ~1.5 batches back have genuinely EXPIRED when later docs
    //      (including the recrawl copies of early docs) are judged —
    //      expired originals no longer veto their copies. The oracle
    //      replays the exact watermark arithmetic in SQL: a prior doc j
    //      vetoes doc i iff hamming<=3 AND j's rank is within i's batch
    //      watermark cut (rank >= k*C - 1 - delay). This gates BOTH the
    //      admission verdicts and the eviction semantics — a NoTimeout
    //      registry would fail it (copies of expired docs would read
    //      admitted=0 where the oracle says 1).
    "q87_stream_admit_bounded" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: SQLContext = s.sqlContext
      // Driver feed synthesis, same note as q71: MemoryStream data must
      // originate on the driver; the admission operator itself never does.
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val both = docs
        .union(docs.select(($"doc_id" + 10000).as("doc_id"), $"text"))
        .orderBy($"doc_id")
        .as[(Long, String)].collect()
      val n = both.length
      val chunkSize = math.max(100, (n + 3) / 4)
      val delaySec = 3 * chunkSize / 2 // horizon = 1.5 chunks (see oracle)
      val baseMs = 1735689600000L // 2025-01-01T00:00:00Z; cancels out of the rank math
      val rows = both.zipWithIndex.map { case ((id, text), r) =>
        (id, new java.sql.Timestamp(baseMs + r * 1000L), text)
      }
      val src = MemoryStream[(Long, java.sql.Timestamp, String)]
      val qname = "q87_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        // chained stateful stages; see streamingNearDupAdmitBounded's
        // scaladoc for why the global-watermark pattern check is a false
        // positive here — scoped to this start(), prior value restored
        val query = GraftConf.withChainedStatefulStart(s) {
          StreamingPipeline.streamingNearDupAdmitBounded(
            src.toDF().toDF("doc_id", "ts", "text"), s"$delaySec seconds")
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        }
        try {
          rows.grouped(chunkSize).foreach { c =>
            src.addData(c.toIndexedSeq); query.processAllAvailable()
          }
        } finally query.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val sunk = s.table(qname)
        .select($"doc_id", $"admitted".cast("int").as("admitted"))
        .orderBy($"doc_id")
      val out = s.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      s.catalog.dropTempView(qname)
      out
    })
  )

  val oracles: Map[String, String] = Map(
    // q212's oracle verbatim: same quantization, same ordered recurrence
    // (carried across chunks by the keyed state), same shared report.
    "q215_stream_cusum" -> graft.operators.Analytics.oracles("q212_cusum"),

    // q188's last-touch arm replayed: same pair frame, same
    // (ctsec desc, cid desc) rank, SUMD credit.
    "q210_stream_attribution" -> s"""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
          CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec
        FROM events),
      pairs AS (
        SELECT p.event_id AS pid, c.event_id AS cid, c.tsec AS ctsec
        FROM ev p JOIN ev c ON p.user_id = c.user_id
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.tsec <= p.tsec
          AND c.tsec > p.tsec - ${graft.operators.Analytics.AttrWindow}),
      last_ AS (
        SELECT cid FROM (
          SELECT cid,
            ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ctsec DESC, cid DESC)
              AS rn
          FROM pairs) x WHERE rn = 1)
      SELECT cid, ${graft.util.Sumd.SUMD("1.0")} AS credit,
        CAST(count(*) AS BIGINT) AS n_purchases
      FROM last_ GROUP BY cid ORDER BY cid""",

    // q192's oracle verbatim: the ordered feed + cross-chunk state make
    // streaming adjacency equal batch lead adjacency by construction, and
    // the counting commutes.
    "q194_stream_transitions" ->
      graft.operators.Analytics.oracles("q192_event_transitions"),
    // q177's oracle verbatim: the cell counters are commuting sums, so the
    // streaming accumulation equals the batch cells by construction and
    // one report definition (chi2FromCells) serves both modes.
    "q182_stream_chi2_drift" -> graft.operators.Analytics.oracles("q177_chi2_drift"),
    // q148's oracle verbatim: the streaming sketch must equal the batch
    // sketch bit-for-bit (KMV is a pure set function of the input).
    "q149_stream_kmv" -> graft.operators.Advanced.oracles("q148_kmv_sketch"),
    // q141's oracle verbatim: with the (doc_id, pi)-ordered feed, streaming
    // first-arrival IS the batch first-occurrence rule.
    "q154_stream_para_dedup" -> graft.ext.Corpus.oracles("q141_para_dedup"),
    // Rebuilds the identical registers declaratively: same portable hash,
    // same trailing-zero rho arms, same exact 2^-rho decimal literals,
    // same register-ordered fold, same alpha arithmetic.
    "q128_stream_hll" -> {
      import graft.ext.TextOps
      val rhoCase = (s"CASE WHEN h2 = 0 THEN $HllMaxRho" +:
        (0 until HllMaxRho - 1).map(k =>
          s"WHEN h2 % ${1L << (k + 1)} = ${1L << k} THEN ${k + 1}"))
        .mkString(" ") + s" ELSE $HllMaxRho END"
      // ::DOUBLE everywhere: a bare DuckDB decimal literal is DECIMAL-typed
      // and would leave IEEE arithmetic
      val invCase = ("CASE mr " +
        (1 to HllMaxRho).map(k => s"WHEN $k THEN ${1.0 / (1L << k)}::DOUBLE").mkString(" ") +
        " ELSE 0.0::DOUBLE END")
      s"""
      WITH ev AS (
        SELECT user_id, event_type FROM events
        WHERE event_type IN ('click', 'purchase')),
      hashed AS (
        SELECT event_type,
          ${TextOps.polyHashSql("CAST(user_id AS VARCHAR)", 31)} AS h
        FROM ev),
      hr AS (SELECT event_type, CAST(h % $HllM AS INT) AS reg, h // $HllM AS h2
             FROM hashed),
      rr AS (SELECT event_type, reg, $rhoCase AS rho FROM hr),
      regs AS (SELECT event_type, reg, max(rho) AS mr FROM rr GROUP BY 1, 2),
      folded AS (
        SELECT event_type, CAST($HllM - count(*) AS BIGINT) AS zero_regs,
          list_reduce(list_prepend(0.0::DOUBLE, list($invCase ORDER BY reg)),
            (acc, x) -> acc + x)
            + CAST($HllM - count(*) AS DOUBLE) AS total
        FROM regs GROUP BY 1),
      exact AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM ev GROUP BY 1)
      SELECT e.event_type, e.n_exact, f.zero_regs,
        0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE)
          * 65536.0::DOUBLE / f.total AS est
      FROM exact e JOIN folded f ON e.event_type = f.event_type
      ORDER BY e.event_type"""
    },

    // Rebuilds the identical d x w grid declaratively (one arm per row-
    // hash base), probes the same cells, takes the same min — CMS is
    // order-independent, so the streamed sketch must equal this exactly.
    "q127_stream_cms" -> {
      import graft.ext.TextOps
      val counterArms = CmsBases.zipWithIndex.map { case (b, r) =>
        s"""SELECT $r AS r, (${TextOps.polyHashSql("term", b)}) % $CmsW AS c,
              CAST(count(*) AS BIGINT) AS n
            FROM toks GROUP BY 2"""
      }.mkString("\n            UNION ALL\n            ")
      val probeArms = CmsBases.zipWithIndex.map { case (b, r) =>
        s"""SELECT p.term, k.n FROM probes p JOIN counters k
              ON k.r = $r AND k.c = (${TextOps.polyHashSql("p.term", b)}) % $CmsW"""
      }.mkString("\n            UNION ALL\n            ")
      s"""
      WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
      counters AS (
            $counterArms),
      probes AS (
        SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents WHERE doc_id < $CmsProbeDocs),
      exact AS (
        SELECT t.term, CAST(count(*) AS BIGINT) AS cnt
        FROM toks t JOIN probes p ON t.term = p.term GROUP BY 1),
      est AS (
        SELECT term, CAST(min(n) AS BIGINT) AS est FROM (
            $probeArms) x
        GROUP BY term)
      SELECT e.term, e.cnt, s.est
      FROM exact e JOIN est s ON e.term = s.term
      ORDER BY e.term"""
    },
    "q71_stream_join" -> """
      SELECT c.event_id AS click_id, p.event_id AS conv_id, c.user_id,
        CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS click_s,
        CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS conv_s,
        p.value AS conv_value
      FROM events c JOIN events p ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      ORDER BY click_id, conv_id""",

    "q101_stream_outer_join" -> """
      SELECT c.event_id AS click_id, p.event_id AS conv_id, c.user_id,
        CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS click_s,
        CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS conv_s,
        p.value AS conv_value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      ORDER BY click_id, conv_id""",

    "q165_stream_full_outer" -> """
      SELECT c.event_id AS click_id, p.event_id AS conv_id, c.user_id,
        CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS click_s,
        CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS conv_s,
        p.value AS conv_value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      ORDER BY click_id, conv_id""",

    "q84_stream_window" -> s"""
      SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
        event_type, COUNT(*) AS n,
        ${graft.util.Sumd.SUMD("value")} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY ws, event_type""",

    // each event exploded to its TWO sliding-window starts (the hour it
    // falls in and the hour before — both always cover it at size 2h)
    "q162_stream_sliding" -> s"""
      SELECT CAST(FLOOR(epoch(wstart)) AS BIGINT) AS ws,
        event_type, COUNT(*) AS n,
        ${graft.util.Sumd.SUMD("value")} AS total_value
      FROM (
        SELECT event_type, value,
          unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                  date_trunc('hour', ts)]) AS wstart
        FROM events)
      GROUP BY 1, 2
      ORDER BY ws, event_type""",

    "q85_stream_dedup" -> """
      SELECT MIN(doc_id) AS keep_id,
        SUBSTRING(sha256(text), 1, 16) AS sha_prefix
      FROM (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 10000, text FROM documents)
      GROUP BY sha256(text)
      ORDER BY keep_id""",

    // q237: seen-based near-dup admission — rejected iff ANY lower-id doc
    // in the fed relation has exact shingle Jaccard >= t (q41/q42's
    // decision procedure over the same shinglesSql definition).
    "q237_stream_neardup" -> s"""
      WITH feed AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0),
      sh AS (
        SELECT doc_id,
          ${graft.ext.TextOps.shinglesSql("text", graft.ext.NearDup.ShingleK)} AS sh
        FROM feed),
      rej AS (
        SELECT DISTINCT b.doc_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= ${graft.ext.NearDup.JaccardT})
      SELECT doc_id FROM feed
      WHERE doc_id NOT IN (SELECT doc_id FROM rej)
      ORDER BY doc_id""",

    "q86_stream_admission" -> s"""
      SELECT doc_id, source, n_tokens, start FROM (
        SELECT doc_id, source, n_tokens, budget,
          CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            - n_tokens AS start
        FROM (
          SELECT doc_id, source,
            ${graft.ext.Corpus.wsTokenCountSql("text")} AS n_tokens,
            ${graft.ext.Corpus.mixBudgetSql} AS budget
          FROM documents))
      WHERE start < budget
      ORDER BY doc_id""",

    // q24's gaps-and-islands oracle verbatim: the streaming session plan
    // must compute the same relation the batch sessionizer does.
    "q88_stream_sessions" -> graft.operators.Advanced.oracles("q24_session_window"),

    // Watermark arithmetic mirrored from the q87 feed: rank r = arrival
    // order (doc_id order), batch k = r // C with C = GREATEST(100,(n+3)//4)
    // (the feed's chunk size), and the watermark when batch k is processed
    // is maxEventTime(batches < k) - delay = (k*C - 1 - (3*C)//2) seconds
    // past base — so a prior doc's registry entry is visible iff its rank
    // clears that cut. Same-batch earlier docs always clear it (r >= k*C).
    "q87_stream_admit_bounded" -> s"""
      WITH sig AS (${graft.ext.NearDup.simhashSigSql(
        "(SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 10000, text FROM documents)")}),
      ranked AS (
        SELECT doc_id, simhash,
          row_number() OVER (ORDER BY doc_id) - 1 AS r,
          GREATEST(100, (COUNT(*) OVER () + 3) // 4) AS c
        FROM sig)
      SELECT a.doc_id,
        CASE WHEN EXISTS (
          SELECT 1 FROM ranked b
          WHERE b.r < a.r
            AND bit_count(xor(a.simhash, b.simhash)) <= ${graft.ext.NearDup.HammingT}
            AND b.r >= (a.r // a.c) * a.c - 1 - (3 * a.c) // 2
        ) THEN 0 ELSE 1 END AS admitted
      FROM ranked a
      ORDER BY a.doc_id"""
  )
}
