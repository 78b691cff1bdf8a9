package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-analytics operators over the `events` stream table — the funnel /
  * cohort / rolling-window / anomaly family every analytics engine built on
  * replicated operational data ends up serving (the reference delegates its
  * whole query surface to Spark SQL, SURVEY §0; these lock the idioms in as
  * first-class gated operators).
  *
  * Cross-engine determinism notes, shared by all four:
  *  - event times are compared as native timestamps and OUTPUT as unix
  *    seconds (`unix_timestamp` ≡ DuckDB `FLOOR(epoch(..))`);
  *  - double sums follow the engine-wide SUMD decimal convention;
  *  - variance uses the sum-of-squares identity with every IEEE op ordered
  *    identically in the oracle — no libm beyond correctly-rounded sqrt.
  */
object Analytics {
  private def SUMD(e: String): String = graft.util.Sumd.SUMD(e)
  private def sumd(c: org.apache.spark.sql.Column) = graft.util.Sumd.sumd(c)

  /** q77's trailing window length in seconds (inclusive frame: the current
    * event plus everything up to 3599 s before it). */
  val RollSecs = 3599L

  /** q78's flag threshold: |value - mean| > ZThresh * stddev. */
  val ZThresh = 2.0

  /** q155's robust cut: 3 sigma-equivalents under the MAD→sigma
    * consistency constant for the normal distribution (3 × 1.4826),
    * pre-multiplied into ONE literal so both engines do a single
    * IEEE multiply against the MAD. */
  val RobustCut = 4.4478

  /** Columns profiled by q132 — one shared definition for the Spark plan
    * and the oracle's UNION arms. */
  val StatsCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** q188 attribution geometry: a purchase credits the same user's clicks
    * in the trailing [[AttrWindow]] seconds (inclusive of the purchase
    * instant). Two standard models share one pair frame: last-touch (the
    * latest qualifying click takes credit 1.0; ties to the larger
    * event_id) and linear (each qualifying click takes 1/n). */
  val AttrWindow = 604800L

  /** q189 winsorization cut points: clamp at the p05/p95 quantiles (exact
    * binary-fraction-free probabilities are NOT needed — quantile_cont and
    * the distributed engine are bit-equal at any p, proven r3). */
  val WinsorLo = 0.05
  val WinsorHi = 0.95

  /** q195 Benford expectation: p(d) = log10(1 + 1/d), computed ONCE
    * driver-side and shipped as exact INTEGER parts-per-billion (a raw
    * 17-digit double literal parsed to a different last-ulp double in
    * DuckDB than in the JVM — integers sidestep the literal-parse path
    * entirely; both engines then derive p by the same single division). */
  val BenfordPpb: Seq[Long] =
    (1 to 9).map(d => math.round(math.log10(1.0 + 1.0 / d) * 1e9))

  /** q198 conversion bar: every synthetic user purchases at least once,
    * so "any purchase" is degenerate (pooled p = 1 and the z denominator
    * vanishes) — a user converts at >= this many purchases instead. */
  val ConvPurchases = 14L

  /** q197 price rescale: correlation is scale-invariant, and dividing
    * the 2-decimal price by this exact power of ten (a) keeps every
    * per-row product within 6 DECIMAL digits — so the SUMD casts never
    * round at all (a /1e5 scale makes 7-decimal values whose 6-decimal
    * tie Spark's string-based cast and DuckDB's binary-value cast break
    * DIFFERENTLY) — and (b) keeps every decimal sum's int64 image under
    * 2^53, where both engines' decimal->double conversion is the same
    * single correctly-rounded step (the raw ~1e14 y*y sums were not). */
  val CorrScale = 1000.0

  /** q196 bot-signal policy: machine-like = low inter-event-gap
    * coefficient of variation OR high event count. Declared constants —
    * the gate's value is the exact gap-statistics algebra, the flag is
    * the policy a deployment tunes. */
  val BotCvMax = 0.9
  val BotMinEvents = 75L

  /** q200 resampling grid step (seconds): hourly points over the stream's
    * global [min, max] span. */
  val GridStep = 3600L

  /** q211 discrete-percentile probes — exact binary fractions, so p·n and
    * p·100 never round. */
  val DiscPs = Seq(0.25, 0.5, 0.75)

  /** q212 CUSUM parameters in exact integer MICRO-units (values quantize
    * to floor(x·1e6 + 0.5) — floor is identical in both engines, unlike
    * round(), which is HALF_UP in Spark and half-even in DuckDB; after
    * quantization every accumulation is BIGINT-exact, which is what lets
    * an order-DEPENDENT running sum cross engines at all). Slack k and
    * alarm threshold h follow the usual "half-sigma / several-sigma"
    * shape but are declared constants here. */
  val CusumSlackMicro = 10000000L // k = 10
  val CusumHMicro = 500000000L    // h = 500

  /** q213 seasonality: the hourly series repeats daily, so the seasonal
    * lag is 24 buckets. */
  val SeasonLag = 24

  /** q199 regression time unit: seconds-since-corpus-start over 3600 —
    * keeps x (and so the decimal-cast x*x / x*y products) inside the
    * SUMD DECIMAL(18,6) per-value range. */
  val OlsHour = 3600.0

  /** q191: heavy keys reported per profiled join column. */
  val SkewTopN = 10
  /** The join columns q191 profiles — the keys the q108 salting and AQE
    * skew-join decisions actually ride on. One definition for the Spark
    * arms and the oracle's UNION arms. */
  val SkewCols: Seq[(String, String)] =
    Seq("lineitem" -> "l_orderkey", "lineitem" -> "l_suppkey",
      "orders" -> "o_custkey")

  /** q167's histogram surface: the lineitem measures profiled, and the
    * k=8 equi-height bucket bounds (quantiles i/8, i=0..8 — every q is an
    * exact binary fraction). One definition feeds the Spark plan AND the
    * oracle's quantile_cont list, so they cannot desynchronize. */
  val HistCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val HistBounds: Seq[(String, Double)] = (0 to 8).map(i => (s"b$i", i / 8.0))

  /** q167's single-pass unpivot: one stack() turns all profiled measures
    * into (col_name, v) long form off ONE table scan (PlanSpec-locked —
    * the quantile engine consumes a localCheckpoint of this frame, so this
    * is the only place a per-column re-scan could creep in). */
  private[graft] def histUnpivot(li: DataFrame): DataFrame =
    li.select(expr(
      s"stack(${HistCols.size}, " +
        HistCols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ") +
        ") AS (col_name, v)"))

  /** q177's event projection: (event_type, tsec, bkt) with the 10
    * fixed-width value buckets — ONE definition for the batch scan and the
    * q182 streaming feed, so the cell space cannot drift. */
  def chi2Projected(events: DataFrame): DataFrame = events
    .select(col("event_type"), unix_timestamp(col("ts")).as("tsec"),
      least(greatest(floor(col("value") / 10.0), lit(0.0)), lit(9.0))
        .cast("long").as("bkt"))

  /** q212's micro-unit deviation stream: (event_type, tsec, event_id,
    * dev_q) with the per-type mean quantized once — ONE definition for
    * the batch windows (q212) and the q215 streaming feed, so the two
    * modes can never disagree on the quantization. */
  def cusumDevs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"event_type", unix_timestamp($"ts").as("tsec"), $"event_id", $"value")
    val stats = ev.groupBy($"event_type")
      .agg(sumd($"value").as("sv"), count(lit(1)).as("n"))
      .select($"event_type",
        floor(($"sv" / $"n".cast("double")) * 1e6 + 0.5).cast("long").as("mean_q"))
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("dev_q",
        floor($"value" * 1e6 + 0.5).cast("long") - $"mean_q" - CusumSlackMicro)
      .select($"event_type", $"tsec", $"event_id", $"dev_q")
  }

  /** (event_type, tsec, s) statistic rows -> the q212 alarm report.
    * Shared by the batch windows and the q215 streaming run (the
    * statistic series are equal row-for-row, so one report — and one
    * oracle — gates both modes). */
  def cusumReport(runs: DataFrame): DataFrame = runs
    .groupBy(col("event_type"))
    .agg(count(lit(1)).as("n"),
      sum(when(col("s") > CusumHMicro, 1L).otherwise(0L)).as("n_alarms"),
      max(col("s")).as("s_max"),
      min(when(col("s") > CusumHMicro, col("tsec"))).as("first_alarm"))
    .repartition(1).sortWithinPartitions(col("event_type"))

  /** (from_type, to_type) transition rows -> the q192 report (counts +
    * row fractions). Shared by q192 (batch lead-window adjacency) and
    * q194 (streaming stateful adjacency): the counting is commutative,
    * so one report definition — and one oracle — gates both modes. */
  def transitionReport(trans: DataFrame): DataFrame = {
    val c = trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    c.crossJoin(broadcast(c.agg(sum(col("cnt")).cast("long").as("total"))))
      .select(col("from_type"), col("to_type"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("frac"))
      .repartition(1).sortWithinPartitions(col("from_type"), col("to_type"))
  }

  /** (event_type, bkt, b, o) cells -> the per-type chi-square drift
    * report. Shared by q177 (batch) and q182 (streaming): the b/o
    * counters are commuting sums, so the cell frame is identical however
    * it was accumulated — one report definition gates both modes. */
  def chi2FromCells(cells: DataFrame): DataFrame = {
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("b")).as("nb"), sum(col("o")).as("no"))
    cells.join(totals, "event_type")
      .withColumn("e", col("no").cast("double") *
        (col("b").cast("double") / col("nb").cast("double")))
      .groupBy(col("event_type"))
      .agg(max(col("nb")).as("n_base"), max(col("no")).as("n_cur"),
        graft.util.Sumd.sumd(
          when(col("b") > 0,
            (col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"))
            .otherwise(lit(0.0))).as("chi2"),
        sum(when(col("b") === 0, col("o")).otherwise(0L)).as("n_novel"))
      .repartition(1).sortWithinPartitions(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q167: equi-height per-column histograms — the CBO-grade stats
    //      companion to q132's count/nulls/NDV (a cost model needs value
    //      DISTRIBUTIONS, not just cardinalities, to estimate selectivity).
    //      k=8 equi-height bucket bounds for every profiled lineitem
    //      measure. Scale shape: ONE stack() unpivots all measures to
    //      (col_name, v) long form in a single table pass — no per-column
    //      re-scan (PlanSpec-locked: exactly one lineitem scan) — then the
    //      distributed exactQuantiles engine (q34/q81/q155's: range
    //      partitioning + per-partition rank offsets, bit-identical to
    //      quantile_cont, never a per-group sort through one task)
    //      computes all nine bounds per column in one grouped pass. The
    //      non-null count rides along (each bucket holds ~n/8 rows by
    //      construction — the property that makes the histogram
    //      equi-height).
    "q167_histograms" -> ((s, dir) => {
      Advanced.exactQuantiles(histUnpivot(Tables.load(s, dir, "lineitem")),
          "col_name", "v", HistBounds, countAs = Some("n"))
        .repartition(1).sortWithinPartitions(col("col_name"))
    }),

    // ---- q177: chi-square distribution drift — the numeric complement
    //      of q124's token drift: does the value distribution of the
    //      SECOND half of the event stream differ from the first
    //      (feature drift between a training snapshot and fresh data)?
    //      Chi-square instead of PSI deliberately: PSI's log rides libm
    //      whose last ulp differs across engines, while (o-e)²/e is
    //      mul/div-only — every step correctly-rounded IEEE, the summed
    //      terms SUMD'd (order-independent). The time split is the
    //      integer midpoint of the epoch range (driver arithmetic both
    //      engines replay); values bucket into 10 fixed-width bins;
    //      buckets unseen in the baseline can't contribute a finite term
    //      (e = 0) and are reported as n_novel instead. Scale: ONE table
    //      pass into a (type, bucket, period) partial+final agg (30-cell
    //      frames per type), then per-type arithmetic on the tiny pivot.
    "q177_chi2_drift" -> ((s, dir) => {
      val ev = chi2Projected(Tables.load(s, dir, "events"))
      // integer floor-division midpoint: both engines' `div`/`//` floor,
      // while double-divide-then-cast would trunc in Spark and round in
      // DuckDB on odd sums
      val mid = ev.agg(expr("(min(tsec) + max(tsec)) div 2").as("mid"))
      val cells = ev.crossJoin(broadcast(mid))
        .groupBy(col("event_type"), col("bkt"))
        .agg(sum(when(col("tsec") < col("mid"), 1L).otherwise(0L)).as("b"),
          sum(when(col("tsec") >= col("mid"), 1L).otherwise(0L)).as("o"))
      chi2FromCells(cells)
    }),

    // ---- q200: time-series resampling to a fixed grid with linear
    //      interpolation — the irregular-to-regular step every
    //      monitoring/feature pipeline needs before windowed models
    //      (q39's gap fill carries values; this interpolates between
    //      them). The hourly grid spans the stream's global range; per
    //      (type, grid point) the surrounding events come from ONE
    //      merged union of events + grid points with two
    //      last/first-ignore-nulls windows per type (the standard as-of
    //      sandwich — no per-point probe join), and v = v0 +
    //      (v1-v0)·(t-t0)/(t1-t0) is fixed-order IEEE on exact integer
    //      time deltas. Grid points outside a type's observed span keep
    //      NULL. Scale: the windows partition by TYPE; at 100 TB the key
    //      becomes (type, day) with boundary stitching — q77's note.
    "q200_resample" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_type", unix_timestamp($"ts").as("tsec"),
          $"event_id", $"value")
      // pure integer grid alignment (a double ceil/floor could sit a ulp
      // off an exact multiple): first/last grid points inside [min, max]
      val span = ev.agg(
        expr(s"((min(tsec) + $GridStep - 1) div $GridStep) * $GridStep").as("t0"),
        expr(s"(max(tsec) div $GridStep) * $GridStep").as("t1"))
      val grid = span
        .select(explode(expr(s"sequence(t0, t1, $GridStep)")).as("gt"))
        .crossJoin(ev.select($"event_type").distinct())
      val merged = ev
        .select($"event_type", $"tsec", lit(0L).as("is_grid"), $"event_id",
          $"tsec".as("e_t"), $"value".as("e_v"), lit(null).cast("long").as("gt"))
        .unionByName(grid.select($"event_type", $"gt".as("tsec"),
          lit(1L).as("is_grid"), lit(Long.MaxValue).as("event_id"),
          lit(null).cast("long").as("e_t"), lit(null).cast("double").as("e_v"),
          $"gt"))
      // events sort BEFORE the grid point at an equal timestamp, so a
      // sample landing exactly on an event interpolates from it on the
      // left with zero weight error (t == t0 gives v0 exactly)
      val wAsc = Window.partitionBy($"event_type")
        .orderBy($"tsec", $"is_grid", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = Window.partitionBy($"event_type")
        .orderBy($"tsec".desc, $"is_grid".desc, $"event_id".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      merged
        .withColumn("t0", last($"e_t", ignoreNulls = true).over(wAsc))
        .withColumn("v0", last($"e_v", ignoreNulls = true).over(wAsc))
        .withColumn("t1", last($"e_t", ignoreNulls = true).over(wDesc))
        .withColumn("v1", last($"e_v", ignoreNulls = true).over(wDesc))
        .filter($"is_grid" === 1L)
        .withColumn("v", when($"t0".isNull || $"t1".isNull,
            lit(null).cast("double"))
          .when($"t1" === $"t0", $"v0")
          .otherwise($"v0" + ($"v1" - $"v0") *
            (($"gt" - $"t0").cast("double") / ($"t1" - $"t0").cast("double"))))
        .select($"event_type", $"gt", $"t0", $"t1", $"v")
        .repartition(1).sortWithinPartitions($"event_type", $"gt")
    }),

    // ---- q213: seasonal-naive forecast EVALUATION (MAE + MASE,
    //      Hyndman & Koehler 2006 — MASE is the standard scale-free
    //      accuracy metric) — the backtest every forecasting deployment
    //      runs before trusting a model: predict each hour's mean value
    //      by the same hour yesterday (seasonal naive), score MAE, and
    //      scale by the one-step-naive MAE. Hourly means are
    //      (type, hour)-keyed SUMD aggs; both predictions are per-type
    //      lag windows over the hour series; every |error| is a single
    //      IEEE subtract+abs summed under SUMD; the final MASE is one
    //      division. Rows where a lag is undefined are excluded
    //      identically in both engines.
    "q213_seasonal_eval" -> ((s, dir) => {
      import s.implicits._
      val hourly = Tables.load(s, dir, "events")
        .select($"event_type", expr("unix_timestamp(ts) div 3600").as("hr"), $"value")
        .groupBy($"event_type", $"hr")
        .agg((sumd($"value") / count(lit(1)).cast("double")).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      hourly
        .withColumn("y_season", lag($"y", SeasonLag).over(w))
        .withColumn("y_prev", lag($"y", 1).over(w))
        .filter($"y_season".isNotNull && $"y_prev".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_hours"),
          (sumd(abs($"y" - $"y_season")) / count(lit(1)).cast("double"))
            .as("mae_seasonal"),
          (sumd(abs($"y" - $"y_prev")) / count(lit(1)).cast("double"))
            .as("mae_naive1"))
        .withColumn("mase", $"mae_seasonal" / $"mae_naive1")
        .repartition(1).sortWithinPartitions($"event_type")
    }),

    // ---- q214: funnel latency quantiles — the time-to-convert
    //      distribution behind q75's stage counts (p50/p90 of
    //      signup -> purchase latency, the numbers an activation team
    //      actually tracks). Per-user first-signup/first-purchase-after
    //      are the q75 aggregates; latencies are exact integer seconds;
    //      the quantiles ride the distributed exactQuantiles engine
    //      (bit-equal to quantile_cont). One user-keyed pass + the
    //      quantile machinery.
    "q214_time_to_convert" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", unix_timestamp($"ts").as("tsec"))
      val s1 = ev.groupBy($"user_id")
        .agg(min(when($"event_type" === "signup", $"tsec")).as("s_t"))
      val lat = ev.join(s1, "user_id")
        .groupBy($"user_id")
        .agg(max($"s_t").as("s_t"),
          min(when($"event_type" === "purchase" && $"tsec" >= $"s_t", $"tsec"))
            .as("p_t"))
        .filter($"p_t".isNotNull)
        .select($"user_id", ($"p_t" - $"s_t").cast("double").as("latency"),
          lit(1).as("_all"))
      Advanced.exactQuantiles(lat, "_all", "latency",
          Seq(("p50", 0.5), ("p90", 0.9)), countAs = Some("n_converted"))
        .drop("_all")
    }),

    // ---- q212: CUSUM change-point detection (Page 1954) — the
    //      SEQUENTIAL drift alarm beside q177's batch test and q199's
    //      trend slope: S_t = max(0, S_{t-1} + (x_t − mean − k)), alarm
    //      when S_t > h. The recurrence parallelizes as S_t = P_t −
    //      min(0, min_{j≤t} P_j) over the deviation prefix sum P — two
    //      per-type running windows, no sequential scan. Determinism:
    //      deviations quantize ONCE to integer micro-units (see
    //      CusumSlackMicro) so every window accumulation is BIGINT-exact
    //      — the only way an order-dependent running double sum can be
    //      bit-identical cross-engine. Output per type: alarms, peak
    //      statistic, first alarm time.
    "q212_cusum" -> ((s, dir) => {
      import s.implicits._
      val wRun = Window.partitionBy($"event_type").orderBy($"tsec", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cusumReport(cusumDevs(s, dir)
        .withColumn("p", sum($"dev_q").over(wRun))
        .withColumn("s", $"p" - least(min($"p").over(wRun), lit(0L))))
    }),

    // ---- q211: DISCRETE percentiles (percentile_disc semantics: the
    //      smallest actual element whose cumulative fraction reaches p —
    //      a value the dataset really contains, unlike q34's continuous
    //      interpolation). Both engines compute the SAME explicit rank
    //      selection (rn = ceil(p·n) under a (value, event_id) order)
    //      rather than trusting builtin tie conventions; p is an exact
    //      binary fraction so ceil never sees a rounding artifact. Ties
    //      in value are harmless — any tie order selects the same value.
    //      One rank window per type + a 3-probe explode.
    "q211_percentile_disc" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
      val wp = Window.partitionBy($"event_type")
      Tables.load(s, dir, "events")
        .select($"event_type", $"event_id", $"value")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wp))
        .withColumn("p", explode(typedLit(DiscPs)))
        .filter($"rn" === ceil($"p" * $"n".cast("double")).cast("long"))
        .select($"event_type", ($"p" * 100).cast("long").as("pct"),
          $"value".as("disc_value"))
        .repartition(1).sortWithinPartitions($"event_type", $"pct")
    }),

    // ---- q195: Benford first-digit audit — the classic fabricated-data
    //      screen (Benford 1938; Nigrini's fraud-audit use is the public
    //      methodology): the leading digit of naturally-occurring
    //      amounts follows log10(1+1/d), and a feed whose digits don't is
    //      suspect. The first digit comes from the BIGINT string of
    //      floor(price) — never from double formatting (engine-specific)
    //      or a runtime log10 (libm); expectations are driver-computed
    //      shared literals. ONE table pass into a 9-cell agg; expected
    //      and chi2 terms are single-IEEE-op arithmetic per cell.
    "q195_benford" -> ((s, dir) => {
      import s.implicits._
      val digits = Tables.load(s, dir, "orders")
        .select(substring(floor($"o_totalprice").cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("observed"))
      digits
        .crossJoin(broadcast(digits.agg(sum($"observed").cast("long").as("n"))))
        .withColumn("p_benford",
          element_at(typedLit(BenfordPpb), $"digit".cast("int")).cast("double")
            / lit(1.0e9))
        .withColumn("expected", $"n".cast("double") * $"p_benford")
        .withColumn("chi2_term",
          ($"observed".cast("double") - $"expected") *
            ($"observed".cast("double") - $"expected") / $"expected")
        .select($"digit", $"observed", $"n", $"p_benford", $"expected", $"chi2_term")
        .repartition(1).sortWithinPartitions($"digit")
    }),

    // ---- q196: bot/abuse signals from inter-event timing — per user:
    //      event count, exact integer gap sums (unix-second gaps via a
    //      per-user lead window), mean gap, gap variance by the q78
    //      sum-of-squares identity (every sum is EXACT BIGINT arithmetic
    //      — gaps are integers, squares bounded by span², far inside
    //      int64 — so only the final divisions are IEEE), coefficient of
    //      variation, and the machine-like flag (low cv OR high volume).
    //      Scale shape: one per-user window pass + a user-keyed agg;
    //      no quantiles, no global state.
    "q196_bot_signals" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
      val gaps = Tables.load(s, dir, "events")
        .select($"user_id", unix_timestamp($"ts").as("tsec"), $"event_id")
        .withColumn("gap", $"tsec" - lag($"tsec", 1).over(w))
        .filter($"gap".isNotNull)
      gaps.groupBy($"user_id")
        .agg(count(lit(1)).as("n_gaps"), sum($"gap").as("s"),
          sum($"gap" * $"gap").as("ss"))
        .filter($"n_gaps" > 1)
        .withColumn("mean_gap", $"s".cast("double") / $"n_gaps".cast("double"))
        .withColumn("var_gap",
          ($"ss".cast("double") - $"s".cast("double") * $"s".cast("double")
            / $"n_gaps".cast("double")) / ($"n_gaps" - 1).cast("double"))
        .withColumn("cv", sqrt($"var_gap") / $"mean_gap")
        .withColumn("flag",
          $"cv" < BotCvMax || ($"n_gaps" + 1) >= BotMinEvents)
        .select($"user_id", ($"n_gaps" + 1).as("n_events"), $"mean_gap",
          $"var_gap", $"cv", $"flag")
        .repartition(1).sortWithinPartitions($"user_id")
    }),

    // ---- q197: Pearson correlation per group — the dependence screen a
    //      feature pipeline runs before trusting a proxy column (here:
    //      does quantity track price within each return flag?). Five
    //      SUMD sums off ONE scan (x, y, xy, xx, yy — each per-row
    //      product a single IEEE multiply, sums order-independent under
    //      the decimal convention), then the textbook
    //      (n·Sxy − Sx·Sy)/(sqrt(n·Sxx − Sx²)·sqrt(n·Syy − Sy²)) with
    //      the identical op order in the oracle; sqrt correctly rounded.
    "q197_correlation" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity".as("x"),
          ($"l_extendedprice" / lit(CorrScale)).as("y"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sumd($"x").as("sx"), sumd($"y").as("sy"),
          sumd($"x" * $"y").as("sxy"), sumd($"x" * $"x").as("sxx"),
          sumd($"y" * $"y").as("syy"))
        .withColumn("r",
          ($"n".cast("double") * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n".cast("double") * $"sxx" - $"sx" * $"sx") *
              sqrt($"n".cast("double") * $"syy" - $"sy" * $"sy")))
        .select($"l_returnflag", $"n", $"r")
        .repartition(1).sortWithinPartitions($"l_returnflag")
    }),

    // ---- q198: A/B conversion report with the two-proportion z-test —
    //      the experiment readout an events pipeline serves daily.
    //      Variant = user_id parity (the synthetic assignment); a user
    //      converts if they ever purchase. Two user-keyed aggs (per-user
    //      conversion, then the 1-row variant rollup via conditional
    //      sums); rates/lift/pooled-z are fixed-order IEEE arithmetic on
    //      exact integer counts, sqrt correctly rounded. Output is ONE
    //      row — nothing here can shuffle more than the user key.
    "q198_ab_test" -> ((s, dir) => {
      import s.implicits._
      val u = Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(when(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          >= ConvPurchases, 1L).otherwise(0L).as("conv"))
        .withColumn("variant", $"user_id" % 2)
      u.agg(
          sum(when($"variant" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"variant" === 0, $"conv").otherwise(0L)).as("conv_a"),
          sum(when($"variant" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"variant" === 1, $"conv").otherwise(0L)).as("conv_b"))
        .withColumn("rate_a", $"conv_a".cast("double") / $"n_a".cast("double"))
        .withColumn("rate_b", $"conv_b".cast("double") / $"n_b".cast("double"))
        .withColumn("lift", $"rate_b" - $"rate_a")
        .withColumn("p_pool",
          ($"conv_a" + $"conv_b").cast("double") / ($"n_a" + $"n_b").cast("double"))
        .withColumn("z", $"lift" /
          sqrt($"p_pool" * (lit(1.0) - $"p_pool") *
            (lit(1.0) / $"n_a".cast("double") + lit(1.0) / $"n_b".cast("double"))))
        .select($"n_a", $"conv_a", $"rate_a", $"n_b", $"conv_b", $"rate_b",
          $"lift", $"z")
    }),

    // ---- q199: per-group OLS trend (simple linear regression of event
    //      value on hours-since-corpus-start) — the drift-DIRECTION
    //      companion to q177's distribution test: chi2 says the
    //      distribution moved, the slope says which way and how fast.
    //      x rescales to hours so the decimal-cast x·x / x·y products
    //      stay inside the SUMD per-value range (see OlsHour); the
    //      corpus start is the broadcast 1-row min (q177's midpoint
    //      discipline); slope/intercept are the closed-form sums
    //      identity with oracle-identical op order. One scan + one
    //      group agg.
    "q199_ols_trend" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_type", unix_timestamp($"ts").as("tsec"), $"value")
      val start = ev.agg(min($"tsec").as("t0"))
      ev.crossJoin(broadcast(start))
        .withColumn("x", ($"tsec" - $"t0").cast("double") / lit(OlsHour))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sumd($"x").as("sx"), sumd($"value").as("sy"),
          sumd($"x" * $"value").as("sxy"), sumd($"x" * $"x").as("sxx"))
        .withColumn("slope",
          ($"n".cast("double") * $"sxy" - $"sx" * $"sy") /
            ($"n".cast("double") * $"sxx" - $"sx" * $"sx"))
        .withColumn("intercept",
          ($"sy" - $"slope" * $"sx") / $"n".cast("double"))
        .select($"event_type", $"n", $"slope", $"intercept")
        .repartition(1).sortWithinPartitions($"event_type")
    }),

    // ---- q191: join-key skew diagnostics — the report that feeds the
    //      q108 salting and AQE skew-join decisions: per profiled join
    //      column, the top heavy keys with the summary (rows, distinct
    //      keys, skew ratio = max key count / mean key count). Scale
    //      shape per column: ONE partial+final count agg on the key;
    //      top-N is TakeOrderedAndProject; the rank window runs on the N
    //      survivors partitioned by a single-valued non-foldable key
    //      (q69's bounded-window trick); the summary is a 1-row
    //      broadcast. The skew ratio is (max*keys)/rows — two IEEE ops
    //      in the same order both engines.
    "q191_skew_diagnostics" -> ((s, dir) => {
      def arm(table: String, c: String): DataFrame = {
        val cnts = Tables.load(s, dir, table)
          .groupBy(col(c).cast("long").as("key_val"))
          .agg(count(lit(1)).as("cnt"))
        val summary = cnts.agg(sum(col("cnt")).cast("long").as("n_rows"),
          count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
        val top = cnts.orderBy(col("cnt").desc, col("key_val")).limit(SkewTopN)
        val w = Window.partitionBy(col("n_rows"))
          .orderBy(col("cnt").desc, col("key_val"))
        top.crossJoin(broadcast(summary))
          .withColumn("rank", row_number().over(w))
          .select(lit(s"$table.$c").as("col_name"), col("rank"), col("key_val"),
            col("cnt"), col("n_rows"), col("n_keys"),
            (col("max_cnt").cast("double") * col("n_keys").cast("double") /
              col("n_rows").cast("double")).as("skew_ratio"))
      }
      SkewCols.map { case (t, c) => arm(t, c) }.reduce(_ unionByName _)
        .repartition(1).sortWithinPartitions(col("col_name"), col("rank"))
    }),

    // ---- q192: event-transition mining — the first-order Markov
    //      transition table over per-user event sequences (the "what do
    //      users do next" surface behind q75's fixed funnel: this is the
    //      exploratory form that discovers funnels). Per user, events
    //      order by (ts, event_id); each adjacent pair contributes one
    //      (from, to) transition; the report is global counts + row
    //      fractions. Scale shape: ONE per-user lead window (partitioned
    //      by user — never global), then a (from, to)-keyed partial+final
    //      agg over types x types cells; fractions are exact-count IEEE
    //      divisions against the broadcast 1-row total.
    "q192_event_transitions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      transitionReport(Tables.load(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .select($"event_type".as("from_type"), $"next_type".as("to_type")))
    }),

    // ---- q188: marketing attribution (last-touch + linear) — the
    //      credit-assignment query every event pipeline serves on top of
    //      q75's funnel: for each purchase, the same user's clicks in the
    //      trailing window share the conversion credit — last-touch gives
    //      the final click everything, linear splits 1/n. Scale shape:
    //      ONE user-keyed equi-join builds the (purchase, click) pair
    //      frame (the time window is a residual predicate on the join —
    //      pairs bounded by per-user activity, never user x user);
    //      last-touch is a per-PURCHASE rank window; both models fold to
    //      a (model, click)-keyed SUMD agg. 1/n is a single exact IEEE
    //      division (n is an exact integer count).
    "q188_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_timestamp($"ts").as("tsec"))
      val purch = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("pid"), $"tsec".as("ptsec"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("cid"), $"tsec".as("ctsec"))
      val pairs = purch.join(clicks, Seq("user_id"))
        .filter($"ctsec" <= $"ptsec" && $"ctsec" > $"ptsec" - AttrWindow)
        .localCheckpoint() // one pair frame feeds both models
      val wLast = Window.partitionBy($"pid").orderBy($"ctsec".desc, $"cid".desc)
      val last = pairs.withColumn("rn", row_number().over(wLast))
        .filter($"rn" === 1)
        .select(lit("last_touch").as("model"), $"cid", lit(1.0).as("credit"))
      val linear = pairs
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"pid")))
        .select(lit("linear").as("model"), $"cid",
          (lit(1.0) / $"n".cast("double")).as("credit"))
      last.unionByName(linear)
        .groupBy($"model", $"cid")
        .agg(sumd($"credit").as("credit"), count(lit(1)).as("n_purchases"))
        .repartition(1).sortWithinPartitions($"model", $"cid")
    }),

    // ---- q189: winsorized means — the clamp-the-tails robust statistic
    //      next to q155's flag-the-tails (a metrics pipeline usually
    //      wants both: q155 names the outliers, this reports the
    //      outlier-resistant aggregate). Cut points p05/p95 per event
    //      type come from the distributed exactQuantiles engine
    //      (bit-equal to quantile_cont), broadcast back; the clamp is
    //      greatest/least — pure comparisons, no arithmetic to drift;
    //      raw and winsorized means are SUMD sums over one scan divided
    //      once. Two corpus passes total (quantiles, then the clamped
    //      agg) — the irreducible cost of a quantile-defined statistic.
    "q189_winsorize" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").select($"event_type", $"value")
      val cuts = Advanced.exactQuantiles(ev, "event_type", "value",
        Seq(("p05", WinsorLo), ("p95", WinsorHi)))
      ev.join(broadcast(cuts), Seq("event_type"))
        .withColumn("wv", greatest(least($"value", $"p95"), $"p05"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), max($"p05").as("p05"), max($"p95").as("p95"),
          sum(when($"value" < $"p05", 1L).otherwise(0L)).as("n_clip_low"),
          sum(when($"value" > $"p95", 1L).otherwise(0L)).as("n_clip_high"),
          (sumd($"value") / count(lit(1)).cast("double")).as("mean_raw"),
          (sumd($"wv") / count(lit(1)).cast("double")).as("mean_winsor"))
        .repartition(1).sortWithinPartitions($"event_type")
    }),

    // ---- q143: declarative data-quality expectations (the Deequ/Great-
    //      Expectations audit every ingestion pipeline gates a publish on;
    //      Schelter et al. VLDB 2018 is the public design) — one row per
    //      declared constraint with checked/violations/pass. Scale shape:
    //      the five column constraints fold into ONE single-pass agg per
    //      table (violation counters are conditional sums riding the same
    //      scan — adding a constraint adds a counter, never a pass);
    //      the two referential constraints are key-equi anti-joins (the
    //      orders probe side AQE-broadcastable when small, plain shuffle
    //      joins at 100 TB); everything reduces to 1-row frames before the
    //      union, so the report is constraint-cardinality-sized.
    "q143_expectations" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val liStats = li.agg(
          count(lit(1)).as("n"),
          sum(when(col("l_discount").isNull ||
            col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("v_disc"),
          sum(when(col("l_quantity").isNull || col("l_quantity") <= 0, 1L)
            .otherwise(0L)).as("v_qty"))
        .select(expr("stack(2, " +
          "'range_l_discount_0_1', n, v_disc, " +
          "'positive_l_quantity', n, v_qty) AS (rule, checked, violations)"))
      val oStats = o.agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("ndv"),
          count(col("o_orderdate")).as("cnt_date"),
          sum(when(col("o_totalprice").isNull || col("o_totalprice") <= 0, 1L)
            .otherwise(0L)).as("v_price"))
        .select(expr("stack(3, " +
          "'unique_o_orderkey', n, n - ndv, " +
          "'notnull_o_orderdate', n, n - cnt_date, " +
          "'positive_o_totalprice', n, v_price) AS (rule, checked, violations)"))
      def fk(name: String, child: DataFrame, key: String,
             parent: DataFrame, pkey: String): DataFrame =
        child.select(col(key))
          .join(parent.select(col(pkey)), col(key) === col(pkey), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .crossJoin(broadcast(child.agg(count(lit(1)).as("checked"))))
          .select(lit(name).as("rule"), col("checked"), col("violations"))
      liStats
        .unionByName(oStats)
        .unionByName(fk("fk_lineitem_orders", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(fk("fk_orders_customer", o, "o_custkey", c, "c_custkey"))
        .withColumn("pass", col("violations") === 0L)
        .repartition(1).sortWithinPartitions(col("rule"))
    }),
    // ---- q155: robust outlier detection (median/MAD) — the
    //      anomaly-flagging rule that survives what breaks q78's
    //      mean/stddev z-score: outliers CONTAMINATE the mean and inflate
    //      the stddev (masking), while the median and the median absolute
    //      deviation have 50% breakdown. Both medians come from the
    //      DISTRIBUTED exactQuantiles engine (q34's — range partitioning
    //      + per-partition rank offsets, bit-identical to quantile_cont,
    //      never a per-group sort through one task), broadcast back;
    //      the flag is one IEEE multiply + compare per row. Two corpus
    //      passes (median, then MAD over deviations) — the irreducible
    //      cost of the two-level statistic.
    "q155_robust_outliers" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").select($"event_type", $"value")
      val med = Advanced.exactQuantiles(ev, "event_type", "value", Seq(("med", 0.5)))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("absdev", abs($"value" - $"med"))
      val mad = Advanced.exactQuantiles(dev, "event_type", "absdev", Seq(("mad", 0.5)))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy($"event_type")
        .agg(max($"med").as("med"), max($"mad").as("mad"),
          count(lit(1)).as("n"),
          sum(when($"absdev" > lit(RobustCut) * $"mad", 1L).otherwise(0L))
            .as("n_outliers"))
        .repartition(1).sortWithinPartitions($"event_type")
    }),

    // ---- q132: ANALYZE-style column statistics — the stats-collection
    //      pass that feeds a catalog/CBO (row count, per-column null count
    //      and EXACT NDV, long-form). ONE table pass: all aggregates in a
    //      single agg (Spark plans the multi-distinct via expand — an
    //      explicit, bounded blowup of StatsCols rows per input row), then
    //      a stack() to long form; no join, no second scan. At 100 TB the
    //      same shape runs with approx_count_distinct swapped in per
    //      column (HLL registers merge tree-wise) — the exact NDV here is
    //      what makes the DuckDB gate exact.
    "q132_table_stats" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val aggs = count(lit(1)).as("n") +:
        StatsCols.flatMap(c => Seq(
          count(col(c)).as(s"cnt_$c"),
          countDistinct(col(c)).as(s"ndv_$c")))
      val one = o.agg(aggs.head, aggs.tail: _*)
      val stackArgs = StatsCols.map(c =>
        s"'$c', n - cnt_$c, ndv_$c").mkString(", ")
      one.select(expr(
          s"stack(${StatsCols.size}, $stackArgs) AS (col_name, nulls, ndv)"),
          col("n"))
        .select(col("col_name"), col("n"), col("nulls"), col("ndv"))
        .repartition(1).sortWithinPartitions(col("col_name"))
    }),
    // ---- q75: conversion funnel signup -> click -> purchase. Each stage
    //      is the user's FIRST qualifying event at-or-after the previous
    //      stage's time (the standard ordered-funnel definition). Three
    //      conditional aggregations on the user key with two user-key
    //      equi-joins between them — every pass shuffles on user_id and
    //      nothing buffers a user's history (min() is a running agg), so
    //      the plan holds at any event volume.
    "q75_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", $"ts")
      val s1 = ev.groupBy($"user_id")
        .agg(min(when($"event_type" === "signup", $"ts")).as("s_ts"))
      val s2 = ev.join(s1, "user_id")
        .groupBy($"user_id")
        .agg(max($"s_ts").as("s_ts"),
          min(when($"event_type" === "click" && $"ts" >= $"s_ts", $"ts")).as("c_ts"))
      val s3 = ev.join(s2, "user_id")
        .groupBy($"user_id")
        .agg(max($"s_ts").as("s_ts"), max($"c_ts").as("c_ts"),
          min(when($"event_type" === "purchase" && $"ts" >= $"c_ts", $"ts")).as("p_ts"))
      s3.select($"user_id",
          unix_timestamp($"s_ts").as("s_s"),
          unix_timestamp($"c_ts").as("c_s"),
          unix_timestamp($"p_ts").as("p_s"))
        .withColumn("stage",
          when($"p_s".isNotNull, 3L).when($"c_s".isNotNull, 2L)
            .when($"s_s".isNotNull, 1L).otherwise(0L))
        .orderBy($"user_id")
    }),

    // ---- q76: weekly cohort retention. Cohort = ISO week of the user's
    //      first event; a (cohort, k) cell counts users active k weeks
    //      later (k 0..3). First-event and per-week activity are both
    //      user-keyed aggregates; the cell aggregate is cohort-keyed —
    //      weeks are UTC Monday-truncated in both engines so the k
    //      arithmetic is exact integer division of aligned epochs.
    "q76_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").select($"user_id", $"ts")
      val cohort = ev.groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("cw"))
      val active = ev
        .select($"user_id", date_trunc("week", $"ts").as("aw")).distinct()
      active.join(cohort, "user_id")
        .withColumn("k",
          (unix_timestamp($"aw") - unix_timestamp($"cw")) / lit(604800L))
        .filter($"k" >= 0 && $"k" <= 3)
        .groupBy(unix_timestamp($"cw").as("cohort_s"), $"k".cast("long").as("k"))
        .agg(count(lit(1)).as("n_users")) // (user, week) is distinct already
        .orderBy($"cohort_s", $"k")
    }),

    // ---- q77: trailing 1-hour rolling aggregates per user at every
    //      event — a RANGE window frame over event-time seconds (peers at
    //      the same second included, exactly as in the oracle). The window
    //      is partitioned by user; at 100 TB the key becomes (user, day)
    //      with boundary stitching, same note as q56's packing window —
    //      never an unpartitioned global frame.
    "q77_rolling_window" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_s")
        .rangeBetween(-RollSecs, Window.currentRow)
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", unix_timestamp($"ts").as("ts_s"), $"value")
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(graft.util.Sumd.dec($"value")).over(w).cast("double"))
        .select($"user_id", $"event_id", $"ts_s", $"n_1h", $"sum_1h")
        .orderBy($"user_id", $"ts_s", $"event_id")
    }),

    // ---- q78: z-score anomaly flags per event type. Mean and stddev come
    //      from ONE tiny decimal-exact aggregate (n, sum, sum-of-squares
    //      — each x*x is a single IEEE multiply, summed under SUMD);
    //      variance is the textbook (ss - s*s/n)/(n-1) identity with the
    //      exact same op order in the oracle, sqrt is correctly rounded,
    //      so the flag set cannot drift between engines. The stats frame
    //      (one row per event type) broadcasts back onto the stream —
    //      linear, two scans, no wide shuffle.
    "q78_zscore" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type", $"value")
      // degenerate groups are EXCLUDED before any division/sqrt, with the
      // identical guard in the oracle: n = 1 (variance undefined) and
      // zero/negative variance (all-equal values; decimal rounding can
      // also push a tiny true variance fractionally below 0). Without the
      // guard the engines disagree — Spark yields NaN (and NaN > t is
      // true under its ordering), DuckDB yields NULL on 0/0 and ERRORS on
      // sqrt(negative).
      val stats = ev.groupBy($"event_type").agg(
          count(lit(1)).as("n"),
          sumd($"value").as("sv"),
          sumd($"value" * $"value").as("svv"))
        .filter($"n" > 1)
        .withColumn("varr",
          ($"svv" - $"sv" * $"sv" / $"n".cast("double"))
            / ($"n" - 1).cast("double"))
        .filter($"varr" > 0)
      ev.join(broadcast(stats), "event_type")
        .withColumn("mean", $"sv" / $"n".cast("double"))
        .withColumn("z", ($"value" - $"mean") / sqrt($"varr"))
        .filter(abs($"z") > ZThresh)
        .select($"event_id", $"event_type", $"value", $"z")
        .orderBy($"event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q177_chi2_drift" -> s"""
      WITH ev AS (
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec,
          CAST(least(greatest(floor(value / 10.0), 0.0), 9.0) AS BIGINT) AS bkt
        FROM events),
      m AS (SELECT (min(tsec) + max(tsec)) // 2 AS mid FROM ev),
      cells AS (
        SELECT event_type, bkt,
          CAST(count(*) FILTER (WHERE tsec < mid) AS BIGINT) AS b,
          CAST(count(*) FILTER (WHERE tsec >= mid) AS BIGINT) AS o
        FROM ev, m GROUP BY event_type, bkt),
      t AS (
        SELECT event_type, CAST(sum(b) AS BIGINT) AS nb,
          CAST(sum(o) AS BIGINT) AS no
        FROM cells GROUP BY event_type),
      x AS (
        SELECT c.event_type, c.b, c.o, t.nb, t.no,
          t.no::DOUBLE * (c.b::DOUBLE / t.nb::DOUBLE) AS e
        FROM cells c JOIN t USING (event_type))
      SELECT event_type, max(nb) AS n_base, max(no) AS n_cur,
        ${graft.util.Sumd.SUMD(
          "CASE WHEN b > 0 THEN (o::DOUBLE - e) * (o::DOUBLE - e) / e ELSE 0.0 END")}
          AS chi2,
        CAST(sum(CASE WHEN b = 0 THEN o ELSE 0 END) AS BIGINT) AS n_novel
      FROM x GROUP BY event_type ORDER BY event_type""",

    // Same hourly SUMD means, per-type lag windows, SUMD'd absolute
    // errors, and the identical quotient chain.
    "q213_seasonal_eval" -> s"""
      WITH h AS (
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr,
          ${SUMD("value")} / count(*)::DOUBLE AS y
        FROM events GROUP BY event_type, hr),
      l AS (
        SELECT event_type, hr, y,
          lag(y, $SeasonLag) OVER (PARTITION BY event_type ORDER BY hr) AS ys,
          lag(y, 1) OVER (PARTITION BY event_type ORDER BY hr) AS yp
        FROM h)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        ${SUMD("abs(y - ys)")} / count(*)::DOUBLE AS mae_seasonal,
        ${SUMD("abs(y - yp)")} / count(*)::DOUBLE AS mae_naive1,
        (${SUMD("abs(y - ys)")} / count(*)::DOUBLE)
          / (${SUMD("abs(y - yp)")} / count(*)::DOUBLE) AS mase
      FROM l WHERE ys IS NOT NULL AND yp IS NOT NULL
      GROUP BY event_type ORDER BY event_type""",

    // q75's first-stage aggregates, exact integer latencies, and the
    // proven quantile_cont equivalence.
    "q214_time_to_convert" -> """
      WITH ev AS (
        SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec
        FROM events),
      s1 AS (
        SELECT user_id,
          min(CASE WHEN event_type = 'signup' THEN tsec END) AS s_t
        FROM ev GROUP BY user_id),
      lat AS (
        SELECT e.user_id, max(s1.s_t) AS s_t,
          min(CASE WHEN e.event_type = 'purchase' AND e.tsec >= s1.s_t
              THEN e.tsec END) AS p_t
        FROM ev e JOIN s1 USING (user_id) GROUP BY e.user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_converted,
        quantile_cont((p_t - s_t)::DOUBLE, 0.5) AS p50,
        quantile_cont((p_t - s_t)::DOUBLE, 0.9) AS p90
      FROM lat WHERE p_t IS NOT NULL""",

    // Same micro-unit quantization (floor both engines), same two running
    // windows over the identical (tsec, event_id) order.
    "q212_cusum" -> s"""
      WITH ev AS (
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec,
          event_id, value
        FROM events),
      st AS (
        SELECT event_type,
          CAST(floor((${SUMD("value")} / count(*)::DOUBLE) * 1e6 + 0.5)
            AS BIGINT) AS mean_q
        FROM ev GROUP BY event_type),
      d AS (
        SELECT e.event_type, e.tsec, e.event_id,
          CAST(floor(e.value * 1e6 + 0.5) AS BIGINT) - s.mean_q
            - $CusumSlackMicro AS dev_q
        FROM ev e JOIN st s USING (event_type)),
      pr AS (
        SELECT event_type, tsec, event_id,
          CAST(sum(dev_q) OVER w AS BIGINT) AS p
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY tsec, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      runs AS (
        SELECT event_type, tsec,
          p - least(CAST(min(p) OVER w2 AS BIGINT), 0) AS s
        FROM pr
        WINDOW w2 AS (PARTITION BY event_type ORDER BY tsec, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) FILTER (WHERE s > $CusumHMicro) AS BIGINT) AS n_alarms,
        CAST(max(s) AS BIGINT) AS s_max,
        min(tsec) FILTER (WHERE s > $CusumHMicro) AS first_alarm
      FROM runs GROUP BY event_type ORDER BY event_type""",

    // Same explicit rank selection; unnest expands the probe list.
    "q211_percentile_disc" -> s"""
      WITH r AS (
        SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS rn,
          CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM events),
      x AS (SELECT event_type, value, rn, n,
              unnest([${DiscPs.mkString(", ")}]) AS p FROM r)
      SELECT event_type, CAST(p * 100 AS BIGINT) AS pct, value AS disc_value
      FROM x WHERE rn = CAST(ceil(p * n::DOUBLE) AS BIGINT)
      ORDER BY event_type, pct""",

    // Same integer grid alignment, the same union-sandwich with
    // IGNORE NULLS windows under identical (tsec, is_grid, event_id)
    // orderings, and the same fixed-order interpolation formula.
    "q200_resample" -> s"""
      WITH ev AS (
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec,
          event_id, value
        FROM events),
      span AS (
        SELECT ((min(tsec) + $GridStep - 1) // $GridStep) * $GridStep AS t0,
               (max(tsec) // $GridStep) * $GridStep AS t1
        FROM ev),
      grid AS (
        SELECT t.event_type, CAST(u.gt AS BIGINT) AS gt
        FROM (SELECT DISTINCT event_type FROM ev) t, span,
          unnest(range(span.t0, span.t1 + 1, $GridStep)) AS u(gt)),
      merged AS (
        SELECT event_type, tsec, 0 AS is_grid, event_id,
          tsec AS e_t, value AS e_v, CAST(NULL AS BIGINT) AS gt
        FROM ev
        UNION ALL
        SELECT event_type, gt, 1, ${Long.MaxValue}, NULL, NULL, gt FROM grid),
      w AS (
        SELECT event_type, is_grid, gt,
          last_value(e_t IGNORE NULLS) OVER wa AS t0,
          last_value(e_v IGNORE NULLS) OVER wa AS v0,
          last_value(e_t IGNORE NULLS) OVER wd AS t1,
          last_value(e_v IGNORE NULLS) OVER wd AS v1
        FROM merged
        WINDOW wa AS (PARTITION BY event_type
            ORDER BY tsec, is_grid, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wd AS (PARTITION BY event_type
            ORDER BY tsec DESC, is_grid DESC, event_id DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type, gt, t0, t1,
        CASE WHEN t0 IS NULL OR t1 IS NULL THEN NULL
             WHEN t1 = t0 THEN v0
             ELSE v0 + (v1 - v0) * ((gt - t0)::DOUBLE / (t1 - t0)::DOUBLE)
        END AS v
      FROM w WHERE is_grid = 1
      ORDER BY event_type, gt""",

    // Same BIGINT-string first digit, same shared p literals, same
    // single-op expected/chi2 arithmetic.
    "q195_benford" -> s"""
      WITH d AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
          1, 1) AS BIGINT) AS digit
        FROM orders),
      c AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY 1),
      t AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM c),
      x AS (
        SELECT digit, observed, n,
          ${BenfordPpb.mkString("[", ", ", "]")}[digit]::DOUBLE / 1.0e9
            AS p_benford
        FROM c, t),
      y AS (SELECT digit, observed, n, p_benford,
              n::DOUBLE * p_benford AS expected FROM x)
      SELECT digit, observed, n, p_benford, expected,
        (observed::DOUBLE - expected) * (observed::DOUBLE - expected) / expected
          AS chi2_term
      FROM y ORDER BY digit""",

    // Same per-user lag gaps, exact BIGINT sums, q78 variance identity,
    // same cv/flag policy constants.
    "q196_bot_signals" -> s"""
      WITH e AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec, event_id
        FROM events),
      g AS (
        SELECT user_id,
          tsec - lag(tsec, 1) OVER (PARTITION BY user_id
            ORDER BY tsec, event_id) AS gap
        FROM e),
      s AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
          CAST(sum(gap) AS BIGINT) AS s, CAST(sum(gap * gap) AS BIGINT) AS ss
        FROM g WHERE gap IS NOT NULL GROUP BY user_id),
      x AS (
        SELECT user_id, n_gaps, s, ss,
          s::DOUBLE / n_gaps::DOUBLE AS mean_gap,
          (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_gaps::DOUBLE)
            / (n_gaps - 1)::DOUBLE AS var_gap
        FROM s WHERE n_gaps > 1)
      SELECT user_id, n_gaps + 1 AS n_events, mean_gap, var_gap,
        sqrt(var_gap) / mean_gap AS cv,
        (sqrt(var_gap) / mean_gap < $BotCvMax
          OR n_gaps + 1 >= $BotMinEvents) AS flag
      FROM x ORDER BY user_id""",

    // Same five SUMD sums off one scan and the identical closed form
    // (price pre-divided by the shared exact scale).
    "q197_correlation" -> s"""
      WITH l AS (
        SELECT l_returnflag, l_quantity AS x,
          l_extendedprice / $CorrScale AS y
        FROM lineitem),
      s AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          ${SUMD("x")} AS sx, ${SUMD("y")} AS sy,
          ${SUMD("x * y")} AS sxy,
          ${SUMD("x * x")} AS sxx,
          ${SUMD("y * y")} AS syy
        FROM l GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (n::DOUBLE * sxy - sx * sy) /
          (sqrt(n::DOUBLE * sxx - sx * sx) * sqrt(n::DOUBLE * syy - sy * sy)) AS r
      FROM s ORDER BY l_returnflag""",

    // Same per-user conversion roll-up and the pooled two-proportion z
    // with identical op order.
    "q198_ab_test" -> s"""
      WITH u AS (
        SELECT user_id,
          CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            >= $ConvPurchases THEN 1 ELSE 0 END AS BIGINT) AS conv
        FROM events GROUP BY user_id),
      r AS (
        SELECT
          CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
          CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
          CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        FROM u),
      x AS (
        SELECT n_a, conv_a, n_b, conv_b,
          conv_a::DOUBLE / n_a::DOUBLE AS rate_a,
          conv_b::DOUBLE / n_b::DOUBLE AS rate_b,
          (conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE AS p_pool
        FROM r)
      SELECT n_a, conv_a, rate_a, n_b, conv_b, rate_b,
        rate_b - rate_a AS lift,
        (rate_b - rate_a) /
          sqrt(p_pool * (1.0 - p_pool)
            * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS z
      FROM x""",

    // Same broadcast start, hour rescale, SUMD sums, closed-form slope.
    "q199_ols_trend" -> s"""
      WITH e AS (
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec, value
        FROM events),
      t0 AS (SELECT CAST(min(tsec) AS BIGINT) AS t0 FROM e),
      x AS (
        SELECT event_type, (tsec - t0)::DOUBLE / $OlsHour AS x, value
        FROM e, t0),
      s AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          ${SUMD("x")} AS sx, ${SUMD("value")} AS sy,
          ${SUMD("x * value")} AS sxy, ${SUMD("x * x")} AS sxx
        FROM x GROUP BY event_type),
      f AS (
        SELECT event_type, n, sx, sy,
          (n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx) AS slope
        FROM s)
      SELECT event_type, n, slope, (sy - slope * sx) / n::DOUBLE AS intercept
      FROM f ORDER BY event_type""",

    // Same per-column count/top-N/summary arms UNION'd, same
    // (cnt desc, key) rank order, same (max*keys)/rows ratio op order.
    "q191_skew_diagnostics" -> (SkewCols.map { case (table, c) => s"""
      SELECT '$table.$c' AS col_name, rank, key_val, cnt, n_rows, n_keys,
        max_cnt::DOUBLE * n_keys::DOUBLE / n_rows::DOUBLE AS skew_ratio
      FROM (
        SELECT key_val, cnt,
          ROW_NUMBER() OVER (ORDER BY cnt DESC, key_val) AS rank,
          CAST(sum(cnt) OVER () AS BIGINT) AS n_rows,
          CAST(count(*) OVER () AS BIGINT) AS n_keys,
          CAST(max(cnt) OVER () AS BIGINT) AS max_cnt
        FROM (
          SELECT CAST($c AS BIGINT) AS key_val, CAST(count(*) AS BIGINT) AS cnt
          FROM $table GROUP BY 1) k) r
      WHERE rank <= $SkewTopN"""
    }.mkString(" UNION ALL ") + " ORDER BY col_name, rank"),

    // Same per-user (ts, event_id) lead adjacency, same exact-count row
    // fractions.
    "q192_event_transitions" -> """
      WITH t AS (
        SELECT event_type AS from_type,
          lead(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
      SELECT from_type, to_type, cnt, cnt::DOUBLE / total::DOUBLE AS frac
      FROM c, tot ORDER BY from_type, to_type""",

    // Same pair frame (user equi-join + trailing-window residual), same
    // (ctsec desc, cid desc) last-touch rank, same exact 1/n split, SUMD
    // credit sums.
    "q188_attribution" -> s"""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
          CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec
        FROM events),
      pairs AS (
        SELECT p.event_id AS pid, c.event_id AS cid, c.tsec AS ctsec
        FROM ev p JOIN ev c ON p.user_id = c.user_id
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.tsec <= p.tsec AND c.tsec > p.tsec - $AttrWindow),
      last_ AS (
        SELECT 'last_touch' AS model, cid, 1.0::DOUBLE AS credit FROM (
          SELECT cid,
            ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ctsec DESC, cid DESC) AS rn
          FROM pairs) x WHERE rn = 1),
      linear_ AS (
        SELECT 'linear' AS model, cid,
          1.0::DOUBLE / (count(*) OVER (PARTITION BY pid))::DOUBLE AS credit
        FROM pairs),
      un AS (SELECT * FROM last_ UNION ALL SELECT * FROM linear_)
      SELECT model, cid, ${SUMD("credit")} AS credit,
        CAST(count(*) AS BIGINT) AS n_purchases
      FROM un GROUP BY model, cid ORDER BY model, cid""",

    // Same quantile engine (quantile_cont bit-equal), same greatest/least
    // clamp, same SUMD-over-one-scan means.
    "q189_winsorize" -> s"""
      WITH cuts AS (
        SELECT event_type, quantile_cont(value, $WinsorLo) AS p05,
          quantile_cont(value, $WinsorHi) AS p95
        FROM events GROUP BY event_type)
      SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        max(c.p05) AS p05, max(c.p95) AS p95,
        CAST(count(*) FILTER (WHERE e.value < c.p05) AS BIGINT) AS n_clip_low,
        CAST(count(*) FILTER (WHERE e.value > c.p95) AS BIGINT) AS n_clip_high,
        ${SUMD("e.value")} / count(*)::DOUBLE AS mean_raw,
        ${SUMD("greatest(least(e.value, c.p95), c.p05)")} / count(*)::DOUBLE
          AS mean_winsor
      FROM events e JOIN cuts c USING (event_type)
      GROUP BY e.event_type ORDER BY e.event_type""",

    "q167_histograms" -> {
      val arms = HistCols.map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM lineitem")
        .mkString(" UNION ALL ")
      val qs = HistBounds.map { case (name, q) =>
        s"quantile_cont(v, $q) AS $name" }.mkString(", ")
      s"""
      WITH u AS ($arms)
      SELECT col_name, CAST(count(v) AS BIGINT) AS n, $qs
      FROM u GROUP BY col_name ORDER BY col_name"""
    },

    // Replays median -> deviations -> MAD -> cut, with quantile_cont (the
    // proven bit-equal of the distributed exactQuantiles engine).
    "q155_robust_outliers" -> s"""
      WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type),
      dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY event_type)
      SELECT d.event_type, max(d.med) AS med, max(m.mad) AS mad,
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) FILTER (WHERE d.absdev > $RobustCut * m.mad) AS BIGINT)
          AS n_outliers
      FROM dev d JOIN mad m USING (event_type)
      GROUP BY d.event_type ORDER BY d.event_type""",

    "q143_expectations" -> """
      WITH rows_ AS (
        SELECT 'range_l_discount_0_1' AS rule,
          CAST(count(*) AS BIGINT) AS checked,
          CAST(count(*) FILTER (WHERE l_discount IS NULL
            OR l_discount < 0 OR l_discount > 1) AS BIGINT) AS violations
        FROM lineitem
        UNION ALL
        SELECT 'positive_l_quantity', CAST(count(*) AS BIGINT),
          CAST(count(*) FILTER (WHERE l_quantity IS NULL OR l_quantity <= 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'unique_o_orderkey', CAST(count(*) AS BIGINT),
          CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'notnull_o_orderdate', CAST(count(*) AS BIGINT),
          CAST(count(*) - count(o_orderdate) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'positive_o_totalprice', CAST(count(*) AS BIGINT),
          CAST(count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'fk_lineitem_orders',
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
          -- NOT EXISTS with a correlated equality, NOT 'NOT IN': the Spark
          -- side counts violations via a left_anti join, under which a NULL
          -- child key IS a violation (no parent row can equal it), while
          -- NOT IN would silently skip NULL keys (three-valued logic) — an
          -- engine divergence if the key ever carried NULLs.
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'fk_orders_customer',
          (SELECT CAST(count(*) AS BIGINT) FROM orders),
          (SELECT CAST(count(*) AS BIGINT) FROM orders od
           WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = od.o_custkey)))
      SELECT rule, checked, violations, violations = 0 AS pass
      FROM rows_ ORDER BY rule""",
    "q132_table_stats" -> (StatsCols.map(c => s"""
      SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) - count($c) AS BIGINT) AS nulls,
        CAST(count(DISTINCT $c) AS BIGINT) AS ndv
      FROM orders""").mkString(" UNION ALL ") + " ORDER BY col_name"),
    "q75_funnel" -> """
      WITH s1 AS (
        SELECT user_id,
          min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
        FROM events GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, max(s1.s_ts) AS s_ts,
          min(CASE WHEN e.event_type = 'click' AND e.ts >= s1.s_ts
              THEN e.ts END) AS c_ts
        FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, max(s2.s_ts) AS s_ts, max(s2.c_ts) AS c_ts,
          min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s2.c_ts
              THEN e.ts END) AS p_ts
        FROM events e JOIN s2 USING (user_id) GROUP BY e.user_id)
      SELECT user_id,
        CAST(FLOOR(epoch(s_ts)) AS BIGINT) AS s_s,
        CAST(FLOOR(epoch(c_ts)) AS BIGINT) AS c_s,
        CAST(FLOOR(epoch(p_ts)) AS BIGINT) AS p_s,
        CASE WHEN p_ts IS NOT NULL THEN 3
             WHEN c_ts IS NOT NULL THEN 2
             WHEN s_ts IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS stage
      FROM s3
      ORDER BY user_id""",

    "q76_retention" -> """
      WITH cohort AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events GROUP BY user_id),
      active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
      SELECT CAST(FLOOR(epoch(c.cw)) AS BIGINT) AS cohort_s,
        CAST((FLOOR(epoch(a.aw)) - FLOOR(epoch(c.cw))) / 604800 AS BIGINT) AS k,
        CAST(count(*) AS BIGINT) AS n_users
      FROM active a JOIN cohort c USING (user_id)
      WHERE FLOOR(epoch(a.aw)) - FLOOR(epoch(c.cw)) BETWEEN 0 AND 1814400
      GROUP BY 1, 2
      ORDER BY cohort_s, k""",

    "q77_rolling_window" -> s"""
      SELECT user_id, event_id,
        CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
        CAST(count(*) OVER w AS BIGINT) AS n_1h,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN $RollSecs PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_s, event_id""",

    "q78_zscore" -> s"""
      WITH stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          ${SUMD("value")} AS sv, ${SUMD("value * value")} AS svv
        FROM events GROUP BY event_type),
      gstats AS (
        SELECT event_type, n, sv,
          (svv - sv * sv / n::DOUBLE) / (n - 1)::DOUBLE AS varr
        FROM stats WHERE n > 1),
      scored AS (
        SELECT e.event_id, e.event_type, e.value,
          (e.value - s.sv / s.n::DOUBLE) / sqrt(s.varr) AS z
        FROM events e JOIN gstats s USING (event_type)
        WHERE s.varr > 0)
      SELECT event_id, event_type, value, z
      FROM scored
      WHERE abs(z) > $ZThresh
      ORDER BY event_id"""
  )
}
