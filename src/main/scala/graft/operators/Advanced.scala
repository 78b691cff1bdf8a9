package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Decimal-exact weighted average as a typed [[Aggregator]] (the UDAF row of
  * SURVEY §2.2): per-row terms rounded to DECIMAL(18,6) exactly like the
  * engine-wide SUMD convention, accumulated in arbitrary-precision
  * BigDecimal on the JVM side (partial aggregation + merge = full
  * map-side-combine support), final division in double. */
object WeightedAvgAgg extends Aggregator[(String, Double, Double), (BigDecimal, BigDecimal), Double] {
  private def dec6(d: Double): BigDecimal =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
  override def reduce(b: (BigDecimal, BigDecimal), a: (String, Double, Double)) =
    (b._1 + dec6(a._2 * a._3), b._2 + dec6(a._3))
  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (BigDecimal, BigDecimal)): Double = b._1.toDouble / b._2.toDouble
  override def bufferEncoder = Encoders.product[(BigDecimal, BigDecimal)]
  override def outputEncoder = Encoders.scalaDouble
}

/** KMV — k minimum values — distinct sketch (Bar-Yossef et al. RANDOM 2002;
  * unbiased estimator per Beyer et al. SIGMOD 2007): the k smallest
  * DISTINCT hash values of the input. The sketch family's DETERMINISTIC
  * member: unlike HLL registers (engine-specific, q29/q128), the k
  * smallest distinct values of a fixed hash are a pure SET function —
  * independent of partitioning, merge order, batch boundaries, and
  * replays — so a DuckDB oracle can replay the sketch bit-for-bit
  * (ORDER BY hash LIMIT k). And unlike HLL, KMV sketches support SET
  * OPERATIONS: the k smallest of a union is computable from the two
  * sketches alone, and the intersection estimate falls out of the
  * Jaccard fraction within the merged sketch. State is at most k longs;
  * merge is union-trim (associative, commutative, idempotent) — the
  * mergeable-summary contract that makes it a partial+final aggregate. */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Vector.empty
  // buffer invariant: sorted ascending, distinct, length <= k
  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    if (b.length == k && h >= b.last) b // steady-state O(1) fast path
    else if (b.search(h).isInstanceOf[
      scala.collection.Searching.Found]) b // sorted: O(log k) membership
    else ((b :+ h).sorted: Seq[Long]).take(k)
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    ((x ++ y).distinct.sorted: Seq[Long]).take(k)
  override def finish(b: Seq[Long]): Seq[Long] = b
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Operators beyond the round-1 relational surface: session windows, a
  * typed-Aggregator UDAF, array/generator functions, and a salted
  * aggregation for skewed keys — each with a DuckDB oracle. */
object Advanced {
  private def SUMD(e: String): String = graft.util.Sumd.SUMD(e)

  /** Two-phase salted aggregation for skew: phase 1 aggregates on
    * (key, salt) — spreading one hot key over `salts` reducers — phase 2
    * re-aggregates the partials per key. Decomposable aggs only (sum/count
    * here). The salt is derived from a high-cardinality column so it is
    * deterministic, unlike rand(). At local scale this is strictly more
    * shuffle than needed; at 100 TB it is what keeps a hot key from pinning
    * one executor. (AQE's skew-join split only covers joins, not
    * aggregations — hence the explicit pattern.) */
  def saltedSumCount(
      df: org.apache.spark.sql.DataFrame, key: String, saltSource: String,
      valueExpr: org.apache.spark.sql.Column, salts: Int)
      : org.apache.spark.sql.DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(hash(col(saltSource)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueExpr.cast(DecimalType(18, 6))).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col(key))
      .agg(sum(col("_psum")).cast("double").as("total"), sum(col("_pcnt")).as("n"))
  }

  /** Distributed exact quantiles (R-7 / `quantile_cont` interpolation) with
    * NO per-group value buffer — the scale-safe replacement for Spark's
    * `percentile`, whose `OpenHashMap` buffer grows with the group when the
    * value column is near-unique (each low-cardinality group concentrates on
    * one final-merge task and OOMs it at 100 TB).
    *
    * Plan shape (every step bounded regardless of group size):
    *  1. `repartitionByRange(group, value)` — a global per-group sort spread
    *     across `rangeParts` partitions (range boundaries from Spark's
    *     deterministic reservoir sample).
    *  2. per-(partition, group) row counts — at most `rangeParts` x |groups|
    *     rows; a prefix-sum window over them (<= `rangeParts` rows per
    *     window partition) yields each range-partition's global rank offset.
    *  3. global 0-based rank = offset + `row_number` over (partition-id,
    *     group) — each window partition holds ~1/`rangeParts` of a group,
    *     so no single task ever sorts or buffers a whole group.
    *  4. per quantile q: position h = (n-1)*q; keep only ranks floor(h) /
    *     ceil(h) and interpolate with Spark's own Percentile formula
    *     `lower*(ceil(h)-h) + higher*(h-floor(h))` so results stay
    *     bit-identical to `percentile(...)` (and to DuckDB
    *     `quantile_cont`, which q34's oracle-green round 3 proved equal).
    *
    * The pid-stamped frame is materialized ONCE (localCheckpoint) before
    * fan-out: the offsets subplan and the ranked subplan both read the same
    * physical partitioning, so correctness never depends on ReuseExchange
    * deduplicating the ranged shuffle (RangePartitioner's sample seed
    * derives from the RDD id — two independent exchanges could draw
    * different range boundaries and silently misalign `_pid`).
    *
    * Groups whose value column is entirely NULL are ABSENT from the output
    * (every row is filtered before ranking); callers that need
    * `percentile()`'s keep-the-group-with-NULL semantics join from a totals
    * frame, as q34 does.
    *
    * Reference parity: exact percentiles over replicated rows are a
    * downstream-analytics concern the reference serves via HBase scans; this
    * is the Spark-native form (SURVEY §2.2 aggregations row). */
  def exactQuantiles(
      df: DataFrame, grp: String, valueCol: String,
      specs: Seq[(String, Double)], rangeParts: Int = 32,
      countAs: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df
      .select(col(grp).as("_g"), col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull) // percentile/quantile_cont ignore NULLs
    val withPid = vals
      .repartitionByRange(rangeParts, col("_g"), col("_v"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // one physical partitioning for BOTH consumers
    val counts = withPid.groupBy(col("_pid"), col("_g")).count()
    val wOff = Window.partitionBy(col("_g")).orderBy(col("_pid"))
    val offsets = counts
      .withColumn("_off", coalesce(
        sum(col("count")).over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_n", sum(col("count")).over(Window.partitionBy(col("_g"))))
      .select(col("_pid"), col("_g"), col("_off"), col("_n"))
    val wLocal = Window.partitionBy(col("_pid"), col("_g")).orderBy(col("_v"))
    val ranked = withPid
      .join(broadcast(offsets), Seq("_pid", "_g"))
      .withColumn("_rank",
        row_number().over(wLocal).cast("long") + col("_off") - lit(1L))
    def pos(q: Double) = (col("_n") - lit(1L)).cast("double") * lit(q)
    val needed = specs.map { case (_, q) =>
      col("_rank") === floor(pos(q)).cast("long") ||
        col("_rank") === ceil(pos(q)).cast("long")
    }.reduce(_ || _)
    val aggs = specs.flatMap { case (name, q) =>
      Seq(
        max(when(col("_rank") === floor(pos(q)).cast("long"), col("_v")))
          .as(s"_${name}_lo"),
        max(when(col("_rank") === ceil(pos(q)).cast("long"), col("_v")))
          .as(s"_${name}_hi"))
    } :+ max(col("_n")).as("_nn")
    val picked = ranked.filter(needed).groupBy(col("_g"))
      .agg(aggs.head, aggs.tail: _*)
    val outCols = specs.map { case (name, q) =>
      val h = (col("_nn") - lit(1L)).cast("double") * lit(q)
      val lo = floor(h)
      val hi = ceil(h)
      when(lo === hi, col(s"_${name}_lo"))
        .otherwise(
          col(s"_${name}_lo") * (hi - h) + col(s"_${name}_hi") * (h - lo))
        .as(name)
    }
    // the per-group non-null count is already computed for the rank
    // positions (_nn); callers that need it (q167) get it for free instead
    // of paying a second scan of the input
    val countCol = countAs.map(n => col("_nn").cast("long").as(n)).toSeq
    picked.select(col("_g").as(grp) +: (outCols ++ countCol): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- session windows: per-user activity sessions with a 30-minute gap.
    //      Spark merges events whose start < previous session end (strict),
    //      i.e. a break at gap >= 30min — mirrored by the oracle's
    //      gaps-and-islands SQL.
    "q24_session_window" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(18, 6))).cast("double").as("total_value"))
        .select($"user_id",
          unix_timestamp($"session_window.start").as("ss"),
          unix_timestamp($"session_window.end").as("se"),
          $"n", $"total_value")
        .orderBy($"user_id", $"ss")
    }),

    // ---- q92: the approx-percentile SKETCH under a self-validated rank
    //      bound (q29's idiom, extended to quantiles the way the recall
    //      audits extend it to ANN). The emitted p50/p95 are the EXACT
    //      distributed quantiles (reproducible, hash-gated vs
    //      quantile_cont); the GK sketch's answers are engine-specific and
    //      never emitted — instead the query recomputes each answer's true
    //      RANK and fails via raise_error unless it sits within the
    //      sketch's contract (rank error <= n/accuracy, +1 interpolation
    //      slack). sketch_ok=1 in the output is therefore a proof the
    //      audit ran and held, not a constant.
    "q92_approx_percentile_bound" -> ((s, dir) => {
      import s.implicits._
      val acc = 1000
      val li = Tables.load(s, dir, "lineitem")
      val exact = exactQuantiles(li, "l_returnflag", "l_quantity",
        Seq("p50" -> 0.5, "p95" -> 0.95))
      val approx = li.groupBy($"l_returnflag")
        .agg(percentile_approx($"l_quantity", array(lit(0.5), lit(0.95)), lit(acc)).as("ap"),
          count($"l_quantity").as("n"))
        .select($"l_returnflag", $"ap" (0).as("a50"), $"ap" (1).as("a95"), $"n")
      // a heavily-duplicated value occupies a rank INTERVAL
      // [count(<v), count(<=v)]; the sketch contract is that the target
      // rank q*n falls within tol of that interval
      val ranks = li.join(broadcast(approx), "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(max($"n").as("n"),
          count(when($"l_quantity" < $"a50", 1)).as("r50_lt"),
          count(when($"l_quantity" <= $"a50", 1)).as("r50_le"),
          count(when($"l_quantity" < $"a95", 1)).as("r95_lt"),
          count(when($"l_quantity" <= $"a95", 1)).as("r95_le"))
      def ok(rLt: org.apache.spark.sql.Column, rLe: org.apache.spark.sql.Column, q: Double) = {
        val target = lit(q) * $"n".cast("double")
        val tol = $"n".cast("double") / acc + 1.0
        (rLt.cast("double") - tol <= target) && (target <= rLe.cast("double") + tol)
      }
      val audited = ranks.withColumn("sketch_ok",
        when(ok($"r50_lt", $"r50_le", 0.5) && ok($"r95_lt", $"r95_le", 0.95), lit(1L))
          .otherwise(raise_error(concat(
            lit(s"approx_percentile rank error beyond n/$acc for "), $"l_returnflag"))))
        .select($"l_returnflag", $"sketch_ok")
      exact.join(audited, "l_returnflag")
        .select($"l_returnflag", $"p50", $"p95", $"sketch_ok")
        .orderBy($"l_returnflag")
    }),

    // ---- array construction + functions: collect_set/sort/size/element_at.
    //      (the array is stringified in the final projection — the driver's
    //      hash compare can't digest array-typed output columns)
    "q26_array_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(array_sort(collect_set($"o_orderstatus")).as("statuses"),
          count(lit(1)).as("n"))
        .select($"o_orderpriority",
          concat_ws(",", $"statuses").as("statuses_str"),
          size($"statuses").cast("long").as("n_statuses"),
          element_at($"statuses", 1).as("first_status"), $"n")
        .orderBy($"o_orderpriority")
    }),

    // ---- generator / UDTF surface: posexplode over a computed array.
    "q27_posexplode" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "part")
        .filter($"p_partkey" <= 200)
        .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
        .select($"p_partkey", $"pos".cast("long").as("pos"), $"word",
          length($"word").cast("long").as("wlen"))
        .orderBy($"p_partkey", $"pos")
    }),

    // ---- skew-safe aggregation: l_returnflag has 3 values — at scale each
    //      is a hot key; the salted two-phase plan spreads each over 32
    //      reducers. Result must equal the direct group-by (the oracle).
    "q28_salted_agg" -> ((s, dir) => {
      import s.implicits._
      saltedSumCount(Tables.load(s, dir, "lineitem"),
        key = "l_returnflag", saltSource = "l_orderkey",
        valueExpr = $"l_extendedprice" * (lit(1.0) - $"l_discount"), salts = 32)
        .orderBy($"l_returnflag")
    }),

    // ---- q108: skew-safe JOIN — q28's salting applied where a hot key
    //      bottlenecks a shuffle join: 150 users × thousands of events
    //      each IS the skew regime (every user is a hot key relative to
    //      the dim side's one row). The dim side REPLICATES each row over
    //      `salts` salt values; the fact side tags each row with a
    //      deterministic salt, so every (key, salt) shuffle partition
    //      carries ~1/salts of a hot key's rows and no single reducer
    //      owns a whole key. hint("merge") pins the shuffle join at test
    //      sf — a broadcastable dim would not need salting; this is the
    //      both-sides-too-big regime's recipe. The gate proves salting is
    //      semantically invisible vs the plain join.
    "q108_salted_join" -> ((s, dir) => {
      import s.implicits._
      val salts = 8
      val ev = Tables.load(s, dir, "events")
        .filter($"event_type" === "purchase")
        .withColumn("salt",
          pmod(xxhash64($"event_id"), lit(salts.toLong)).cast("int"))
      val dim = Tables.load(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment")
        .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      ev.hint("merge")
        .join(dim.hint("merge"),
          ev("user_id") === dim("c_custkey") && ev("salt") === dim("salt"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), graft.util.Sumd.sumd($"value").as("total"))
        .repartition(1).sortWithinPartitions($"c_mktsegment")
    }),

    // ---- HLL sketch aggregation: approx_count_distinct beside the exact
    //      count. The HLL ESTIMATE itself is engine-specific (no DuckDB
    //      value to compare), so the OUTPUT carries the exact count plus a
    //      `within_bound` flag whose computation forces the sketch: the
    //      query FAILS (raise_error) if any group's estimate strays beyond
    //      3x the sketch's configured rsd, and otherwise emits `true` —
    //      which the oracle reproduces as a literal. That makes q29 fully
    //      hash-gated (rows+schema+values) while the sketch stays
    //      self-validated in-query; a broken sketch turns the whole query
    //      into a runtime failure, not a silent pass.
    "q29_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      val rsd = 0.05 // approx_count_distinct default relative std deviation
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey", rsd).as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .withColumn("rel_err",
          abs($"approx_parts" - $"exact_parts").cast("double") / $"exact_parts")
        .select($"l_returnflag", $"exact_parts",
          when($"rel_err" > 3 * rsd, raise_error(concat(
            lit("HLL estimate out of bound: rel_err="), $"rel_err".cast("string"),
            lit(" for l_returnflag="), $"l_returnflag")).cast("boolean"))
            .otherwise(lit(true)).as("within_bound"))
        .orderBy($"l_returnflag")
    }),

    // ---- exact percentiles / median via the DISTRIBUTED sort-based
    //      quantile (see exactQuantiles): same R-7 interpolation as Spark
    //      `percentile` and DuckDB `quantile_cont` — bit-identical results —
    //      but with no per-group value buffer, so a near-unique column like
    //      l_extendedprice can't OOM a final-merge task at 100 TB. One
    //      ranked pass per value column, joined on the (3-row) group key.
    "q34_percentile" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val qty = exactQuantiles(li, "l_returnflag", "l_quantity",
        Seq("p50" -> 0.5, "p95" -> 0.95))
      val price = exactQuantiles(li, "l_returnflag", "l_extendedprice",
        Seq("price_p25" -> 0.25))
      // join FROM totals (which has every group) so a group whose value
      // column is all-NULL keeps its row with NULL quantiles — the same
      // semantics as percentile() / DuckDB quantile_cont
      val totals = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      totals.join(qty, Seq("l_returnflag"), "left")
        .join(price, Seq("l_returnflag"), "left")
        .select($"l_returnflag", $"p50", $"p95", $"price_p25", $"n")
        .orderBy($"l_returnflag")
    }),

    // ---- string-distance surface: Levenshtein edit distance (unit costs),
    //      identical definition in both engines.
    "q35_edit_distance" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "part")
        .filter($"p_partkey" <= 500)
        .select($"p_partkey",
          levenshtein($"p_name", $"p_type").cast("long").as("name_type_dist"),
          levenshtein($"p_name", $"p_brand").cast("long").as("name_brand_dist"))
        .orderBy($"p_partkey")
    }),

    // ---- pivot: long -> wide reshaping with explicit pivot values (the
    //      scale-correct form — value DISCOVERY would need an extra pass
    //      and a driver collect; explicit values keep it one aggregation).
    //      Column names follow Spark's {value}_{aggAlias} convention and
    //      the oracle mirrors them with FILTERed aggregates.
    "q36_pivot" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast(DecimalType(18, 6))).cast("double").as("tp"))
        .na.fill(0L, Seq("F_n", "O_n", "P_n"))
        .orderBy($"o_orderpriority")
    }),

    // ---- unpivot / melt: wide -> long, the inverse reshaping of q36.
    //      Pure narrow operator (each row fans out to one row per measure,
    //      no shuffle); oracle is the equivalent UNION ALL.
    "q37_unpivot" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_orderkey" <= 500)
        .unpivot(
          ids = Array($"l_orderkey", $"l_linenumber"),
          values = Array($"l_quantity", $"l_discount", $"l_tax"),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy($"l_orderkey", $"l_linenumber", $"metric")
    }),

    // ---- time-series gap fill / resample: one row per (user, hour) over
    //      each user's observed span, zeros where no events fell — the
    //      `sequence` + explode + left-join idiom. The dense hour axis is
    //      generated per user (no driver-side calendar), so the plan scales
    //      with users x span like any other shuffle-keyed op.
    "q39_gap_fill" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .filter($"user_id" <= 50)
        .withColumn("hr", date_trunc("hour", $"ts"))
      val hourly = ev.groupBy($"user_id", $"hr")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(18, 6))).cast("double").as("total_value"))
      val axis = ev.groupBy($"user_id")
        .agg(min($"hr").as("h0"), max($"hr").as("h1"))
        .select($"user_id",
          explode(sequence($"h0", $"h1", expr("INTERVAL 1 HOUR"))).as("hr"))
      axis.join(hourly, Seq("user_id", "hr"), "left")
        .select($"user_id", unix_timestamp($"hr").as("hr_ts"),
          coalesce($"n", lit(0L)).as("n"),
          coalesce($"total_value", lit(0.0)).as("total_value"))
        .orderBy($"user_id", $"hr_ts")
    }),

    // ---- map-type surface: build a status->count map per priority
    //      (map_from_entries over a sorted entry list), then explode it
    //      back to rows. The oracle is the flat two-level aggregate, so the
    //      gate fails if map construction drops, duplicates, or reorders
    //      keys' values.
    "q38_map_ops" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"o_orderpriority")
        .agg(map_from_entries(
          sort_array(collect_list(struct($"o_orderstatus", $"cnt")))).as("m"))
        .select($"o_orderpriority",
          explode($"m").as(Seq("o_orderstatus", "cnt")),
          size($"m").cast("long").as("n_statuses"))
        .orderBy($"o_orderpriority", $"o_orderstatus")
    }),

    // ---- UDAF: quantity-weighted average extended price per return flag.
    "q25_weighted_avg" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
        .as[(String, Double, Double)]
        .groupByKey(_._1)
        .agg(WeightedAvgAgg.toColumn.name("wavg"))
        .toDF("l_returnflag", "wavg")
        .orderBy($"l_returnflag")
    }),

    // ---- q148: KMV distinct sketch + sketch-level set operations — the
    //      deterministic member of the sketch family (q29 self-validates
    //      HLL, q128 exact-replays streaming HLL; KMV's k smallest
    //      distinct hashes are a pure set function, so the WHOLE sketch
    //      hash-gates). Distinct audiences of two event types, their
    //      UNION estimated from the merged sketch, their INTERSECTION from
    //      the Jaccard fraction within it — the set algebra HLL cannot do
    //      without inclusion-exclusion error blowup. Exact counts ride
    //      along (at 100 TB they are the expensive side: three
    //      countDistincts vs two k-long sketches). The sketch itself is a
    //      bounded-state typed Aggregator (partial+final, merge =
    //      union-trim), the set ops are array arithmetic on one 1-row
    //      frame.
    "q148_kmv_sketch" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val kmv = new KmvAgg(KmvK)
      val sketches = kmvHashed(s, dir).select($"event_type", $"h").as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(kmv.toColumn.name("kmv"))
        .toDF("event_type", "kmv")
      kmvReport(s, dir, sketches)
    })
  )

  /** q148/q149's shared input: the two audiences (high-value clickers vs
    * high-value purchasers — every user has every event TYPE, so the type
    * alone would make all three sets equal) with the portable sketch hash.
    * The hash input is suffix-padded: a bare small-int string folds to a
    * value far below the modulus (no wrap), which would put ALL ids in
    * the sketch's low tail and wreck the uniformity the estimator
    * assumes. */
  private[graft] def kmvHashed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "events")
      .filter($"event_type".isin("click", "purchase") && $"value" > 80)
      .select($"event_type", $"user_id",
        call_function("graft_polyhash",
          concat($"user_id".cast("string"), lit("/kmv-pad")),
          lit(31), lit(graft.ext.TextOps.HashMod)).as("h"))
  }

  /** q148's post-sketch report — estimates + sketch set ops + exact
    * ride-alongs — shared verbatim with the STREAMING sketch (q149), which
    * is what makes one oracle gate both execution modes (q137's
    * discipline; sound here because KMV is a pure set function, so the
    * streaming and batch sketches are bit-identical BY THEOREM, and the
    * gate enforces it). `sketches`: (event_type, kmv array<long>). */
  private[graft] def kmvReport(s: SparkSession, dir: String,
      sketches: DataFrame): DataFrame = {
    import s.implicits._
    val k = KmvK
    val hashed = kmvHashed(s, dir)
    // Each audience collapses through a global agg (exactly one output row
    // even when the filter matches nothing) and coalesces to an EMPTY
    // sketch, so a zero-qualifying-row audience yields the one-row report
    // with 0-estimates that the oracle's CTEs emit — not an empty frame
    // (the crossJoin chain would otherwise swallow the whole report).
    def audience(t: String, name: String) = sketches
      .agg(coalesce(max(when($"event_type" === t, $"kmv")),
        expr("CAST(array() AS array<bigint>)")).as(name))
    val ka = audience("click", "ka")
    val kb = audience("purchase", "kb")
      val exacts = hashed.groupBy($"user_id")
        .agg(countDistinct($"event_type").as("nt"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when($"nt" === 2, 1L).otherwise(0L)).as("exact_inter"))
      val exactPer = hashed.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("nd"))
        .groupBy()
        .agg(max(when($"event_type" === "click", $"nd")).as("exact_click"),
          max(when($"event_type" === "purchase", $"nd")).as("exact_purchase"))
      def est(c: org.apache.spark.sql.Column) =
        when(size(c) < k, size(c).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(c, k).cast("double") / lit(graft.ext.TextOps.HashMod.toDouble)))
      ka.crossJoin(broadcast(kb))
        .crossJoin(broadcast(exacts)).crossJoin(broadcast(exactPer))
        .withColumn("uk", expr(s"slice(array_sort(array_distinct(concat(ka, kb))), 1, $k)"))
        .withColumn("shared", expr(
          "size(filter(uk, x -> array_contains(ka, x) AND array_contains(kb, x)))").cast("long"))
        .withColumn("union_est", est($"uk"))
        .select(
          lit(k.toLong).as("k"),
          est($"ka").as("est_click"), $"exact_click",
          est($"kb").as("est_purchase"), $"exact_purchase",
          $"union_est", $"exact_union",
          (($"shared".cast("double") * $"union_est") / lit(k.toDouble)).as("inter_est"),
          $"exact_inter")
  }

  /** q148 sketch size. 1/sqrt(64) ~ 12% standard error — small enough to
    * be meaningful, small enough that the per-row fast path dominates. */
  val KmvK = 64

  val oracles: Map[String, String] = Map(
    "q24_session_window" -> s"""
      WITH marked AS (
        SELECT user_id, ts, value,
          CASE WHEN LAG(ts) OVER w IS NULL
                 OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts, value,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
      SELECT user_id,
        CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS ss,
        CAST(FLOOR(epoch(MAX(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS se,
        COUNT(*) AS n, ${SUMD("value")} AS total_value
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, ss""",

    // The audit itself is Spark-side (the sketch is engine-specific); the
    // oracle checks the exact quantiles and the audit's passed marker.
    "q92_approx_percentile_bound" -> """
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.95) AS p95,
        CAST(1 AS BIGINT) AS sketch_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q34_percentile" -> """
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.95) AS p95,
        quantile_cont(l_extendedprice, 0.25) AS price_p25,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q36_pivot" -> {
      def cell(st: String) = s"""
        COUNT(*) FILTER (WHERE o_orderstatus = '$st') AS "${st}_n",
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             FILTER (WHERE o_orderstatus = '$st') AS DOUBLE) AS "${st}_tp""""
      s"""
      SELECT o_orderpriority,
        ${Seq("F", "O", "P").map(cell).mkString(",")}
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""
    },

    "q37_unpivot" -> """
      SELECT l_orderkey, l_linenumber, m.metric, m.value
      FROM lineitem,
        LATERAL (
          SELECT 'l_quantity' AS metric, l_quantity AS value
          UNION ALL SELECT 'l_discount', l_discount
          UNION ALL SELECT 'l_tax', l_tax) m
      WHERE l_orderkey <= 500
      ORDER BY l_orderkey, l_linenumber, m.metric""",

    "q39_gap_fill" -> s"""
      WITH ev AS (
        SELECT user_id, date_trunc('hour', ts) AS hr, value
        FROM events WHERE user_id <= 50),
      hourly AS (
        SELECT user_id, hr, COUNT(*) AS n, ${SUMD("value")} AS total_value
        FROM ev GROUP BY user_id, hr),
      axis AS (
        SELECT user_id, unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr
        FROM ev GROUP BY user_id)
      SELECT a.user_id, CAST(FLOOR(epoch(a.hr)) AS BIGINT) AS hr_ts,
        COALESCE(h.n, 0) AS n, COALESCE(h.total_value, 0.0) AS total_value
      FROM axis a LEFT JOIN hourly h ON a.user_id = h.user_id AND a.hr = h.hr
      ORDER BY a.user_id, hr_ts""",

    "q38_map_ops" -> """
      WITH flat AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority, o_orderstatus)
      SELECT o_orderpriority, o_orderstatus, cnt,
        CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n_statuses
      FROM flat
      ORDER BY o_orderpriority, o_orderstatus""",

    "q35_edit_distance" -> """
      SELECT p_partkey,
        CAST(levenshtein(p_name, p_type) AS BIGINT) AS name_type_dist,
        CAST(levenshtein(p_name, p_brand) AS BIGINT) AS name_brand_dist
      FROM part
      WHERE p_partkey <= 500
      ORDER BY p_partkey""",

    "q25_weighted_avg" -> s"""
      SELECT l_returnflag,
        ${SUMD("l_extendedprice * l_quantity")} / ${SUMD("l_quantity")} AS wavg
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // Replays the KMV sketches declaratively (DISTINCT hash ORDER BY
    // LIMIT k — the set-function definition the Aggregator computes
    // incrementally), then the identical union/intersection arithmetic.
    "q148_kmv_sketch" -> {
      val k = KmvK
      val mod = graft.ext.TextOps.HashMod
      def estSql(c: String) =
        s"""CASE WHEN len($c) < $k THEN len($c)::DOUBLE
             ELSE ${k - 1}::DOUBLE / ($c[$k]::DOUBLE / $mod::DOUBLE) END"""
      s"""
      WITH h AS (
        SELECT event_type, user_id,
          ${graft.ext.TextOps.polyHashSql("(CAST(user_id AS VARCHAR) || '/kmv-pad')")} AS hv
        FROM events WHERE event_type IN ('click', 'purchase') AND value > 80),
      ka_ AS (SELECT coalesce(list(hv ORDER BY hv), []::BIGINT[]) AS ka FROM
        (SELECT DISTINCT hv FROM h WHERE event_type = 'click' ORDER BY hv LIMIT $k)),
      kb_ AS (SELECT coalesce(list(hv ORDER BY hv), []::BIGINT[]) AS kb FROM
        (SELECT DISTINCT hv FROM h WHERE event_type = 'purchase' ORDER BY hv LIMIT $k)),
      ex AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_union,
          CAST(count(*) FILTER (WHERE nt = 2) AS BIGINT) AS exact_inter
        FROM (SELECT user_id, count(DISTINCT event_type) AS nt FROM h GROUP BY user_id)),
      ep AS (SELECT
        (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM h
          WHERE event_type = 'click') AS exact_click,
        (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM h
          WHERE event_type = 'purchase') AS exact_purchase),
      u AS (SELECT ka, kb,
          list_sort(list_distinct(list_concat(ka, kb)))[1:$k] AS uk
        FROM ka_, kb_),
      c AS (SELECT *,
          len(list_filter(uk, x -> list_contains(ka, x) AND list_contains(kb, x)))::BIGINT
            AS shared,
          ${estSql("uk")} AS union_est
        FROM u)
      SELECT CAST($k AS BIGINT) AS k,
        ${estSql("ka")} AS est_click, exact_click,
        ${estSql("kb")} AS est_purchase, exact_purchase,
        union_est, exact_union,
        (CAST(shared AS DOUBLE) * union_est) / CAST($k AS DOUBLE) AS inter_est,
        exact_inter
      FROM c, ex, ep"""
    },

    "q26_array_agg" -> """
      SELECT o_orderpriority,
        array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses_str,
        CAST(len(list_sort(list(DISTINCT o_orderstatus))) AS BIGINT) AS n_statuses,
        list_sort(list(DISTINCT o_orderstatus))[1] AS first_status,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q28_salted_agg" -> s"""
      SELECT l_returnflag,
        ${SUMD("l_extendedprice * (1.0 - l_discount)")} AS total,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // q29: the estimate is engine-specific, but the exact count and the
    // in-query bound flag are deterministic — `within_bound` is literally
    // true on the oracle side because the Spark side raise_errors otherwise.
    "q29_approx_distinct" -> """
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_parts,
        true AS within_bound
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // The plain join the salt-replicated plan must be indistinguishable
    // from.
    "q108_salted_join" -> s"""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        ${SUMD("value")} AS total
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'purchase'
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q27_posexplode" -> """
      SELECT p_partkey, CAST(g.i - 1 AS BIGINT) AS pos, w.word AS word,
        CAST(length(w.word) AS BIGINT) AS wlen
      FROM part,
        LATERAL (SELECT string_split(p_name, ' ') AS ws) s,
        LATERAL (SELECT unnest(range(1, len(s.ws)+1)) AS i) g,
        LATERAL (SELECT s.ws[g.i] AS word) w
      WHERE p_partkey <= 200
      ORDER BY p_partkey, pos"""
  )
}
