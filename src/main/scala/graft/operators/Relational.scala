package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational query surface (SURVEY.md §2.2).
  *
  * The reference (chenm11/mysql-hbase-replicator) delegates all SQL to
  * Spark-on-HBase ("Astro", imports at `HbaseApplier.scala:15-16`); the rebuild
  * provides the same capability natively on modern Spark SQL. Every query here
  * has a DuckDB oracle in [[oracles]].
  *
  * Numeric-parity convention (so result hashes match the DuckDB oracle):
  * per-row arithmetic stays in DOUBLE (IEEE ops are bit-identical across
  * engines), each term is cast to DECIMAL(18,6) *before* SUM (exact,
  * order-independent — Spark's partial-agg order differs from DuckDB's), and
  * the final value is cast back to DOUBLE. At 100 TB this is also the right
  * call: decimal sums don't drift with partition count.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private def dec(c: Column): Column = graft.util.Sumd.dec(c)
  private def sumd(c: Column): Column = graft.util.Sumd.sumd(c)
  private def SUMD(e: String): String = graft.util.Sumd.SUMD(e)
  private def ts(s: String): Column = lit(s).cast("timestamp")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation: hash agg, partial+final, multiple measures (TPC-H Q1 shape)
    "q01_agg_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= ts("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumd($"l_quantity").as("sum_qty"),
          sumd($"l_extendedprice").as("sum_base_price"),
          sumd($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          sumd($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          (sumd($"l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- filter + projection pushdown, single-row agg (TPC-H Q6 shape)
    "q02_filter_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1997-01-01") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(sumd($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape); customer side broadcastable
    "q03_join_topk" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val o = t(s, dir, "orders").filter($"o_orderdate" < ts("1998-01-01"))
      val l = t(s, dir, "lineitem").filter($"l_shipdate" > ts("1998-01-01"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderpriority")
        .agg(sumd($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(20)
    }),

    // ---- left-semi join (EXISTS)
    "q04_semi_join" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem").filter($"l_quantity" > 45).select($"l_orderkey")
      t(s, dir, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    // ---- left-anti join (NOT EXISTS)
    "q05_anti_join" -> ((s, dir) => {
      import s.implicits._
      val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
      t(s, dir, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // ---- distinct aggregation
    "q06_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    // ---- window: ranking, top-k per group
    "q07_window_topk" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"c_mktsegment", $"rnk", $"c_custkey", $"c_acctbal")
        .orderBy($"c_mktsegment", $"rnk")
    }),

    // ---- window: running sum + lag/lead over frames
    "q08_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .filter($"o_custkey" < 50)
        .withColumn("running_total",
          sum(dec($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("next_price", lead($"o_totalprice", 1).over(w))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"running_total", $"prev_price", $"next_price")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // ---- rollup
    "q09_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sumd($"l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // ---- cube
    "q10_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(sumd($"o_totalprice").as("total"), count(lit(1)).as("n_rows"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // ---- set operations: union distinct / intersect / except, tagged
    "q11_setops" -> ((s, dir) => {
      import s.implicits._
      val a = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
      val b = t(s, dir, "orders").filter($"o_orderstatus" === "F").select($"o_custkey".as("k"))
      val u = a.union(b).distinct().withColumn("op", lit("union"))
      val i = a.intersect(b).withColumn("op", lit("intersect"))
      val e = a.except(b).withColumn("op", lit("except"))
      u.union(i).union(e).select($"op", $"k").orderBy($"op", $"k")
    }),

    // ---- q204: window-function OMNIBUS — every remaining SQL window
    //      primitive the surface hadn't individually gated (rank,
    //      dense_rank, ntile, cume_dist, nth_value, first/last over the
    //      full frame, lag/lead with defaults), all in one per-priority
    //      window pass over a UNIQUE (price, key) order so every result
    //      is deterministic. The output filter applies AFTER the windows
    //      (a row subset of the full computation — both engines
    //      identically). One exchange on the partition key.
    "q204_window_omnibus" -> ((s, dir) => {
      import s.implicits._
      val wb = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      val wf = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .withColumn("rnk", rank().over(wb).cast("long"))
        .withColumn("drnk", dense_rank().over(wb).cast("long"))
        .withColumn("tile", ntile(4).over(wb).cast("long"))
        .withColumn("cd", cume_dist().over(wb))
        .withColumn("nth2", nth_value($"o_orderkey", 2).over(wf))
        .withColumn("fv", first($"o_orderkey").over(wf))
        .withColumn("lv", last($"o_orderkey").over(wf))
        .withColumn("lg", lag($"o_orderkey", 1, -1L).over(wb))
        .withColumn("ld", lead($"o_orderkey", 1, -1L).over(wb))
        .filter($"o_orderkey" % 23 === 0)
        .drop($"o_totalprice")
        .repartition(1).sortWithinPartitions($"o_orderkey")
    }),

    // ---- q205: BAG-semantics set operations — q11 covers the DISTINCT
    //      forms; EXCEPT ALL / INTERSECT ALL are the multiset forms
    //      (multiplicity arithmetic: max(m-n, 0) and min(m, n) per key)
    //      that reconciliation queries actually need (how many copies
    //      survive, not whether any does). Spark plans both as
    //      count-annotated joins — no row explosion; the report groups
    //      the result multiset back to (key, cnt).
    "q205_bag_setops" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val a = li.filter($"l_quantity" > 25).select($"l_orderkey".as("k"))
      val b = li.filter($"l_extendedprice" > 30000).select($"l_orderkey".as("k"))
      def report(df: DataFrame, op: String): DataFrame =
        df.groupBy($"k").agg(count(lit(1)).as("cnt"))
          .select(lit(op).as("op"), $"k", $"cnt")
      report(a.exceptAll(b), "except_all")
        .unionByName(report(a.intersectAll(b), "intersect_all"))
        .filter($"k" % 7 === 0)
        .repartition(1).sortWithinPartitions($"op", $"k")
    }),

    // ---- q206: string-function OMNIBUS — the scalar-string surface
    //      beyond q13/q35 (pad, reverse, repeat, split_part, translate,
    //      position), one narrow projection, no shuffle. Functions chosen
    //      for cross-engine identical semantics (no locale-dependent
    //      casing beyond ASCII upper, no collation).
    "q206_string_omnibus" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_partkey" % 11 === 0)
        .select($"p_partkey", $"p_name",
          upper($"p_name").as("up"),
          lpad($"p_name", 16, "*").as("lp"),
          rpad($"p_name", 16, ".").as("rp"),
          reverse($"p_name").as("rev"),
          repeat(substring($"p_name", 1, 3), 2).as("rep"),
          split_part($"p_name", lit(" "), lit(2)).as("sp"),
          translate($"p_name", "aeiou", "12345").as("tr"),
          instr($"p_name", "e").cast("long").as("pos_e"))
        .repartition(1).sortWithinPartitions($"p_partkey")
    }),

    // ---- q207: date/time OMNIBUS — the calendar surface beyond q14
    //      (field extraction, ISO week, month clamping, day arithmetic),
    //      all computed on the DATE cast of the timestamp so no
    //      timezone/locale semantics are in play. dayofweek is
    //      normalized to Spark's 1=Sunday convention on the oracle side
    //      (DuckDB's dayofweek is 0=Sunday); add_months exercises the
    //      end-of-month clamp both engines apply. Narrow projection, no
    //      shuffle.
    "q207_date_omnibus" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" % 29 === 0)
        .select($"o_orderkey", $"o_orderdate".cast("date").as("d"))
        .select($"o_orderkey", $"d",
          year($"d").cast("long").as("y"),
          quarter($"d").cast("long").as("q"),
          month($"d").cast("long").as("m"),
          dayofmonth($"d").cast("long").as("dom"),
          dayofweek($"d").cast("long").as("dow"),
          weekofyear($"d").cast("long").as("iso_week"),
          last_day($"d").as("eom"),
          add_months($"d", 1).as("next_m"),
          datediff($"d", lit("1995-01-01").cast("date")).cast("long").as("days_since"))
        .repartition(1).sortWithinPartitions($"o_orderkey")
    }),

    // ---- q208: array higher-order-function OMNIBUS — transform /
    //      filter / exists / forall / aggregate / zip_with / slice /
    //      sort / position in one narrow projection over the words
    //      array (the HOF surface the ext operators lean on, gated
    //      directly). All integer/string arithmetic; the zip_with sum
    //      reduces to Σ len(w_i)·i, which the oracle states directly —
    //      identical integers either way. array_position's 0-for-absent
    //      matches coalesce(list_position, 0).
    "q208_array_omnibus" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter($"doc_id" % 13 === 0)
        .select($"doc_id",
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ws"))
        .select($"doc_id",
          size($"ws").cast("long").as("nw"),
          expr("cast(size(filter(ws, w -> length(w) > 4)) as bigint)").as("n_long"),
          expr("exists(ws, w -> length(w) = 5)").as("has5"),
          expr("forall(ws, w -> length(w) <= 8)").as("all_short"),
          expr("aggregate(zip_with(transform(ws, w -> length(w)), " +
            "sequence(1, size(ws)), (a, b) -> cast(a * b as bigint)), " +
            "cast(0 as bigint), (acc, x) -> acc + x)").as("zsum"),
          expr("cast(array_position(ws, 'the') as bigint)").as("pos_the"),
          expr("array_join(slice(array_sort(array_distinct(ws)), 1, 3), ',')")
            .as("first3"))
        .repartition(1).sortWithinPartitions($"doc_id")
    }),

    // ---- q209: GROUPING()/GROUPING_ID() over CUBE — the subtotal-row
    //      disambiguation q09/q10/q18 stop short of (a NULL group value
    //      is ambiguous between "the NULL group" and "the subtotal row";
    //      grouping flags are the standard answer). Both engines put the
    //      first cube column in the high bit.
    "q209_grouping_id" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(grouping($"l_returnflag").cast("long").as("g_rf"),
          grouping($"l_linestatus").cast("long").as("g_ls"),
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"))
        .repartition(1).sortWithinPartitions($"gid", $"l_returnflag", $"l_linestatus")
    }),

    // ---- global sort + limit (top-k)
    "q12_sort_limit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .limit(50)
    }),

    // ---- q139: parquet FOOTER aggregation — count/min/max answered from
    //      row-group statistics alone (spark.sql.parquet.aggregatePushdown;
    //      the plan's scan shows PushedAggregation and reads NO data
    //      pages). At 100 TB this is the difference between a metadata
    //      pass and a table scan for the stats queries every catalog runs;
    //      the conf is scoped to this query because pushed aggregates
    //      bypass the usual row pipeline.
    "q139_footer_agg" -> ((s, dir) => {
      import s.implicits._
      // Footer aggregation needs the V2 parquet source (the V1 reader has
      // no aggregate pushdown) — both confs scoped to this query; the
      // aggregate sticks to count + min/max over plain numeric columns,
      // the class the pushdown supports.
      val prevAgg = s.conf.getOption("spark.sql.parquet.aggregatePushdown")
      val prevV1 = s.conf.getOption("spark.sql.sources.useV1SourceList")
      s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      s.conf.set("spark.sql.sources.useV1SourceList", "")
      try {
        val df = s.read.parquet(s"$dir/lineitem.parquet")
          .agg(count(lit(1)).as("n"),
            min($"l_orderkey").as("min_ok"), max($"l_orderkey").as("max_ok"),
            min($"l_extendedprice").as("min_px"), max($"l_extendedprice").as("max_px"))
        // materialize the 1-row answer NOW, inside the conf scope
        val row = df.collect()
        s.createDataFrame(java.util.Arrays.asList(row: _*), df.schema)
      } finally {
        def restore(k: String, v: Option[String]): Unit =
          v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
        restore("spark.sql.parquet.aggregatePushdown", prevAgg)
        restore("spark.sql.sources.useV1SourceList", prevV1)
      }
    }),

    // ---- scalar functions: string / math
    "q13_scalar_string" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          $"p_partkey",
          upper($"p_name").as("name_up"),
          substring($"p_type", 1, 3).as("type3"),
          length($"p_name").cast("long").as("name_len"),
          concat($"p_brand", lit("-"), $"p_type").as("brand_type"),
          abs($"p_size" - 25).as("size_dist"),
          ($"p_size" % 7).as("size_mod"),
          floor($"p_retailprice").as("price_floor"),
          regexp_replace($"p_name", " ", "_").as("name_us"))
        .orderBy($"p_partkey")
    }),

    // ---- scalar functions: date/time
    "q14_scalar_date" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" < 500)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("d"),
          quarter($"o_orderdate").cast("long").as("q"),
          datediff($"o_orderdate", ts("1995-01-01")).cast("long").as("days_since"),
          date_trunc("month", $"o_orderdate").as("month_start"))
        .orderBy($"o_orderkey")
    }),

    // ---- range join (equi key + date-range predicate)
    "q15_range_join" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sumd($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"o_orderpriority")
    }),

    // ---- theta/band join on a numeric band, small side broadcast
    "q16_band_join" -> ((s, dir) => {
      import s.implicits._
      val sup = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      cust.join(broadcast(sup), $"s_nationkey" === $"c_nationkey" &&
          abs($"s_acctbal" - $"c_acctbal") < 1000.0)
        .join(broadcast(nat), $"n_nationkey" === $"s_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"n_name")
    }),

    // ---- as-of join: each purchase matched to the user's latest click at-or-before it.
    // Implemented shuffle-once via union + window (scales: one shuffle on user_id,
    // no range-cross-product), exactly the plan a 100 TB as-of needs.
    "q17_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").filter($"event_type".isin("click", "purchase"))
      val tagged = ev.select($"user_id", $"ts", $"event_id", $"value", $"event_type",
        when($"event_type" === "purchase", 1).otherwise(0).as("is_l"),
        when($"event_type" === "click", $"event_id").as("click_id"))
      // right rows (is_l=0) sort before left rows at equal ts → "<=" as-of semantics
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"is_l", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      tagged
        .withColumn("matched_click", last($"click_id", ignoreNulls = true).over(w))
        .filter($"is_l" === 1)
        .select($"event_id", $"user_id", $"value", $"matched_click")
        .orderBy($"event_id")
    }),

    // ---- grouping sets (via SQL)
    "q18_grouping_sets" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority,
               ${SUMD("o_totalprice")} AS total, COUNT(*) AS n_rows
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    }),

    // ---- scalar subquery (decorrelated by Catalyst)
    "q19_scalar_subquery" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql(s"""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT ${SUMD("o_totalprice")} / COUNT(*) FROM orders)
        ORDER BY o_orderkey""")
    }),

    // ---- correlated EXISTS (planned as semi join)
    "q20_exists" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F' AND o.o_totalprice > 150000)
        ORDER BY c_custkey""")
    }),

    // ---- outer join preserving unmatched rows
    "q21_outer_join" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      n.join(c, $"c_nationkey" === $"n_nationkey", "left_outer")
        .groupBy($"n_name")
        .agg(count($"c_custkey").as("n_cust"), sumd(coalesce($"c_acctbal", lit(0.0))).as("bal"))
        .orderBy($"n_name")
    }),

    // ---- event-time tumbling window aggregation (batch form; the streaming
    //      variant with watermarks lives in graft.streaming.StreamingPipeline)
    "q22_time_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sumd($"value").as("total_value"))
        .select(unix_timestamp($"window.start").as("ws"), $"event_type", $"n", $"total_value")
        .orderBy($"ws", $"event_type")
    }),

    // ---- SQL-TEXT entry point (SURVEY §3 EP3: SQL over replicated data —
    //      the reference delegates exactly this to Spark SQL). The ONE
    //      shared ANSI string below runs verbatim through `spark.sql` here
    //      and through DuckDB as its own oracle, proving the dialect-common
    //      surface end-to-end: 3-table join, filter, aggregation with the
    //      decimal-exact SUMD casts. Catalyst plans it identically to the
    //      DataFrame form (same pushdown/broadcast/partial-agg).
    "q63_sql_surface" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(tn => Tables.load(s, dir, tn).createOrReplaceTempView(tn))
      s.sql(SqlSurfaceText)
    }),

    // ---- q187: WITH RECURSIVE (SQL:1999 recursive CTE, Spark 4's
    //      UnionLoop) — the hierarchy-walk member of the SQL-text surface
    //      next to q63's joins/aggs and q145's LATERAL: every doc's
    //      ancestor chain under parent(n) = n div 2, reporting chain
    //      depth and path sum. One shared text modulo the integer-
    //      division token (see [[RecursiveCteText]]); iteration state is
    //      only the recursing frontier and the loop runs log2(max id)
    //      steps — linear total work, no joins at all.
    "q187_recursive_cte" -> ((s, dir) => {
      Tables.load(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(RecursiveCteText("div"))
    }),

    // ---- q145: LATERAL correlated subquery (SQL:1999, the per-row
    //      dependent join Spark added in 3.2) — per-customer top-2 orders
    //      by price, the dependent-top-k idiom ORDER BY/LIMIT inside a
    //      plain join cannot express. One SQL text, two engines (q63's
    //      discipline). Catalyst decorrelates the lateral into a
    //      window-rank over the orders side — per-key state, never a
    //      per-customer re-scan — which is what makes the construct safe
    //      at 100 TB (the naive reading is one subquery execution per
    //      outer row).
    "q145_lateral_topk" -> ((s, dir) => {
      Seq("customer", "orders")
        .foreach(tn => Tables.load(s, dir, tn).createOrReplaceTempView(tn))
      s.sql(LateralTopkText)
    }),

    // ---- q147: runtime bloom-filter join pruning — the selective-dim
    //      shuffle join with Spark's runtime filter active (the
    //      application-side scan threshold is 10 GB by default, so the
    //      test-scale query lowers it, scoped; at 100 TB the default
    //      engages by itself). The gate proves the pruning is semantically
    //      invisible: same plain-join oracle. Materialized inside the conf
    //      scope (q139's discipline) because injection happens at
    //      optimization time.
    "q147_bloom_join" -> ((s, dir) => {
      val df = withBloomConfs(s) {
        val df = bloomJoinPlan(s, dir).orderBy(col("o_orderpriority"))
        val rows = df.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      }
      df
    })
  )

  /** q147's conf scope: the injection rule refuses when either join side is
    * broadcast-able by size (`isProbablyShuffleJoin`) or the fact scan is
    * under the 10 GB application threshold — both true at test scale and
    * both false in the 100 TB regime the filter exists for. Pin that
    * regime, scoped, and restore. */
  private[graft] def withBloomConfs[T](s: SparkSession)(body: => T): T = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(x)) => s.conf.set(k, x)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** q147's core plan, conf-independent: a shuffle join whose dimension
    * side carries a selective predicate — the shape Spark's runtime
    * bloom-filter injection (SPARK-32268) prunes by building a bloom
    * filter over the filtered dim keys and applying `might_contain` to the
    * fact scan BEFORE the shuffle. At 100 TB this is the difference
    * between shuffling the whole fact table and shuffling the ~priority
    * fraction of it. The merge hint pins the shuffle-join regime (a
    * broadcast join would prune via its own hash table; runtime filters
    * exist for the both-sides-too-big case). Factored so the PlanSpec can
    * rebuild the plan inside its own conf scope. */
  private[graft] def bloomJoinPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderkey", $"o_orderpriority")
    val li = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.hint("merge").join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sumd($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  /** q145's shared text: Spark executes it verbatim, DuckDB oracles it. */
  val LateralTopkText: String = s"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    ON true
    WHERE c.c_custkey % 10 = 0
    ORDER BY c.c_custkey, o.o_orderkey"""

  /** q187's shared text, parameterized ONLY by the integer-division
    * spelling (Spark `div`, DuckDB `//` — there is no common token): the
    * ancestor chain of every doc under the halving hierarchy parent(n) =
    * n/2, linearly recursed to the root. Spark 4's WITH RECURSIVE plans
    * this as UnionLoop — each iteration is one distributed step over the
    * frontier (rows still recursing), state never exceeds the frontier,
    * and the loop depth is log2(max id) — the transitive-closure /
    * hierarchy-walk member of the SQL-text surface (q63, q145). */
  def RecursiveCteText(intDiv: String): String = s"""
    WITH RECURSIVE anc(node, cur, depth) AS (
      SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents
      UNION ALL
      SELECT node, cur $intDiv 2, depth + 1 FROM anc WHERE cur > 0)
    SELECT node, CAST(max(depth) AS BIGINT) AS depth,
      CAST(sum(cur) AS BIGINT) AS path_sum
    FROM anc GROUP BY node ORDER BY node"""

  /** One SQL text, two engines (q63): Spark executes it, DuckDB oracles it. */
  val SqlSurfaceText: String = s"""
    SELECT c_mktsegment, o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      ${SUMD("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'F'
    GROUP BY c_mktsegment, o_orderpriority
    ORDER BY c_mktsegment, o_orderpriority"""

  val oracles: Map[String, String] = Map(
    // the SAME text with DuckDB's // integer division
    "q187_recursive_cte" -> RecursiveCteText("//"),

    "q01_agg_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${SUMD("l_quantity")} AS sum_qty,
        ${SUMD("l_extendedprice")} AS sum_base_price,
        ${SUMD("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${SUMD("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${SUMD("l_quantity")} / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_agg" -> s"""
      SELECT ${SUMD("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q03_join_topk" -> s"""
      SELECT l_orderkey, o_orderpriority,
        ${SUMD("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 20""",

    "q04_semi_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q05_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",

    "q06_distinct_agg" -> """
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q07_window_topk" -> """
      SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer) x
      WHERE rnk <= 3
      ORDER BY c_mktsegment, rnk""",

    "q08_window_running" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders
      WHERE o_custkey < 50
      ORDER BY o_custkey, o_orderkey""",

    "q09_rollup" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${SUMD("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q10_cube" -> s"""
      SELECT o_orderstatus, o_orderpriority,
        ${SUMD("o_totalprice")} AS total, COUNT(*) AS n_rows
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    // Identical window set over the same unique order; subset filter after.
    "q204_window_omnibus" -> """
      SELECT o_orderkey, o_orderpriority, rnk, drnk, tile, cd, nth2, fv, lv,
        lg, ld
      FROM (
        SELECT o_orderkey, o_orderpriority,
          CAST(rank() OVER wb AS BIGINT) AS rnk,
          CAST(dense_rank() OVER wb AS BIGINT) AS drnk,
          CAST(ntile(4) OVER wb AS BIGINT) AS tile,
          cume_dist() OVER wb AS cd,
          nth_value(o_orderkey, 2) OVER wf AS nth2,
          first_value(o_orderkey) OVER wf AS fv,
          last_value(o_orderkey) OVER wf AS lv,
          lag(o_orderkey, 1, -1) OVER wb AS lg,
          lead(o_orderkey, 1, -1) OVER wb AS ld
        FROM orders
        WINDOW wb AS (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey),
          wf AS (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) x
      WHERE o_orderkey % 23 = 0
      ORDER BY o_orderkey""",

    // Same multisets, the engine's EXCEPT ALL / INTERSECT ALL, regrouped.
    "q205_bag_setops" -> """
      WITH a AS (SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 25),
      b AS (SELECT l_orderkey AS k FROM lineitem WHERE l_extendedprice > 30000),
      ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
      ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
      r AS (
        SELECT 'except_all' AS op, k, CAST(count(*) AS BIGINT) AS cnt
        FROM ea GROUP BY k
        UNION ALL
        SELECT 'intersect_all', k, CAST(count(*) AS BIGINT) FROM ia GROUP BY k)
      SELECT op, k, cnt FROM r WHERE k % 7 = 0 ORDER BY op, k""",

    // Same scalar chain; strpos ≡ instr for the first-occurrence position.
    "q206_string_omnibus" -> """
      SELECT p_partkey, p_name,
        upper(p_name) AS up,
        lpad(p_name, 16, '*') AS lp,
        rpad(p_name, 16, '.') AS rp,
        reverse(p_name) AS rev,
        repeat(substring(p_name, 1, 3), 2) AS rep,
        split_part(p_name, ' ', 2) AS sp,
        translate(p_name, 'aeiou', '12345') AS tr,
        CAST(strpos(p_name, 'e') AS BIGINT) AS pos_e
      FROM part
      WHERE p_partkey % 11 = 0
      ORDER BY p_partkey""",

    // Same field extraction; dayofweek normalized to 1=Sunday; isodow-week
    // via DuckDB's ISO weekofyear; interval-month addition clamps like
    // add_months.
    "q207_date_omnibus" -> """
      SELECT o_orderkey, d,
        CAST(year(d) AS BIGINT) AS y,
        CAST(quarter(d) AS BIGINT) AS q,
        CAST(month(d) AS BIGINT) AS m,
        CAST(day(d) AS BIGINT) AS dom,
        CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        CAST(weekofyear(d) AS BIGINT) AS iso_week,
        last_day(d) AS eom,
        CAST(d + INTERVAL 1 MONTH AS DATE) AS next_m,
        CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS days_since
      FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
            WHERE o_orderkey % 29 = 0) x
      ORDER BY o_orderkey""",

    // list_* equivalents; the zip_with sum stated directly as Σ len·i.
    "q208_array_omnibus" -> """
      WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS W
        FROM documents WHERE doc_id % 13 = 0)
      SELECT doc_id,
        CAST(len(W) AS BIGINT) AS nw,
        CAST(len(list_filter(W, w -> length(w) > 4)) AS BIGINT) AS n_long,
        len(list_filter(W, w -> length(w) = 5)) > 0 AS has5,
        len(list_filter(W, w -> length(w) > 8)) = 0 AS all_short,
        CAST(list_reduce(list_prepend(0::BIGINT,
          list_transform(range(1, len(W) + 1), i -> length(W[i])::BIGINT * i)),
          (acc, x) -> acc + x) AS BIGINT) AS zsum,
        CAST(coalesce(list_position(W, 'the'), 0) AS BIGINT) AS pos_the,
        array_to_string(list_sort(list_distinct(W))[1:3], ',') AS first3
      FROM d ORDER BY doc_id""",

    // Same cube with the standard first-column-MSB grouping flags.
    "q209_grouping_id" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""",

    "q11_setops" -> """
      WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
           b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      UNION ALL
      SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      UNION ALL
      SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      ORDER BY op, k""",

    "q139_footer_agg" -> """
      SELECT CAST(count(*) AS BIGINT) AS n,
        min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px
      FROM lineitem""",

    "q12_sort_limit" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 50""",

    "q13_scalar_string" -> """
      SELECT p_partkey,
        UPPER(p_name) AS name_up,
        SUBSTRING(p_type, 1, 3) AS type3,
        CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        CONCAT(p_brand, '-', p_type) AS brand_type,
        ABS(p_size - 25) AS size_dist,
        p_size % 7 AS size_mod,
        CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        REPLACE(p_name, ' ', '_') AS name_us
      FROM part
      ORDER BY p_partkey""",

    "q14_scalar_date" -> """
      SELECT o_orderkey,
        CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        CAST(MONTH(o_orderdate) AS BIGINT) AS m,
        CAST(DAY(o_orderdate) AS BIGINT) AS d,
        CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
        CAST(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        DATE_TRUNC('month', o_orderdate) AS month_start
      FROM orders
      WHERE o_orderkey < 500
      ORDER BY o_orderkey""",

    "q15_range_join" -> s"""
      SELECT o_orderpriority, COUNT(*) AS n_lines,
        ${SUMD("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q16_band_join" -> """
      SELECT n_name, COUNT(*) AS n_pairs
      FROM customer
      JOIN supplier ON s_nationkey = c_nationkey AND ABS(s_acctbal - c_acctbal) < 1000.0
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    "q17_asof_join" -> """
      WITH ev AS (
        SELECT user_id, ts, event_id, value, event_type,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_l,
          CASE WHEN event_type = 'click' THEN event_id END AS click_id
        FROM events WHERE event_type IN ('click', 'purchase'))
      SELECT event_id, user_id, value, matched_click FROM (
        SELECT event_id, user_id, value, is_l,
          LAST_VALUE(click_id IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, is_l, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_click
        FROM ev) x
      WHERE is_l = 1
      ORDER BY event_id""",

    "q18_grouping_sets" -> s"""
      SELECT o_orderstatus, o_orderpriority,
        ${SUMD("o_totalprice")} AS total, COUNT(*) AS n_rows
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q19_scalar_subquery" -> s"""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 1.5 * (SELECT ${SUMD("o_totalprice")} / COUNT(*) FROM orders)
      ORDER BY o_orderkey""",

    "q20_exists" -> """
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F' AND o.o_totalprice > 150000)
      ORDER BY c_custkey""",

    "q21_outer_join" -> s"""
      SELECT n_name, COUNT(c_custkey) AS n_cust,
        ${SUMD("COALESCE(c_acctbal, 0.0)")} AS bal
      FROM nation
      LEFT JOIN customer ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    "q22_time_window" -> s"""
      SELECT CAST(epoch(DATE_TRUNC('hour', ts)) AS BIGINT) AS ws, event_type,
        COUNT(*) AS n, ${SUMD("value")} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY ws, event_type""",

    // the SAME string Spark executes — the whole point of q63
    "q63_sql_surface" -> SqlSurfaceText,
    "q145_lateral_topk" -> LateralTopkText,

    // The plain join the bloom-pruned plan must be indistinguishable from.
    "q147_bloom_join" -> s"""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        ${SUMD("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""
  )
}
