package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate-view maintenance (IVM) over the CDC envelope —
  * the natural composition of the replication pipeline (SURVEY §2.1) with
  * the query surface (§2.2): instead of replaying the base table and
  * re-aggregating, each change batch folds its insert/update/delete
  * CONTRIBUTIONS into a (key, cnt, sum) view:
  *
  *   insert  → (after.key,  +1, +after.value)
  *   delete  → (before.key, -1, -before.value)
  *   update  → BOTH rows — (-before) and (+after) — which handles
  *             group-moving updates (the key column itself changed) for
  *             free: the old group loses the row, the new group gains it.
  *
  * SUM/COUNT are self-maintainable aggregates (no base-table access, any
  * delta order); the sums run in the engine-wide DECIMAL(18,6) convention,
  * so +x added by an insert and -x removed by a later delete cancel
  * EXACTLY — a double accumulator would drift per round-off and the view
  * would diverge from a fresh aggregation over time.
  *
  * Scale shape: a delta is one partial+final hash aggregate over the
  * batch (tiny output: touched keys only); the merge is a key-equi
  * full-outer join of two aggregate-sized frames. In the streaming
  * pipeline this runs inside `foreachBatch` with the view stored like any
  * bucketed target; here the fold is expressed over batch frames so the
  * algebra is testable standalone.
  */
object IncrementalView {

  /** One change batch's per-key (count, sum) contribution. */
  def delta(batch: DataFrame, key: String, value: String): DataFrame = {
    def c(img: String, sgn: Int) = struct(
      col(s"$img.$key").as("k"), lit(sgn).as("sgn"), col(s"$img.$value").as("v"))
    batch.select(explode(
        when(col("op") === "insert", array(c("after", 1)))
          .when(col("op") === "delete", array(c("before", -1)))
          .otherwise(array(c("before", -1), c("after", 1)))).as("ct"))
      .select(col("ct.k").as(key), col("ct.sgn").as("sgn"),
        graft.util.Sumd.dec(col("ct.v")).as("v"))
      .groupBy(col(key))
      .agg(sum(col("sgn")).cast("long").as("cnt"),
        sum(col("sgn") * col("v")).cast(DecimalType(28, 6)).as("sum"))
  }

  /** Merge two (key, cnt, sum) frames — associative, so any grouping of
    * batch deltas yields the same view. */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val zero = lit(0).cast(DecimalType(28, 6))
    a.withColumnRenamed("cnt", "cnt_a").withColumnRenamed("sum", "sum_a")
      .join(b.withColumnRenamed("cnt", "cnt_b").withColumnRenamed("sum", "sum_b"),
        Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("cnt_a"), lit(0L)) + coalesce(col("cnt_b"), lit(0L))).as("cnt"),
        (coalesce(col("sum_a"), zero) + coalesce(col("sum_b"), zero))
          .cast(DecimalType(28, 6)).as("sum"))
  }

  /** Fold a sequence of change batches into the maintained view; groups
    * whose rows were all deleted disappear (cnt 0), matching a fresh
    * aggregation over the final table state. */
  def maintain(batches: Seq[DataFrame], key: String, value: String): DataFrame =
    batches.map(delta(_, key, value)).reduce(merge(_, _, key))
      .filter(col("cnt") > 0)
}
