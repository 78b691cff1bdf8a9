package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history from the CDC envelope — the
  * capability the latest-state applier ([[CdcApplier]]) deliberately lacks:
  * instead of keeping only each key's current row, keep EVERY version with
  * its validity interval `[valid_from, valid_to)` in replication-position
  * time (Kimball's SCD2, the standard warehouse history table).
  *
  * Semantics: every insert/update image opens a version at its position; a
  * version closes at the key's NEXT event of ANY kind — a newer version or
  * a delete (so a delete closes the last interval without emitting a row,
  * and a later re-insert of the same key opens a fresh interval — the
  * delete/re-insert gap is representable, which a naive
  * `lead over versions-only` would silently bridge). The open version
  * (`valid_to IS NULL`) is the current row; keys currently deleted have no
  * open version.
  *
  * Scale shape: one union of narrow projections over the change feed and
  * ONE shuffle — the per-key window for `lead(valid_from)`. No join, no
  * state: history derives purely from the ordered feed, so backfilling
  * 100 TB of binlog is a single window pass. The reference keeps only
  * latest-state tables (HbaseApplier semantics); this is the history-table
  * extension a warehouse consumer builds beside it.
  */
object Scd2 {

  /** Version history for `keyCol` with the attribute columns `attrCols`
    * carried per version. `changes` is the [[CdcApplier]] envelope
    * (op, next_position, before, after) with positions unique per key. */
  def history(changes: DataFrame, keyCol: String, attrCols: Seq[String]): DataFrame = {
    def proj(side: String, kind: String)(df: DataFrame): DataFrame =
      df.select(col(s"$side.$keyCol").as(keyCol) +:
        attrCols.map(a => col(s"$side.$a").as(a)) :+
        col("next_position").cast("long").as("valid_from"): _*)
        .withColumn("kind", lit(kind))
    val ev = proj("after", "v")(
        changes.filter(col("op").isin("insert", "update")))
      .unionByName(proj("before", "d")(changes.filter(col("op") === "delete")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    ev.withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .filter(col("kind") === "v")
      .withColumn("is_current", col("valid_to").isNull)
      .drop("kind")
  }

  /** Time-travel read: the table AS OF replication position `pos` — each
    * key's version whose interval contains `pos` (`valid_from <= pos <
    * valid_to`); keys deleted at or before `pos`, or not yet inserted,
    * are absent. A pure filter over the history — on a history table
    * partitioned/sorted by key this prunes to one interval probe per key,
    * and ANY past state of a 100 TB table is a scan away with zero extra
    * storage beyond the versions themselves. */
  def asOf(history: DataFrame, pos: Long): DataFrame =
    history.filter(col("valid_from") <= pos &&
      (col("valid_to").isNull || col("valid_to") > pos))
}
