package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic synthetic change-stream builders (the test stand-in for the
  * reference's binlog source, SURVEY.md §2.1 S1 — no real MySQL exists in
  * this environment, per SURVEY §7 "hard parts" (e)).
  *
  * Emits the [[CdcApplier]] envelope: (op, next_position, before, after).
  */
object ChangeFeed {

  private def img(df: DataFrame): Column =
    struct(df.columns.map(col).toIndexedSeq: _*)

  /** Typed NULL struct with the same schema as the row image. */
  private def nullImg(df: DataFrame): Column =
    when(lit(false), img(df))

  def inserts(snapshot: DataFrame, pos: Column): DataFrame =
    snapshot.select(lit("insert").as("op"), pos.cast("long").as("next_position"),
      nullImg(snapshot).as("before"), img(snapshot).as("after"))

  /** Update events: `before` is the snapshot row, `after` applies
    * `afterExprs` overrides column-wise. */
  def updates(snapshot: DataFrame, afterExprs: Map[String, Column], pos: Column): DataFrame = {
    val after = struct(snapshot.columns.map(c => afterExprs.getOrElse(c, col(c)).as(c)).toIndexedSeq: _*)
    snapshot.select(lit("update").as("op"), pos.cast("long").as("next_position"),
      img(snapshot).as("before"), after.as("after"))
  }

  def deletes(snapshot: DataFrame, pos: Column): DataFrame =
    snapshot.select(lit("delete").as("op"), pos.cast("long").as("next_position"),
      img(snapshot).as("before"), nullImg(snapshot).as("after"))
}
