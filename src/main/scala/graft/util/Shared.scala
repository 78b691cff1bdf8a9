package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** Minimal JSON string escaping shared by every hand-rolled JSON emitter
  * (Bench output line, Verify's oracle dump, the status server). Escapes
  * quote, backslash, and ALL control chars (<0x20). */
object Json {
  def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def quote(s: String): String = "\"" + escape(s) + "\""
}

/** The engine-wide decimal-exact aggregation convention (see
  * Relational's scaladoc): per-row arithmetic in double, each term cast to
  * DECIMAL(18,6) before SUM (exact, order-independent — Spark's partial-agg
  * order differs from DuckDB's), final value cast back to double. One
  * definition for the Column form and its DuckDB SQL mirror. */
object Sumd {
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Exact, order-independent sum of a double expression, as double. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** SQL fragment mirroring [[sumd]] in both Spark SQL and DuckDB. */
  def SUMD(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
}
