package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** The one `private[sql]` seam the streaming source needs, isolated in this
  * package object the way public Spark connectors do it (Delta Lake's
  * streaming source re-tags its per-batch DataFrames identically): a V1
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch` must
  * return a frame whose logical plan reports `isStreaming = true`
  * (`MicroBatchExecution` asserts it), and the only way to produce one from
  * an ordinary declarative plan is `internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`.
  *
  * Everything else in the connector stays on public API; this file is the
  * entire blast radius of the internal call.
  */
object StreamShim {
  /** Re-tag a (deterministic, bounded) batch plan as the content of one
    * streaming micro-batch. The plan executes lazily when the sink pulls
    * the RDD — no extra materialization. */
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The sink-side mirror: a V1 `Sink.addBatch` receives the micro-batch
    * as a STREAMING-tagged frame that batch operations (joins, writes)
    * refuse; re-tag it as the bounded batch it is (exactly what Spark's
    * own `ForeachBatchSink` does before handing the user their frame). */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
