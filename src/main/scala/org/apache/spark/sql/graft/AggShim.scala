package org.apache.spark.sql.graft

import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.RebaseDateTime.RebaseSpec
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.execution.datasources.AggregatePushDownUtils
import org.apache.spark.sql.execution.datasources.parquet.ParquetUtils
import org.apache.spark.sql.internal.LegacyBehaviorPolicy
import org.apache.spark.sql.types.StructType

/** The `private[sql]` seams the connector's aggregate pushdown rides,
  * isolated like [[StreamShim]]: Spark's OWN parquet aggregate-pushdown
  * machinery ([[AggregatePushDownUtils]] for shape/type acceptance + result
  * schema, [[ParquetUtils.createAggInternalRowFromFooter]] for the typed
  * footer-statistics extraction) — the exact code path
  * `spark.sql.parquet.aggregatePushdown` executes (q139), reused so the
  * graft connector cannot disagree with the built-in source about which
  * aggregates footer statistics can answer or how a stats value maps to a
  * Catalyst value. Everything else stays on public API.
  */
object AggShim {
  /** Some(result schema) iff Spark's parquet pushdown rules accept this
    * aggregation (count/min/max over stats-safe types, no grouping). */
  def aggSchema(agg: Aggregation, schema: StructType): Option[StructType] =
    AggregatePushDownUtils.getSchemaForPushedAggregation(
      agg, schema, Set.empty, Nil)

  /** One PARTIAL aggregate row from one file footer — count from row
    * counts, min/max from column statistics, typed by Spark's own
    * converter. Throws if any needed statistic is absent (callers treat
    * that as "refuse the pushdown"). Files are written by this engine
    * (Spark 4 proleptic calendar), so the rebase spec is CORRECTED. */
  def footerPartialRow(
      footer: ParquetMetadata, filePath: String, dataSchema: StructType,
      agg: Aggregation, aggSchema: StructType): InternalRow =
    ParquetUtils.createAggInternalRowFromFooter(
      footer, filePath, dataSchema, new StructType(), agg, aggSchema,
      InternalRow.empty, new RebaseSpec(LegacyBehaviorPolicy.CORRECTED, None))
}
