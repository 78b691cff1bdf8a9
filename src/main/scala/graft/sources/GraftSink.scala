package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

import graft.cdc.CdcApplier

/** `df.writeStream.format("graft").start(targetDir)` — a graft table as a
  * Structured Streaming SINK: every micro-batch lands through the CDC
  * applier's merge discipline, with the layout options of the batch write
  * surface (`pk`, `buckets`, `bucketCols`, `rangeBounds`, `storage=mor`;
  * an existing `.graft_meta` is adopted as always).
  *
  * Two input shapes, distinguished by the frame itself:
  *  - '''envelope''' (op, next_position, before, after): applied verbatim
  *    via [[CdcApplier.applyBatch]] / [[CdcApplier.applyBatchMor]] — the
  *    replication shape. Exactly-once falls out of positions: a crash-
  *    replayed micro-batch re-delivers rows whose positions can no longer
  *    beat the stored state (the engine-wide idempotence-by-position
  *    discipline), so no batch-id bookkeeping is needed.
  *  - '''plain rows''': upserted through [[GraftWrites.insertInto]] at
  *    position `position option + batchId` — the batch id (Spark's replay
  *    counter) makes a replayed batch land at ITS OWN position again,
  *    byte-identical state on redelivery.
  *
  * Composed with [[GraftChangeFeedSource]], replication becomes ONE
  * streaming query with zero custom code:
  * {{{
  *   spark.readStream.format("graft").load(src)
  *     .writeStream.format("graft").option("checkpointLocation", c)
  *     .start(dst)
  * }}}
  * — the reference's entire runtime topology (S1 tail → S9-S12 apply),
  * expressed as a Spark streaming query over this connector.
  *
  * 100 TB shape: per micro-batch exactly the applier's — one shuffle on
  * the bucket key, cost ∝ touched buckets.
  */
class GraftSink(spark: SparkSession, targetDir: String,
    params: Map[String, String]) extends Sink {

  private val envelopeCols = Set("op", "next_position", "before", "after")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is streaming-tagged; re-tag as the bounded batch
    // it is (ForeachBatchSink's own discipline)
    val batch = org.apache.spark.sql.graft.StreamShim.asBatch(data)
    if (batch.columns.toSet == envelopeCols) {
      val (opts, isMor) = GraftWrites.optionsFor(spark, targetDir, params)
      if (isMor) CdcApplier.applyBatchMor(spark, batch, targetDir, opts)
      else CdcApplier.applyBatch(spark, batch, targetDir, opts)
    } else {
      val base = params.collectFirst {
        case (k, v) if k.equalsIgnoreCase("position") => v.toLong
      }.getOrElse(1L)
      GraftWrites.insertInto(targetDir, batch, overwrite = false,
        params.filterNot(_._1.equalsIgnoreCase("position")) +
          ("position" -> (base + batchId).toString))
    }
    ()
  }

  override def toString: String = s"GraftSink($targetDir)"
}
