package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.cdc.CdcApplier

/** Pipeline configuration from Spark conf keys (SURVEY.md §2.1 misc — the
  * reference loads Typesafe Config, `Config.scala:26-43`; the rebuild reads
  * the session's own conf so `--conf spark.graft.*` works everywhere):
  *
  *   spark.graft.pk                  comma-separated PK columns (required)
  *   spark.graft.maxRetries          batch retries before the query fails
  *                                   (the reference's maxFailedEventQueueSize
  *                                   analog, `Config.scala:36`; default 2)
  *   spark.graft.numBuckets          snapshot PK-hash buckets (default 16)
  *   spark.graft.compatPkChange      reproduce the S10 PK-change anomaly
  *                                   (default false)
  *   spark.graft.strictPk            reject NULL-PK upserts (default true)
  *   spark.graft.mappedTables        comma-separated replication filter
  *                                   (default empty = replicate all)
  *   spark.graft.secondaryDir        optional S20 second-sink directory
  *   spark.graft.earliestPos         earliest position the source still
  *                                   retains; enables the binlog-purged
  *                                   rebootstrap guard
  *   spark.graft.compactEvery        run tombstone compaction every N
  *                                   applied batches (default 0 = off)
  */
object GraftConf {
  def pipelineOptions(spark: SparkSession): StreamingPipeline.PipelineOptions = {
    val conf = spark.conf
    def get(key: String, default: String): String = conf.get(s"spark.graft.$key", default)
    val pk = get("pk", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(pk.nonEmpty, "spark.graft.pk must list the primary-key columns")
    StreamingPipeline.PipelineOptions(
      applier = CdcApplier.Options(
        pkCols = pk,
        compatPkChange = get("compatPkChange", "false").toBoolean,
        strictPk = get("strictPk", "true").toBoolean,
        numBuckets = get("numBuckets", "16").toInt),
      mappedTables = get("mappedTables", "").split(",").map(_.trim).filter(_.nonEmpty).toSet,
      maxRetries = get("maxRetries", "2").toInt,
      secondaryDir = Some(get("secondaryDir", "")).filter(_.nonEmpty),
      earliestPos = Some(get("earliestPos", "")).filter(_.nonEmpty).map(_.toLong),
      compactEvery = get("compactEvery", "0").toInt)
  }
}
