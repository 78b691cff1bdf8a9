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

  /** Apply the production streaming profile for unbounded corpora: the
    * RocksDB state store (state spills to local SSD instead of the
    * executor heap — the deployment setting at 100 TB; parity with the
    * default provider is spec-verified in StreamingPipelineSpec), with
    * changelog checkpointing so commits ship deltas, not full SSTs.
    * The profile deliberately does NOT touch
    * `statefulOperator.checkCorrectness` — that check is a real safety
    * net for every other stateful query on the session, and the one
    * operator that needs it off (the two-stage bounded admission) scopes
    * the disable to its own `start()` via [[withChainedStatefulStart]].
    * Returns the previous values so callers can restore. */
  def applyProductionStreamingProfile(spark: SparkSession): Map[String, Option[String]] = {
    val keys = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    prev
  }

  def restoreConf(spark: SparkSession, prev: Map[String, Option[String]]): Unit =
    prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }

  /** Run `startFn` (typically a `writeStream...start()` call) with
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`,
    * restoring the CAPTURED prior value — not a literal — afterwards. The
    * conf is read at query START, so the disable only affects queries
    * started inside `startFn`; every other query on the session keeps the
    * safety check. Required by plans that chain stateful operators where
    * the global-watermark pattern warning is a proven false positive (see
    * StreamingPipeline.streamingNearDupAdmitBounded's scaladoc).
    *
    * Concurrency blast radius: the flag is SESSION-scoped, so an
    * UNRELATED `start()` racing on the same session during this window
    * would also skip the check. Invocations of this helper serialize on
    * the session object (so two helper users cannot interleave a stale
    * restore), but callers that start stateful queries on a shared
    * session from other threads must coordinate those starts themselves —
    * Spark offers no per-query form of this conf. */
  def withChainedStatefulStart[T](spark: SparkSession)(startFn: => T): T =
    spark.synchronized {
      val chk = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
      val prev = spark.conf.getOption(chk)
      spark.conf.set(chk, "false")
      try startFn
      finally prev match {
        case Some(v) => spark.conf.set(chk, v)
        case None => spark.conf.unset(chk)
      }
    }
}
