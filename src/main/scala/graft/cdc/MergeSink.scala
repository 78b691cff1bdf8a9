package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The CDC merge seam: where a change batch meets durable table state.
  *
  * [[CdcApplier.applyBatch]]'s bucketed-parquet scheme (PK-hash bucket
  * dirs, tombstone rows, checked three-way rename swap) is NOT the design —
  * it is the dependency-free FALLBACK for environments without a lake
  * format on the classpath (this image ships no Delta/Iceberg jar). On a
  * lake table the whole applier collapses into one transactional statement.
  * With the same resolved batch the applier already computes — one winning
  * row per key (`max_by` over `next_position`), kind ∈ insert|update|delete,
  * guard column `_graft_pos` — the Delta/Iceberg implementation of this
  * trait is exactly:
  *
  * {{{
  * MERGE INTO target t
  * USING resolved s
  *   ON  t.pk1 = s.pk1 AND t.pk2 = s.pk2          -- Options.pkCols
  * WHEN MATCHED AND s._graft_pos <= t._graft_pos THEN
  *   -- stale replay: lose the position race, exactly like the parquet path
  *   UPDATE SET t._graft_pos = t._graft_pos       -- no-op branch
  * WHEN MATCHED AND s._graft_kind = 'delete' THEN DELETE
  * WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED AND s._graft_kind != 'delete' THEN INSERT *
  * }}}
  *
  * What the lake format absorbs, line for line:
  *  - bucket dirs + touched-bucket pruning  → the format's file-level
  *    min/max statistics and (Iceberg) bucket partition transforms; the
  *    MERGE rewrites only files containing matched keys;
  *  - the `.bak`/tmp rename swap            → the transaction log commit
  *    (atomic by construction, concurrent-reader safe);
  *  - `.graft_meta` numBuckets adoption     → table metadata, versioned;
  *  - crash recovery (`recoverBuckets`)     → nothing to recover: an
  *    uncommitted MERGE is invisible.
  *
  * What does NOT go away on a lake format:
  *  - the `_graft_pos` monotonic guard — at-least-once sources replay
  *    batches, and MERGE alone is not idempotent under replay;
  *  - delete handling across the replay horizon: either keep tombstone
  *    rows (`_graft_deleted`, as the parquet path does) or physically
  *    DELETE and discard replays at-or-below the persisted horizon
  *    ([[CdcApplier.TargetMeta]].horizon) before the MERGE — the horizon
  *    rule the parquet path already enforces;
  *  - the high-watermark file (invariant 5: filtered batches advance the
  *    position even though they touch no table state).
  */
trait MergeSink {

  /** Merge one change-envelope batch (columns: `op`, `next_position`,
    * `before`, `after`) into the table at `targetDir`. Must be idempotent
    * under batch replay and return the partitions/buckets it touched (for
    * secondary-sink incremental replication, S20). */
  def merge(spark: SparkSession, changes: DataFrame, targetDir: String,
      opts: CdcApplier.Options): Seq[Int]

  /** Read back the current live snapshot (tombstones filtered). */
  def snapshot(spark: SparkSession, targetDir: String): DataFrame
}

/** The dependency-free fallback: [[CdcApplier]]'s bucketed-parquet merge. */
object BucketedParquetSink extends MergeSink {
  override def merge(spark: SparkSession, changes: DataFrame, targetDir: String,
      opts: CdcApplier.Options): Seq[Int] =
    CdcApplier.applyBatch(spark, changes, targetDir, opts)

  override def snapshot(spark: SparkSession, targetDir: String): DataFrame =
    CdcApplier.snapshot(spark, targetDir)
}

/** Lake-format availability probe + sink resolution.
  *
  * Probe record (so the seam's status is evidence, not assumption):
  * 2026-08-13, this build environment — `ls /opt/spark/jars | grep -iE
  * 'delta|iceberg|hudi'` matched NOTHING (Spark 4.1.2 distribution jars
  * only; the image has zero network egress, so no artifact can be
  * resolved either). [[resolve]] re-runs the equivalent classpath probe
  * at runtime, and MergeSinkSpec asserts the probe result and the chosen
  * sink agree — a future image that DOES ship a lake jar turns that spec
  * red with an explicit "implement the lake MergeSink" message instead of
  * silently keeping the fallback. */
object MergeSink {
  /** Marker classes that ship with each format's runtime jar. */
  val lakeFormatMarkers: Seq[(String, String)] = Seq(
    "delta" -> "io.delta.tables.DeltaTable",
    "iceberg" -> "org.apache.iceberg.catalog.Catalog",
    "hudi" -> "org.apache.hudi.DataSourceWriteOptions")

  /** Which lake formats are on the classpath right now. */
  def probeLakeFormats(): Map[String, Boolean] =
    lakeFormatMarkers.map { case (name, cls) =>
      // initialize=false: presence is the question — running static init
      // would report a jar whose transitive deps are missing as ABSENT,
      // which is exactly the silent state this probe exists to prevent
      name -> scala.util.Try(
        Class.forName(cls, false, getClass.getClassLoader)).isSuccess
    }.toMap

  /** The merge sink this build supports, with the probe evidence. The
    * scaladoc's MERGE INTO sketch is the implementation recipe for the
    * day a probe returns true. */
  def resolve(): (MergeSink, Map[String, Boolean]) =
    (BucketedParquetSink, probeLakeFormats())
}
