package graft.sources

import java.io.IOException

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.{CdcApplier, ChangeFeed}

/** SQL `UPDATE` / `MERGE INTO` (and the row-level form of `DELETE`) for
  * graft tables, via Spark's delta-based row-level operation API
  * (`SupportsRowLevelOperations` + `SupportsDelta`) — the final piece of
  * the "a relational write is a change batch somebody typed by hand"
  * surface ([[GraftWrites]]): Spark's own analyzer rewrites
  * UPDATE/MERGE/DELETE into a join between the target scan and the source,
  * hands each affected row to a [[DeltaWriter]] as an insert/update/delete
  * verb with the row identity (= the persisted PK, [[SupportsDelta.rowId]]),
  * and this module folds those verbs back into ONE CDC envelope batch
  * applied through [[CdcApplier.applyBatch]]/`applyBatchMor` — the same
  * merge discipline as every other write path, so MERGE composes with
  * history, change feeds, time travel and MOR semantics for free.
  *
  * Mirrors the reference's S9–S11 apply semantics (HBase put/delete of
  * affected rowkeys, `HbaseApplier.scala:150-204`) surfaced as ANSI DML.
  *
  * '''Dataflow (100 TB shape).''' The matched deltas never pass through
  * the driver: each write task streams its verbs into a per-task parquet
  * staging file under `<target>.rowlevel-<queryId>/` (written with Spark's
  * own `ParquetWriteSupport`, so types round-trip exactly); `commit` then
  * reads the staged files back as a distributed frame and runs ONE applier
  * merge — cost ∝ changed rows + touched buckets, exactly the applier's
  * contract. A crashed/aborted statement leaves only a `.rowlevel-*`
  * staging tree, reclaimed by [[CdcApplier.openTargetForWrite]]'s suffix
  * sweep on the next write.
  *
  * '''Positions.''' One statement = one atomic position step: old-key
  * tombstones (DELETEs and the retired key of a PK-moving UPDATE) land at
  * `p = maxPos+1`, upserts at `p+1` — the same two-position discipline as
  * INSERT OVERWRITE ([[GraftWrites.insertInto]]), so a key that one branch
  * deletes and another branch re-creates in the SAME statement resolves to
  * the new row, never a position tie.
  */
object GraftRowLevel {

  /** Staging record layout: verb + old-PK columns + full new-row image. */
  private[sources] val OP = "_graft_rl_op"
  private[sources] val INSERT = 1
  private[sources] val UPDATE = 2
  private[sources] val DELETE = 3
  private[sources] def idCol(c: String) = s"_graft_rl_id_$c"

  private[sources] def stagingSchema(rowSchema: StructType, idSchema: StructType): StructType =
    StructType(
      StructField(OP, IntegerType, nullable = false) +:
      (idSchema.fields.map(f => f.copy(name = idCol(f.name), nullable = true)) ++
       rowSchema.fields.map(_.copy(nullable = true))))

  /** Fold the staged verbs into one envelope batch and apply it. Runs on
    * the driver inside `BatchWrite.commit` but every frame is distributed;
    * tombstone images come from a left-semi against the CURRENT snapshot
    * (full-row fidelity, the same shape as [[GraftWrites.deleteWhere]]). */
  private[sources] def commitStaged(
      spark: SparkSession, targetDir: String, files: Seq[String],
      rowSchema: StructType, idSchema: StructType,
      branch: Option[String] = None): Unit = {
    if (files.isEmpty) return
    // materialize BEFORE the applier runs: applyBatch's own
    // openTargetForWrite reclaims `.rowlevel-*` staging trees (crash
    // hygiene), including the very files this frame reads from
    val staged = spark.read.schema(stagingSchema(rowSchema, idSchema))
      .parquet(files: _*).localCheckpoint()
    val (opts, isMor) = GraftWrites.optionsFor(spark, targetDir, Map.empty)
    val pkCols = idSchema.fieldNames.toSeq
    // q287: a branch-bound statement's positions sit past the branch point
    // (staged rows must supersede main's as-of slice), and its victim
    // before-images come from the BRANCH LINEAGE, not main
    val p = branch.map(GraftWrites.branchNextPos(spark, targetDir, _))
      .getOrElse(GraftWrites.maxPos(spark, targetDir) + 1L)

    // old keys to retire: DELETE verbs, plus UPDATE verbs whose new row
    // carries a different PK value (a PK move retires the old key). A pure
    // DELETE statement stages NO new-row image at all (Spark's delta
    // rewrite passes only the verb + rowId) — there the move test and the
    // upsert leg reference columns that don't exist, so both collapse:
    // nothing can move, nothing upserts.
    val rowCols = rowSchema.fieldNames.toSet
    val pkMoved =
      if (pkCols.forall(rowCols)) pkCols.map(c => !(col(idCol(c)) <=> col(c)))
        .reduce(_ || _)
      else lit(false)
    // q283: on a store with registered secondary indexes EVERY update
    // retires its old row (delete@p; the upsert@p+1 re-inserts, so the
    // store state is unchanged) — the staged delta carries only the old
    // PK values, so an indexed-VALUE move is undetectable here, and the
    // index maintenance feed needs the full before-image delete to retire
    // the stale entry. Costs the victims fetch those statements already
    // pay whenever anything retires; unindexed stores keep the cheap path.
    val hasIndexes = CdcApplier.TargetMeta.read(
      spark.sparkContext.hadoopConfiguration, new Path(targetDir))
      .exists(_.indexes.exists(_.nonEmpty))
    val retiring = col(OP) === DELETE ||
      (col(OP) === UPDATE && (if (hasIndexes) lit(true) else pkMoved))

    // upserts: the full new-row images of INSERT and UPDATE verbs (the
    // served _graft_pos column is offset introspection, not data — the
    // statement's own position supersedes whatever rode in)
    val imgCols = rowSchema.fieldNames.filterNot(_ == CdcApplier.POS).toSeq
    val upEnvOpt =
      if (imgCols.isEmpty) None
      else Some(ChangeFeed.inserts(
        staged.filter(col(OP) === INSERT || col(OP) === UPDATE)
          .select(imgCols.map(col): _*), lit(p + 1L)))

    // the tombstone leg reads the current snapshot for full before-images;
    // a statement that retires nothing (every plain UPDATE, every pure
    // MERGE-upsert) must not pay that scan — the staged frame is already
    // materialized, so the emptiness probe is local
    val hasRetiring = staged.filter(retiring).limit(1).count() > 0
    val delEnvOpt =
      if (!hasRetiring) None
      else {
        val oldKeys = staged.filter(retiring)
          .select(pkCols.map(c => col(idCol(c)).as(c)): _*)
          .distinct()
        val current = branch
          .map(graft.cdc.Branch.snapshot(spark, targetDir, _))
          .getOrElse(CdcApplier.snapshot(spark, targetDir))
        val victims = current.drop(CdcApplier.POS)
          .join(oldKeys, pkCols, "left_semi")
        Some(ChangeFeed.deletes(victims, lit(p)))
      }
    val batch = (delEnvOpt, upEnvOpt) match {
      case (Some(d), Some(u)) => d.unionByName(u, allowMissingColumns = true)
      case (Some(d), None)    => d
      case (None, Some(u))    => u
      case (None, None)       => return // a no-op statement applies nothing
    }
    // q281: a DELETE-only statement on a `dv_deletes` cow table lands as
    // deletion vectors (q275) — appended key-tombstones, zero bucket
    // rewrite — exactly like the translatable-predicate route in
    // [[GraftWrites.deleteWhere]]. Statements that also upsert keep the
    // merge path (the rewrite folds in passing).
    val dvRoute = branch.isEmpty && !isMor && upEnvOpt.isEmpty &&
      CdcApplier.TargetMeta.read(spark.sparkContext.hadoopConfiguration,
        new Path(targetDir)).exists(_.dvDeletes.contains(true))
    if (branch.isDefined)
      graft.cdc.Branch.applyBatch(spark, targetDir, branch.get, batch)
    else if (isMor) CdcApplier.applyBatchMor(spark, batch, targetDir, opts)
    else if (dvRoute) CdcApplier.applyBatchDv(spark, batch, targetDir, opts)
    else CdcApplier.applyBatch(spark, batch, targetDir, opts)
  }
}

/** One row-level statement (UPDATE / MERGE / row-level DELETE). The scan
  * half is the table's ordinary pushdown scan builder (so the rewrite's
  * target-side read bucket-prunes like any other read); the write half is
  * the delta staging below. */
class GraftRowLevelOperation(
    targetDir: String, tableSchema: StructType,
    info: RowLevelOperationInfo, branch: Option[String] = None)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, targetDir, tableSchema,
      branch = branch)

  override def rowId(): Array[NamedReference] = {
    val meta = CdcApplier.TargetMeta.read(
      SparkSession.active.sparkContext.hadoopConfiguration, new Path(targetDir))
    val pk = meta.flatMap(_.pkCols).getOrElse(throw new IllegalStateException(
      s"$targetDir has no persisted PK; row-level DML needs the layout meta"))
    pk.map(Expressions.column).toArray
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(targetDir, info, branch)
}

class GraftDeltaWriteBuilder(targetDir: String, info: LogicalWriteInfo,
    branch: Option[String] = None) extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new GraftDeltaWrite(targetDir, info, branch)
}

class GraftDeltaWrite(targetDir: String, info: LogicalWriteInfo,
    branch: Option[String] = None) extends DeltaWrite {
  private val rowSchema = info.schema()
  private val idSchema = info.rowIdSchema().orElseThrow(() =>
    new IllegalStateException("delta write without a rowId schema"))
  private val stagingDir = s"$targetDir.rowlevel-${info.queryId()}"

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory =
      new GraftDeltaWriterFactory(stagingDir, rowSchema.json, idSchema.json)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val files = messages.collect { case StagedDeltaFile(path) => path }.toSeq
      try GraftRowLevel.commitStaged(spark, targetDir, files, rowSchema,
        idSchema, branch)
      finally {
        val p = new Path(stagingDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
        ()
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val p = new Path(stagingDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      ()
    }
  }
}

case class StagedDeltaFile(path: String) extends WriterCommitMessage

class GraftDeltaWriterFactory(
    stagingDir: String, rowSchemaJson: String, idSchemaJson: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir,
      DataType.fromJson(rowSchemaJson).asInstanceOf[StructType],
      DataType.fromJson(idSchemaJson).asInstanceOf[StructType],
      partitionId, taskId)
}

/** Per-task staging writer: streams each verb as one flat parquet row
  * (op, old-PK, new-row). The parquet writer consumes the record
  * synchronously, so the reusable output row can hold direct references
  * into Spark's transient input rows — zero copies. Task retries write
  * distinct `part-<partition>-<task>` files; only files named in commit
  * messages are folded, so an orphaned attempt's file is inert and dies
  * with the staging tree. */
class GraftDeltaWriter(
    stagingDir: String, rowSchema: StructType, idSchema: StructType,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private val staging = GraftRowLevel.stagingSchema(rowSchema, idSchema)
  private val idTypes = idSchema.fields.map(_.dataType)
  private val rowTypes = rowSchema.fields.map(_.dataType)
  private val out = new GenericInternalRow(staging.length)
  private val filePath = new Path(stagingDir, f"part-$partitionId%05d-$taskId")

  private lazy val writer: ParquetWriter[InternalRow] = {
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(staging, conf)
    // the knobs ParquetWriteSupport.init reads, pinned to Spark defaults
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.ignoreVariantAnnotation", "false")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    new GraftParquetWriterBuilder(filePath)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  private def emit(op: Int, id: InternalRow, row: InternalRow): Unit = {
    out.update(0, op)
    var i = 0
    while (i < idTypes.length) {
      out.update(1 + i, if (id == null || id.isNullAt(i)) null else id.get(i, idTypes(i)))
      i += 1
    }
    var j = 0
    while (j < rowTypes.length) {
      out.update(1 + idTypes.length + j,
        if (row == null || row.isNullAt(j)) null else row.get(j, rowTypes(j)))
      j += 1
    }
    writer.write(out)
  }

  @throws[IOException]
  override def insert(row: InternalRow): Unit =
    emit(GraftRowLevel.INSERT, null, row)
  @throws[IOException]
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
    emit(GraftRowLevel.UPDATE, id, row)
  @throws[IOException]
  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emit(GraftRowLevel.DELETE, id, null)

  override def commit(): WriterCommitMessage = {
    writer.close()
    StagedDeltaFile(filePath.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => }
    val fs = filePath.getFileSystem(new Configuration())
    fs.delete(filePath, false)
    ()
  }

  override def close(): Unit = ()
}

/** parquet-hadoop builder plumbing: the write support is Spark's own
  * InternalRow → parquet writer. */
class GraftParquetWriterBuilder(path: Path)
    extends ParquetWriter.Builder[InternalRow, GraftParquetWriterBuilder](path) {
  override def self(): GraftParquetWriterBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
    new ParquetWriteSupport
}
