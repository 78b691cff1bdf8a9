package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Idempotent CDC MERGE applier (SURVEY.md §2.1 S9-S14, §2.3 invariants).
  *
  * The reference applies binlog events one-at-a-time through a single-thread
  * executor (`Rep.scala:24,56-65`) with HBase Put/Delete (`HbaseApplier.scala:
  * 226-275`). The Spark-native equivalent is a set-oriented MERGE per
  * micro-batch: resolve each change batch to *one winning operation per key*
  * (last writer by `next_position`), then merge against the current snapshot
  * with a monotonic per-row offset guard (`_graft_pos`) so replayed /
  * out-of-order batches converge (at-least-once ⇒ exactly-once state).
  *
  * Change envelope schema: `op` (insert|update|delete), `next_position` long,
  * `before` struct (null for insert), `after` struct (null for delete);
  * `before`/`after` share one struct schema.
  *
  * Scale notes: resolve is one shuffle on PK; merge is one full-outer join on
  * PK. With the snapshot bucketed/partitioned by PK both sides co-locate.
  * On a Delta/Iceberg sink this whole class collapses into `MERGE INTO`;
  * the parquet swap here stands in because the image ships no lake-format jar.
  */
object CdcApplier {

  /** @param pkCols          primary-key columns (ordinal order, like the
    *                        reference's BitSet-ordered row key,
    *                        `HbaseApplier.scala:210-217`)
    * @param compatPkChange  true reproduces the reference's S10 anomaly: an
    *                        UPDATE that changes the PK tuple does NOT delete
    *                        the old row (`HbaseApplier.scala:252-257`); false
    *                        (default) emits the missing delete.
    * @param strictPk        reject upserts with any NULL PK column
    *                        (`HbaseApplier.scala:206-208`). */
  case class Options(
      pkCols: Seq[String],
      compatPkChange: Boolean = false,
      strictPk: Boolean = true)

  private val POS = "_graft_pos"
  private val KIND = "_graft_kind"

  private def dataFields(changes: DataFrame): Seq[String] =
    changes.schema("after").dataType.asInstanceOf[StructType].fieldNames.toSeq

  /** Fail fast on PK schema drift (reference `MySQLExtractor.scala:196-198`):
    * every PK column must exist in the incoming change schema with the same type. */
  def checkSchemaDrift(target: StructType, incoming: StructType, pkCols: Seq[String]): Unit =
    pkCols.foreach { k =>
      val t = target.fields.find(_.name == k)
      val i = incoming.fields.find(_.name == k)
      if (i.isEmpty || t.exists(_.dataType != i.get.dataType))
        throw new IllegalStateException(
          s"PK schema drift on '$k': target=${t.map(_.dataType)} incoming=${i.map(_.dataType)}")
    }

  /** Resolve a change batch to one winning (kind, image, pos) per key.
    * An update that moves the PK fans out to a delete@before-key and an
    * upsert@after-key (unless compat mode). One shuffle (groupBy PK). */
  def resolveBatch(changes: DataFrame, opts: Options): DataFrame = {
    val cols = dataFields(changes)
    val ko = (img: Column, kind: String) =>
      struct(img.as("img"), lit(kind).as("kind"), col("next_position").as("pos"))

    val pkMoved = opts.pkCols
      .map(k => !(col(s"before.$k") <=> col(s"after.$k")))
      .reduce(_ || _)
    val upsertOp = when(col("op").isin("insert", "update"), ko(col("after"), "upsert"))
    val deleteOp = when(col("op") === "delete", ko(col("before"), "delete"))
    val pkMoveDelete =
      if (opts.compatPkChange) when(lit(false), ko(col("before"), "delete"))
      else when(col("op") === "update" && pkMoved, ko(col("before"), "delete"))

    val keyOps = changes
      .select(explode(array(upsertOp, deleteOp, pkMoveDelete)).as("ko"))
      .filter(col("ko").isNotNull)
      .select(col("ko.kind").as(KIND), col("ko.pos").as(POS), col("ko.img.*"))

    // PK completeness (invariant 4): distributed, codegen'd, no extra job.
    val guarded =
      if (!opts.strictPk) keyOps
      else opts.pkCols.foldLeft(keyOps) { (df, k) =>
        df.withColumn(k,
          when(col(KIND) === "upsert" && col(k).isNull,
            raise_error(concat(lit(s"CDC upsert missing PK column '$k' at pos "), col(POS))))
            .otherwise(col(k)))
      }

    val payload = struct((Seq(KIND, POS) ++ cols).map(col): _*)
    guarded
      .groupBy(opts.pkCols.map(col): _*)
      .agg(max_by(payload, col(POS)).as("w"))
      .select(col("w.*"))
  }

  /** Pure merge of a resolved batch into the current snapshot.
    * `current` carries data columns + `_graft_pos`. Full-outer join on PK;
    * a change only wins if its position is newer than the row it replaces. */
  def merge(current: DataFrame, resolved: DataFrame, opts: Options): DataFrame = {
    val cols = resolved.columns.filterNot(c => c == KIND || c == POS).toSeq
    val joinCond = opts.pkCols
      .map(k => col(s"c.$k") <=> col(s"r.$k"))
      .reduce(_ && _)
    val joined = current.as("c").join(resolved.as("r"), joinCond, "full_outer")

    val changeWins = col(s"r.$KIND").isNotNull &&
      (col(s"c.$POS").isNull || col(s"r.$POS") > col(s"c.$POS"))
    joined
      .filter(!(changeWins && col(s"r.$KIND") === "delete") &&
        // row must exist on at least one side that survives
        (col(s"c.$POS").isNotNull || col(s"r.$KIND") === "upsert"))
      .select(
        cols.map(c => when(changeWins, col(s"r.$c")).otherwise(col(s"c.$c")).as(c)) :+
          when(changeWins, col(s"r.$POS")).otherwise(col(s"c.$POS")).as(POS): _*)
  }

  /** End-to-end batch apply against a parquet-backed target directory:
    * read snapshot → resolve → merge → write tmp → atomic-ish swap. */
  def applyBatch(spark: SparkSession, changes: DataFrame, targetDir: String, opts: Options): Unit = {
    val resolved = resolveBatch(changes, opts)
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(targetDir)
    val fs = target.getFileSystem(hconf)

    val current =
      if (fs.exists(target)) spark.read.parquet(targetDir)
      else {
        val schema = StructType(resolved.schema.fields.filterNot(f => f.name == KIND || f.name == POS))
          .add(POS, LongType)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    checkSchemaDrift(current.schema, resolved.schema, opts.pkCols)

    val tmp = new Path(targetDir + ".tmp")
    merge(current, resolved, opts).write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
  }
}
