package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.CdcApplier.{TargetMeta, POS, DEL, BUCKET}

/** DISTRIBUTED TABLE AUDIT (q291) — `CALL system.audit` verifies a store's
  * structural invariants IN PLACE, the operator tool a 100 TB table needs:
  * you cannot download a petabyte to check it, and a wrong bucket
  * assignment or a drifted secondary index is silent until a pruned read
  * answers wrong. Public design points: Delta's invariant checks /
  * `VACUUM DRY RUN` posture, HBase's hbck consistency checker (the
  * reference's operational ecosystem), Iceberg's maintenance validation.
  *
  * Every check is a distributed aggregate over the live layout — cost is
  * bounded by one scan per check (the bucket/PK checks share one), never a
  * driver-side fetch; the audit READS ONLY and reports, it never repairs
  * (repair is the applier's job: rebucket/compact/re-seed are the
  * documented remedies).
  *
  * Checks:
  *  - `bucket_assignment`: every stored row lives in the bucket directory
  *    the layout arithmetic assigns it to — the invariant every pruned
  *    lookup, SPJ and maintenance op silently relies on. One codegen'd
  *    comparison per row against [[CdcApplier.bucketExpr]] (the writer's
  *    own fold — one definition, so auditor and writer cannot disagree).
  *  - `pk_uniqueness`: a resolve-free layout (copy-on-write, no
  *    outstanding deletion vectors) must hold exactly ONE version per key;
  *    version-bearing layouts (MOR delta chains, dv windows) legally hold
  *    several and report `skipped` — resolve-on-read is their contract.
  *  - `file_schema`: the union of on-disk file columns must stay inside
  *    the persisted schema + layout columns — a foreign or hand-edited
  *    file surfaces here before it surfaces as a wrong answer.
  *  - `dv_flag`: the meta's outstanding-deletion-vector count can never
  *    EXCEED the `dv-*` files on disk (the publish order is files first,
  *    flag second; the reverse inequality is the documented crash window
  *    and is legal).
  *  - `index_<col>`: each LIVE secondary index must mirror the store —
  *    the live store rows projected to the index's data columns and the
  *    live index entries must be set-equal (two anti-join counts, both
  *    distributed). `building` indexes report `skipped` (the seed is
  *    allowed to be behind). Positions participate: index entries carry
  *    the store's own positions, so a stale-position entry is a violation
  *    even when the payload matches.
  *  - `stats_rows`: informational — the persisted ANALYZE row count vs
  *    the live count (stats are estimates by contract, so drift never
  *    fails the audit; the number tells the operator when to re-ANALYZE).
  */
object TableAudit {

  /** One audit row: check name, pass/fail, violation count, remedy-grade
    * detail. `ok` is None for informational rows (stats drift). */
  case class AuditRow(check: String, ok: Option[Boolean], violations: Long,
      detail: String)

  def audit(spark: SparkSession, targetDir: String): Seq[AuditRow] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(targetDir)
    val fs = target.getFileSystem(hconf)
    val meta = TargetMeta.read(hconf, target).getOrElse(
      throw new IllegalStateException(s"no graft table state at $targetDir"))
    val pk = meta.pkCols.getOrElse(
      throw new IllegalStateException(s"$targetDir has no persisted PK"))
    val buckets = CdcApplier.bucketIds(fs, target)
    val out = scala.collection.mutable.ArrayBuffer.empty[AuditRow]

    if (buckets.isEmpty) {
      out += AuditRow("bucket_assignment", Some(true), 0L, "empty table")
      out += AuditRow("pk_uniqueness", Some(true), 0L, "empty table")
      out += AuditRow("file_schema", Some(true), 0L, "empty table")
    } else {
      val raw = CdcApplier.readStored(spark, Some(meta), Seq(targetDir))

      // bucket_assignment + pk_uniqueness in ONE distributed pass over the
      // physical frame (names are physical on disk; the layout arithmetic
      // runs on physical names too, so no mapping is needed)
      val bucketOrder = meta.bucketCols.getOrElse(pk)
      val expect = CdcApplier.bucketExpr(
        bucketOrder, meta.numBuckets, meta.rangeBounds)
      val misplaced = raw.filter(col(BUCKET) =!= expect).count()
      out += AuditRow("bucket_assignment", Some(misplaced == 0), misplaced,
        if (misplaced == 0) s"${buckets.size} buckets agree with the layout fold"
        else s"$misplaced rows outside their layout bucket — rebucket to repair")

      if (CdcApplier.needsResolve(Some(meta)))
        out += AuditRow("pk_uniqueness", None, 0L,
          "skipped: version-bearing layout (resolve-on-read is the contract)")
      else {
        val dups = raw.groupBy(pk.map(col): _*).count()
          .filter(col("count") > 1).count()
        out += AuditRow("pk_uniqueness", Some(dups == 0), dups,
          if (dups == 0) "one version per key"
          else s"$dups keys hold multiple versions on a resolve-free layout")
      }

      val allowed = meta.schemaJson.map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.toSet ++ Set(POS, DEL, BUCKET))
      val foreign = allowed.map(a =>
        raw.schema.fieldNames.filterNot(a)).getOrElse(Array.empty[String])
      out += AuditRow("file_schema", Some(foreign.isEmpty), foreign.length.toLong,
        if (foreign.isEmpty) "file columns within the persisted schema"
        else s"foreign columns on disk: ${foreign.mkString(",")}")
    }

    // dv_flag: the meta counts outstanding tombstone ROWS; the rows live
    // in `dv-*` files, which publish strictly BEFORE the flag — so the
    // flag can never exceed the on-disk rows (disk > flag is the
    // documented crash window and is legal)
    val dvFiles = buckets.flatMap { b =>
      val d = new Path(target, s"$BUCKET=$b")
      if (fs.exists(d))
        fs.listStatus(d).map(_.getPath)
          .filter(_.getName.startsWith("dv-")).map(_.toString)
      else Seq.empty
    }
    val dvOnDisk =
      if (dvFiles.isEmpty) 0L
      else spark.read.parquet(dvFiles: _*).count()
    val dvFlag = meta.dv.getOrElse(0L)
    out += AuditRow("dv_flag", Some(dvFlag <= dvOnDisk),
      math.max(0L, dvFlag - dvOnDisk),
      s"meta counts $dvFlag outstanding vector rows, disk holds $dvOnDisk")

    // index_<col>: live indexes mirror the store (positions included)
    meta.indexes.getOrElse(Map.empty).toSeq.sortBy(_._1).foreach {
      case (c, state) =>
        if (state != "live")
          out += AuditRow(s"index_$c", None, 0L,
            s"skipped: index is $state (the seed may legally be behind)")
        else {
          val idir = IndexLifecycle.indexDir(targetDir, c)
          val imeta = TargetMeta.read(hconf, new Path(idir)).getOrElse(
            throw new IllegalStateException(
              s"index on '$c' registered at $targetDir but no table at $idir"))
          val icols = imeta.schemaJson.map(j =>
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType]
              .fieldNames.toSeq
              .filterNot(n => n == DEL || n == BUCKET)
              .map(n => CdcApplier.logicalName(Some(imeta), n))).getOrElse(
            throw new IllegalStateException(s"index at $idir has no schema"))
          val fromStore = CdcApplier.snapshot(spark, targetDir)
            .select(icols.map(col): _*)
          val fromIndex = CdcApplier.snapshot(spark, idir)
            .select(icols.map(col): _*)
          val missing = fromStore.exceptAll(fromIndex).count()
          val extra = fromIndex.exceptAll(fromStore).count()
          out += AuditRow(s"index_$c", Some(missing + extra == 0),
            missing + extra,
            if (missing + extra == 0) "index mirrors the store"
            else s"$missing store rows unserved, $extra stale entries — " +
              "drop_index + create_index to re-seed")
        }
    }

    // stats_rows: informational drift (estimates never fail an audit)
    ColumnStats.read(spark, targetDir).foreach { ts =>
      val live = CdcApplier.snapshot(spark, targetDir).count()
      out += AuditRow("stats_rows", None, math.abs(ts.rows - live),
        s"ANALYZE recorded ${ts.rows} rows, live count is $live")
    }

    out.toSeq
  }
}
