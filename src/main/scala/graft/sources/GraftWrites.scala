package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, max, struct}
import org.apache.spark.sql.sources.Filter

import graft.cdc.{CdcApplier, ChangeFeed}
import graft.cdc.CdcApplier.{Options, TargetMeta}

/** The SQL write surface of the graft connector: `INSERT INTO` /
  * `INSERT OVERWRITE` / `df.write.format("graft")` / `DELETE FROM`, all
  * routed through the SAME CDC merge discipline as the streaming applier —
  * a relational write is just a change batch somebody typed by hand.
  *
  *  - '''INSERT INTO''' (append) = an insert-envelope batch: last-writer-
  *    wins UPSERT per PK (the reference's Put semantics, S9
  *    `HbaseApplier.scala:150-171` — an HBase put of an existing rowkey IS
  *    the update). No append-only mode exists because the engine's tables
  *    are keyed state, not logs.
  *  - '''INSERT OVERWRITE''' = ONE batch carrying a tombstone for every
  *    currently-live key at position `p` unioned with inserts of the new
  *    rows at `p+1` — replace-contents expressed in the CDC algebra, so
  *    history/change-feed/time-travel semantics stay uniform (a mor target
  *    records the overwrite as ordinary versions; nothing is rewritten
  *    outside the applier's own swap discipline).
  *  - '''DELETE FROM''' = a delete-envelope batch for the keys the pushed
  *    predicates select (translated through [[GraftScan.toColumn]], the
  *    same exact translations the read path trusts).
  *
  * '''Positions.''' Every write lands at an explicit stream position, the
  * engine's total order. A served table exposes `_graft_pos`, so an
  * inserted frame may carry it: non-null values are taken verbatim (a SQL
  * user replaying a change log keeps its ordering); null/absent rows get
  * the batch default — the `position` write option, or `max(_graft_pos)+1`
  * read from the target (a POS-only column scan, answerable from parquet
  * footer stats; at 100 TB pass `position` explicitly and skip the read).
  *
  * '''Layout adoption.''' An existing target's `.graft_meta` is the truth
  * for PK order, bucket columns, modulus, range bounds, and storage mode
  * (cow merges via [[CdcApplier.applyBatch]], mor appends deltas via
  * [[CdcApplier.applyBatchMor]]) — a writer cannot be configured into
  * hashing keys away from the rows already on disk. A FIRST write creates
  * the layout and needs the `pk` option (comma-separated PK columns, order
  * significant); `buckets`, `bucketCols`, `rangeBounds` and
  * `storage=mor` shape the new layout.
  *
  * 100 TB shape: identical to the applier's, because it IS the applier —
  * cost ∝ touched buckets, one shuffle on the bucket key, never a table
  * rewrite (except OVERWRITE, whose tombstone scan is the current live
  * set — the semantics demand it).
  */
object GraftWrites {

  /** Case-insensitive option lookup (SQL option keys arrive lower-cased
    * through some paths, verbatim through others). */
  private def opt(params: Map[String, String], key: String): Option[String] =
    params.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private[sources] def optionsFor(
      spark: SparkSession, targetDir: String,
      params: Map[String, String]): (Options, Boolean) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val meta = TargetMeta.read(hconf, new Path(targetDir))
    meta match {
      case Some(m) =>
        val pk = m.pkCols.getOrElse(
          opt(params, "pk").map(_.split(",").toSeq.map(_.trim)).getOrElse(
            throw new IllegalStateException(
              s"$targetDir has a pre-upgrade meta with no persisted PK; " +
                "pass the pk option")))
        (Options(pk, numBuckets = m.numBuckets, bucketCols = m.bucketCols,
          rangeBounds = m.rangeBounds), m.storage.contains("mor"))
      case None =>
        val pk = opt(params, "pk").map(_.split(",").toSeq.map(_.trim)).getOrElse(
          throw new IllegalArgumentException(
            "first write to a graft target must name its primary key: " +
              ".option(\"pk\", \"col1,col2\") / OPTIONS (pk 'col1,col2')"))
        (Options(pk,
          numBuckets = opt(params, "buckets").map(_.toInt).getOrElse(16),
          bucketCols = opt(params, "bucketCols").map(_.split(",").toSeq.map(_.trim)),
          rangeBounds = opt(params, "rangeBounds").map(
            _.split(",").toSeq.map(_.trim.toLong))),
          opt(params, "storage").exists(_.equalsIgnoreCase("mor")))
    }
  }

  /** Highest position on disk (empty target → 0). A POS-only scan: parquet
    * reads one column and can answer from row-group stats. */
  private[sources] def maxPos(spark: SparkSession, targetDir: String): Long = {
    val target = new Path(targetDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target) || CdcApplier.bucketIds(fs, target).isEmpty) 0L
    else CdcApplier.readStored(spark,
        CdcApplier.TargetMeta.read(spark.sparkContext.hadoopConfiguration, target),
        Seq(targetDir))
      .agg(max(col(CdcApplier.POS))).first() match {
        case r if r.isNullAt(0) => 0L
        case r                  => r.getLong(0)
      }
  }

  /** q288 by-name reconciliation for autoMerge inserts: NULL-pad stored
    * data columns the frame omits, require the PK, pass new columns
    * through. A fresh target (no meta yet) has nothing to reconcile. */
  private def reconcileByName(
      spark: SparkSession, targetDir: String, data: DataFrame): DataFrame = {
    val metaOpt = TargetMeta.read(
      spark.sparkContext.hadoopConfiguration, new Path(targetDir))
    if (metaOpt.isEmpty) return data
    val served = GraftTable.tableSchema(spark, targetDir)
    val have = data.columns.toSet
    metaOpt.flatMap(_.pkCols).getOrElse(Seq.empty)
      .map(c => CdcApplier.logicalName(metaOpt, c)).foreach(k =>
        require(have(k), s"autoMerge INSERT is BY NAME and must carry the " +
          s"PK: column '$k' is missing from (${data.columns.mkString(", ")})"))
    served.fields.filterNot(f => have(f.name) || f.name == CdcApplier.POS)
      .foldLeft(data)((df, f) =>
        df.withColumn(f.name, org.apache.spark.sql.functions.lit(null)
          .cast(f.dataType)))
  }

  /** The next staging position on a branch: strictly past both the branch
    * point (so staged rows supersede main's as-of slice in the lineage
    * resolve) and anything already staged (q287). */
  private[sources] def branchNextPos(
      spark: SparkSession, mainDir: String, name: String): Long = {
    val staged = TargetMeta.read(spark.sparkContext.hadoopConfiguration,
      new Path(graft.cdc.Branch.branchDir(mainDir, name))).flatMap(_.maxPos)
    math.max(graft.cdc.Branch.point(spark, mainDir, name),
      staged.getOrElse(Long.MinValue)) + 1L
  }

  /** The one write entry point every SQL surface funnels into. With
    * `branch` set (q287; Iceberg's `INSERT INTO t.branch_<name>`), the
    * same insert envelope STAGES on the branch through
    * [[graft.cdc.Branch.applyBatch]] — main never sees it until
    * fast_forward; positions self-assign past the branch point. */
  def insertInto(targetDir: String, data0: DataFrame, overwrite: Boolean,
      params: Map[String, String], branch: Option[String] = None): Unit = {
    require(opt(params, "asOfPos").isEmpty && opt(params, "changesFrom").isEmpty,
      "asOfPos / changesFrom serve read-only projections; write to the table itself")
    val spark = data0.sparkSession
    // q288: with `spark.graft.schema.autoMerge=true` the table advertises
    // ACCEPT_ANY_SCHEMA, so Spark skips its insert alignment and the frame
    // arrives with the SOURCE's shape — reconcile BY NAME (Delta's
    // mergeSchema-append semantics): PK columns must be present, stored
    // data columns absent from the frame NULL-pad (the S4 drift guard
    // refuses missing columns — right for a CDC stream, wrong for a
    // by-name relational INSERT), extra columns flow through and evolve
    // the store additively in the applier. A bare positional `VALUES`
    // arrives as col1/col2/... and fails the PK-presence guard — by-name
    // means by name.
    val data = if (!GraftProvider.autoMergeEnabled) data0
      else reconcileByName(spark, targetDir, data0)
    branch.foreach { name =>
      // replace-contents on a branch would need the lineage's full live
      // set tombstoned — a release flow stages deltas, not truncations
      require(!overwrite,
        s"INSERT OVERWRITE is not supported on branch '$name'; stage deltas " +
          "and fast_forward, or overwrite main directly")
      val base = branchNextPos(spark, targetDir, name)
      val imgCols = data.columns.filterNot(_ == CdcApplier.POS).toSeq
      val img = struct(imgCols.map(col): _*)
      val posEx =
        if (data.columns.contains(CdcApplier.POS))
          coalesce(col(CdcApplier.POS).cast("long"), lit(base))
        else lit(base)
      val env = data.select(lit("insert").as("op"), posEx.as("next_position"),
        org.apache.spark.sql.functions.when(lit(false), img).as("before"),
        img.as("after"))
      graft.cdc.Branch.applyBatch(spark, targetDir, name, env)
      return
    }
    val (opts, isMor) = optionsFor(spark, targetDir, params)

    val floor = opt(params, "position").map(_.toLong).getOrElse(
      maxPos(spark, targetDir) + 1L)
    // replace-contents needs its tombstones strictly BELOW the incoming
    // rows (a tombstone TIED with a stored row does not supersede it), so
    // the batch occupies [floor, floor+1] when overwriting
    val base = if (overwrite) floor + 1L else floor
    // a served `_graft_pos` column carries per-row positions back in; it
    // rides the envelope's position slot, never the row image
    val hasPos = data.columns.contains(CdcApplier.POS)
    val posExpr =
      if (hasPos) coalesce(col(CdcApplier.POS).cast("long"), lit(base))
      else lit(base)
    val imgCols = data.columns.filterNot(_ == CdcApplier.POS).toSeq
    val imageStruct = struct(imgCols.map(col): _*)
    val insertEnv = data.select(lit("insert").as("op"),
      posExpr.as("next_position"),
      // typed NULL struct with the image's schema (ChangeFeed's idiom)
      org.apache.spark.sql.functions.when(lit(false), imageStruct).as("before"),
      imageStruct.as("after"))

    val exists = TargetMeta.read(
      spark.sparkContext.hadoopConfiguration, new Path(targetDir)).isDefined
    val batch =
      if (!overwrite || !exists) insertEnv
      else {
        // tombstone everything currently live one position BELOW the
        // incoming rows: a key present in both resolves to its new row
        // (latest-per-key within the batch), a key only in the old state
        // resolves to the tombstone — replace-contents in one apply.
        val current = CdcApplier.snapshot(spark, targetDir).drop(CdcApplier.POS)
        val dels = ChangeFeed.deletes(current, lit(floor))
        // align the two envelopes by name (schemas may differ additively)
        dels.unionByName(insertEnv, allowMissingColumns = true)
      }

    if (isMor) CdcApplier.applyBatchMor(spark, batch, targetDir, opts)
    else CdcApplier.applyBatch(spark, batch, targetDir, opts)
    ()
  }

  /** `DELETE FROM`: tombstone the keys the predicates select. The filters
    * arrive already validated by [[canDelete]]; deletion is an ordinary
    * change batch, so it bucket-prunes through the applier (only buckets
    * holding matching keys are touched) and composes with history,
    * change-feed and mor semantics like any other delete. */
  def deleteWhere(spark: SparkSession, targetDir: String,
      filters: Array[Filter], branch: Option[String] = None): Unit = {
    val cols = filters.flatMap(GraftScan.toColumn)
    require(cols.length == filters.length,
      s"untranslatable delete predicate: ${filters.mkString(", ")}")
    branch.foreach { name =>
      // q287: tombstone the keys the predicates select FROM THE BRANCH
      // LINEAGE, staged on the branch — main untouched
      val victims = cols.foldLeft(
        graft.cdc.Branch.snapshot(spark, targetDir, name)
          .drop(CdcApplier.POS))(_.filter(_))
      graft.cdc.Branch.applyBatch(spark, targetDir, name,
        ChangeFeed.deletes(victims, lit(branchNextPos(spark, targetDir, name))))
      return
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    val meta = TargetMeta.read(hconf, new Path(targetDir)).getOrElse(
      throw new IllegalStateException(s"no graft table state at $targetDir"))
    val isMor = meta.storage.contains("mor")
    val pk = meta.pkCols.getOrElse(throw new IllegalStateException(
      s"$targetDir has no persisted PK; DELETE needs the layout meta"))
    val opts = Options(pk, numBuckets = meta.numBuckets,
      bucketCols = meta.bucketCols, rangeBounds = meta.rangeBounds)
    val pos = maxPos(spark, targetDir) + 1L
    val victims = cols.foldLeft(
      CdcApplier.snapshot(spark, targetDir).drop(CdcApplier.POS))(_.filter(_))
    val batch = ChangeFeed.deletes(victims, lit(pos))
    if (isMor) CdcApplier.applyBatchMor(spark, batch, targetDir, opts)
    // q281: a copy-on-write table created with `dv_deletes 'true'` takes
    // SQL DELETEs as deletion vectors (q275) — appended key-tombstones,
    // zero bucket rewrite; folding happens at the next rewrite/compact
    else if (meta.dvDeletes.contains(true))
      CdcApplier.applyBatchDv(spark, batch, targetDir, opts)
    else CdcApplier.applyBatch(spark, batch, targetDir, opts)
    ()
  }

  def canDelete(filters: Array[Filter]): Boolean =
    filters.forall(GraftScan.toColumn(_).isDefined)
}
