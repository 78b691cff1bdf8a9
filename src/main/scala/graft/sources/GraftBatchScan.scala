package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.graft.ParquetReadShim
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{BooleanType, DataType, StructField, StructType}

import graft.cdc.CdcApplier
import graft.cdc.CdcApplier.TargetMeta

/** The RUNTIME-FILTERABLE read leg of the graft connector (q244): a true
  * DataSource-V2 `Batch` scan, chosen by [[GraftScanBuilder]] exactly when
  * the static predicates could NOT bound the bucket key — the case where
  * the only remaining pruning opportunity is a JOIN's runtime keys. Spark's
  * dynamic-pruning machinery (`PartitionPruning` → `BatchScanExec`) then
  * feeds the dimension side's observed join keys into
  * [[SupportsRuntimeFiltering.filter]] at EXECUTION time, and this scan
  * maps them through the same literal-keys→bucket arithmetic the static
  * pushdown uses ([[GraftScan.coveredBuckets]] over the writer's own hash /
  * range-split expression) — so `SELECT ... FROM fact JOIN dim ON fact.pk =
  * dim.k WHERE dim.x = ...` reads only the buckets the dimension's keys
  * can live in, instead of every bucket the layout holds. This is the join
  * form of the reference's rowkey-prefix pruning (Astro scans prune HBase
  * regions by rowkey prefix; SURVEY EP3), and at 100 TB it is the
  * difference between touching ≤|dim keys| bucket directories and scanning
  * the fact table.
  *
  * Planning: ONE input partition per bucket directory. A bucket is
  * key-complete (every version of a key hashes to the same bucket), which
  * makes the second property of this leg sound: merge-on-read
  * latest-per-key resolution happens INSIDE the reader
  * ([[MorResolvingReader]] — a per-bucket hashmap keyed on the PK
  * projection), so the resolve that costs the V1 leg a window-function
  * SHUFFLE costs this leg nothing but the bucket's resolved working set —
  * the same per-bucket memory bound the applier's own merge already
  * assumes. Copy-on-write buckets stream through [[LiveRowsReader]] with
  * zero buffering (tombstone filter + projection only).
  *
  * Decoding is Spark's own V2 parquet reader end-to-end
  * ([[ParquetReadShim.parquetReaderFactory]]): per-file schema clipping
  * (additive evolution surfaces NULL), vectorized decode, row-group
  * skipping for the pushed filters (merge-on-read pushes only
  * PK-referencing predicates below the resolve — a non-key predicate could
  * skip a row group holding a key's WINNING version while an older version
  * survives elsewhere). Spark re-evaluates every pushed predicate above
  * the scan (the connector's standing convention), so reader-side
  * filtering is a performance matter only.
  *
  * Statistics ([[SupportsReportStatistics]]): bytes under the covered
  * buckets — the V2 mirror of [[GraftRelation.sizeInBytes]], keeping the
  * q236 auto-broadcast property on this leg.
  */
class GraftBatchScan(
    spark: SparkSession, targetDir: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter], spjCapable: Boolean = false)
    extends Scan with Batch with SupportsRuntimeFiltering with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  private val target = new Path(targetDir)
  private val hconf = spark.sparkContext.hadoopConfiguration
  private val fs = target.getFileSystem(hconf)
  CdcApplier.openTarget(fs, target)
  private val meta = TargetMeta.read(hconf, target)
  private val isMor = meta.exists(_.storage.contains("mor"))
  /** Outstanding deletion vectors (q275): appended key-tombstones mask rows
    * through the same latest-per-key resolve as MOR. */
  private val dvOutstanding = meta.exists(_.dv.exists(_ > 0))
  /** q276: on MOR, a recorded `sorted` is set ONLY by compactMor (after its
    * publish) and cleared by every delta append / vacuum / fast-forward
    * BEFORE new versions become visible — so mor + sorted proves ONE
    * version per key, and the bucket streams through the tombstone-filter
    * reader with no resolve (and may report its order below). */
  private val morCompacted = isMor && meta.exists(_.sorted.exists(_.nonEmpty))
  /** Latest-per-key resolution required? MOR delta chains (unless proven
    * compacted) and dv-bearing COW — [[CdcApplier.needsResolve]]'s rule,
    * refined by the compaction proof this scan can additionally use. */
  private val mustResolve = (isMor && !morCompacted) || dvOutstanding
  private val pkCols: Seq[String] = meta.flatMap(_.pkCols).getOrElse(Seq.empty)
  private val bucketCols: Seq[String] =
    meta.flatMap(m => m.bucketCols.orElse(m.pkCols)).getOrElse(Seq.empty)

  /** All bucket ids the layout holds (fixed for the scan's lifetime). */
  val allBuckets: Seq[Int] = CdcApplier.bucketIds(fs, target)

  /** The runtime filters of the CURRENT execution. Spark hands
    * [[SupportsRuntimeFiltering.filter]] the complete runtime-filter set
    * for an execution in one call, so the semantics here are REPLACE, not
    * accumulate: coverage is always recomputed from `pushed ++ these`
    * against the static baseline. Intersecting into persistent state (the
    * pre-r12 shape) was correct within one execution but wrong across
    * them — a re-executed Scan whose dimension side had GAINED keys would
    * keep the previous execution's narrower pruning and silently drop
    * rows. Replacing resets coverage to exactly what this execution's
    * filters justify. */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty

  /** Currently-covered buckets: the static coverage (= all, or this leg
    * would not have been chosen) narrowed by the current execution's
    * runtime filters — recomputed from scratch per [[filter]] call, never
    * carried across executions. */
  def activeBuckets: Seq[Int] =
    GraftScan.coveredBuckets(meta, fullSchema, pushed ++ runtimeFilters, allBuckets)

  /** What the last `planInputPartitions` actually planned — the seam the
    * q244 gate and specs assert runtime pruning through. */
  @volatile var lastPlannedBuckets: Seq[Int] =
    GraftScan.coveredBuckets(meta, fullSchema, pushed, allBuckets)

  /** (files planned, files present) from the last `planInputPartitions` —
    * the q250 data-skipping seam. (-1, -1) until a plan ran. */
  @volatile var lastPlannedFiles: (Int, Int) = (-1, -1)

  // ---- runtime filtering (Spark calls these at execution time) ----------

  /** The bucket key columns — the only attributes whose runtime values can
    * prune bucket directories. ONLY claimed when every bucket column
    * survives column pruning: Spark resolves these against the scan's
    * pruned output (V2ExpressionUtils.resolveRef THROWS on a miss — a
    * query projecting none of the key columns must still plan), and the
    * pruning arithmetic needs a value set for every bucket column anyway. */
  override def filterAttributes(): Array[NamedReference] =
    if (bucketCols.nonEmpty && bucketCols.forall(required.fieldNames.contains))
      bucketCols.map(c => Expressions.column(c)).toArray
    else Array.empty

  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters

  // ---- schemas -----------------------------------------------------------

  /** File truth: data columns + `_graft_pos` + `_graft_deleted` (the
    * BUCKET column is the directory, never in the files). Read as fully
    * nullable — a file written before an additive evolution lacks the new
    * columns and the reader surfaces NULL. */
  private val fileSchema: StructType = {
    val stored = meta.flatMap(_.schemaJson) match {
      case Some(j) => DataType.fromJson(j).asInstanceOf[StructType]
      case None =>
        spark.read.option("mergeSchema", true).parquet(targetDir).schema
    }
    StructType(stored.fields.filterNot(_.name == CdcApplier.BUCKET)
      .map(_.copy(nullable = true)))
  }

  /** LOGICAL query name → the PHYSICAL name files/footers/sidecars carry
    * (q258 column mapping; identity when the table has no renames). */
  private val physOf: String => String = c => CdcApplier.physicalName(meta, c)
  /** Pushed filters in physical terms — what the parquet reader and the
    * sidecar matcher consume; untranslatable nodes drop (both consumers
    * are optimizations, dropping only reads more). */
  private val pushedPhys: Array[Filter] =
    pushed.flatMap(GraftScan.renameRefs(_, physOf))

  /** Internal read schema: the required columns first (so output ordinals
    * are a prefix), then whatever the reader additionally needs — the PK +
    * `_graft_pos` for merge-on-read resolution, `_graft_deleted` always
    * (the tombstone filter). Field lookups are by PHYSICAL name; the
    * output's ordinal contract makes the logical/physical naming moot at
    * runtime (InternalRows carry no names). */
  private val readInternal: StructType = {
    val have = required.fieldNames.toSet
    val extras = (if (mustResolve) pkCols :+ CdcApplier.POS else Seq.empty) ++
      Seq(CdcApplier.DEL)
    StructType(required.fields.map(f => fileSchema(physOf(f.name))) ++
      extras.distinct.filterNot(have).map(fileSchema(_)))
  }
  private def ord(c: String): Int = readInternal.fieldNames.indexOf(c)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftBatchScan $targetDir runtime-filterable " +
      s"buckets=${activeBuckets.size}/${allBuckets.size}" +
      (if (lastPlannedFiles._2 >= 0)
        s" files=${lastPlannedFiles._1}/${lastPlannedFiles._2}" else "")

  // ---- batch -------------------------------------------------------------

  /** Storage-partitioned-join eligibility (q255; public design point:
    * Iceberg's SupportsReportPartitioning + `bucket` catalog function,
    * SPARK-37375). A HASH layout whose bucket key columns are all in the
    * read schema reports `KeyGroupedPartitioning(bucket(n, keys...), #all
    * buckets)` — one key-complete partition per bucket directory, each
    * carrying its bucket id as the partition key — so a join of two graft
    * tables with agreeing layouts shuffles NEITHER side (the layout paid
    * the shuffle once, at write time). Range layouts and key-pruned
    * projections report Unknown; refusal costs a shuffle, never
    * correctness. The transform resolves against the table's OWN catalog
    * ([[GraftBucketFunction]] — the writer's exact pmod(murmur3) fold). */
  private def keyGrouped: Boolean =
    spjCapable && meta.exists(_.rangeBounds.isEmpty) && bucketCols.nonEmpty &&
      bucketCols.forall(required.fieldNames.contains) && allBuckets.nonEmpty

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (keyGrouped)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(Expressions.bucket(meta.get.numBuckets, bucketCols: _*)),
        allBuckets.size)
    else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
      allBuckets.size)

  // ---- reported ordering (q262) ------------------------------------------

  /** The per-partition ordering this scan can PROVE and will serve, plus
    * the file concatenation order per bucket that serves it. Copy-on-write
    * layouts whose meta records a write-time sort (q262) stream each bucket
    * in that order: a single file per bucket serves the full sort-column
    * list trivially; a multi-file bucket serves it iff the q250 sidecar
    * ranges on the FIRST sort column are disjoint across files (strictly →
    * full list; touching only at equal boundaries → the first column
    * alone). Any unknown (missing stats, nulls on the sort column,
    * overlap) degrades to NO reported order — refusal costs a Sort above
    * the scan, never correctness. Merge-on-read never reports (the
    * reader-local hashmap resolve is unordered by construction). Reported
    * names are LOGICAL (the relation's output) and only the prefix present
    * in the pruned read schema is claimed. */
  private lazy val orderInfo: (Seq[String], Map[Int, Seq[String]]) = {
    val sortedPhys = meta.flatMap(_.sorted).getOrElse(Seq.empty)
    // a resolving read is unordered by construction (reader-local hashmap):
    // live MOR delta chains and dv-bearing COW refuse; a COMPACTED mor
    // (q276 — `sorted` set by compactMor, cleared by any delta) streams in
    // file order and MAY report, exactly like sorted COW
    if (mustResolve || sortedPhys.isEmpty) (Seq.empty, Map.empty)
    else {
      val logicalSorted = sortedPhys.map(c => CdcApplier.logicalName(meta, c))
      val present = logicalSorted.takeWhile(required.fieldNames.contains)
      if (present.isEmpty) (Seq.empty, Map.empty)
      else {
        var depth = present.length
        val orders = allBuckets.map { b =>
          val (names, d) = graft.cdc.FileStats.bucketFileOrder(
            fs, new Path(target, s"${CdcApplier.BUCKET}=$b"), sortedPhys.head)
          if (d == 0) depth = 0
          else if (d == 1) depth = math.min(depth, 1)
          b -> names
        }.toMap
        (present.take(depth), if (depth == 0) Map.empty[Int, Seq[String]] else orders)
      }
    }
  }

  /** `SupportsReportOrdering`: ascending, NULLS FIRST — exactly the order
    * the publish-side `sortWithinPartitions` wrote (Spark's default
    * ascending null ordering), so a co-bucketed storage-partitioned join
    * satisfies its SortMergeJoin requirement with NO per-partition Sort. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    orderInfo._1.map(c => Expressions.sort(Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray

  override def planInputPartitions(): Array[InputPartition] = {
    val bs = activeBuckets
    lastPlannedBuckets = bs
    // File-level data skipping (q250): the same sidecar statistics the V1
    // leg consults, against the skip-safe filter set — copy-on-write may
    // skip on ANY pushed/runtime predicate; merge-on-read only on
    // PK-referencing ones (a key's versions agree on its PK, so a skipped
    // file holds no version of any key surviving the predicate above the
    // reader-local resolve). Unknown files/columns are always kept.
    val skipF = {
      val all = (pushedPhys ++
        runtimeFilters.flatMap(GraftScan.renameRefs(_, physOf))).toIndexedSeq
      // one-version layouts (cow, compacted mor) may skip on anything; a
      // resolving layout only on PK-referencing predicates
      if (mustResolve) all.filter(_.references.toSet.subsetOf(pkCols.toSet)) else all
    }
    val grouped = keyGrouped
    var kept = 0
    var total = 0
    val parts = bs.zipWithIndex.map { case (b, i) =>
      val d = new Path(target, s"${CdcApplier.BUCKET}=$b")
      val (files0, n) = graft.cdc.FileStats.selectBucketFiles(fs, d, skipF)
      // serve the REPORTED order (q262): concatenate the bucket's files in
      // ascending min-order of the first sort column; skipping files never
      // disturbs the order of the rest
      val files = orderInfo._2.get(b) match {
        case Some(names) if orderInfo._1.nonEmpty =>
          val idx = names.zipWithIndex.toMap
          files0.sortBy(st => idx.getOrElse(st.getPath.getName, Int.MaxValue))
        case _ => files0
      }
      kept += files.size
      total += n
      val fp = ParquetReadShim.bucketPartition(i, files)
      // partition key = the bucket id (= the bucket(n, keys) value for
      // every row in the directory) — what Spark's key-grouped execution
      // aligns the two join sides by
      if (grouped) GraftBucketPartition(fp, b) else fp
    }.toArray
    lastPlannedFiles = (kept, total)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // below-resolve row-group skipping: PK-referencing predicates only on
    // merge-on-read (a key's versions agree on its PK, so skipping by PK
    // cannot change a key's winner); everything on copy-on-write
    val parquetSafe =
      if (mustResolve) pushedPhys.filter(_.references.toSet.subsetOf(pkCols.toSet))
      else pushedPhys
    val inner = ParquetReadShim.parquetReaderFactory(
      spark, fileSchema, readInternal, parquetSafe)
    new GraftResolvingReaderFactory(inner, mustResolve,
      pkCols.map(ord).toArray, ord(CdcApplier.POS), ord(CdcApplier.DEL),
      readInternal, required.indices.toArray)
  }

  /** Bytes under the covered buckets, PLUS — when the table was ANALYZEd
    * (q278, [[graft.cdc.ColumnStats]]) and this is a full-coverage read —
    * the live row count, the rows×width size estimate (raw file bytes
    * over-count a mor table's superseded versions, the wrong number for
    * broadcast selection), and per-column NDV/min/max/nulls/widths for
    * CBO's join reorder and cardinality estimation. A pruned read keeps
    * the byte-based honesty (the stats describe the whole table). */
  override def estimateStatistics(): Statistics = {
    val bytes = activeBuckets.map { b =>
      val d = new Path(target, s"${CdcApplier.BUCKET}=$b")
      if (fs.exists(d)) fs.listStatus(d).map(_.getLen).sum else 0L
    }.sum
    val analyzed =
      if (activeBuckets.size == allBuckets.size)
        graft.cdc.ColumnStats.read(spark, targetDir)
      else None
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(analyzed.map(_.sizeBytes).getOrElse(bytes))
      override def numRows(): java.util.OptionalLong =
        analyzed.map(ts => java.util.OptionalLong.of(ts.rows))
          .getOrElse(java.util.OptionalLong.empty())
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        if (analyzed.isDefined)
          graft.cdc.ColumnStats.v2ColumnStats(spark, targetDir, required)
        else java.util.Collections.emptyMap()
    }
  }
}

/** One bucket directory's files plus the bucket id as the partition key —
  * the [[org.apache.spark.sql.connector.read.HasPartitionKey]] carrier
  * Spark's key-grouped execution groups/aligns partitions by. Unwrapped by
  * [[GraftResolvingReaderFactory]] before the inner parquet factory sees
  * it (the factory handles FilePartitions only). */
case class GraftBucketPartition(
    fp: InputPartition, bucketId: Int)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucketId))
  // delegate locality: the wrapped FilePartition reports block hosts —
  // dropping them would schedule every SPJ partition without locality on
  // a real cluster, remote-reading exactly the joins SPJ accelerates
  override def preferredLocations(): Array[String] = fp.preferredLocations()
}

/** Wraps Spark's parquet reader factory with the graft read semantics:
  * tombstone filtering (+ reader-local latest-per-key resolution on
  * merge-on-read) and the projection down to the served columns. Row-based
  * by construction — resolution needs rows; the inner parquet decode stays
  * vectorized and hands rows off the column batches. */
class GraftResolvingReaderFactory(
    inner: PartitionReaderFactory, isMor: Boolean,
    pkOrdinals: Array[Int], posOrdinal: Int, delOrdinal: Int,
    readSchema: StructType, outOrdinals: Array[Int])
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    def proj(ords: Array[Int]): UnsafeProjection = UnsafeProjection.create(
      ords.toIndexedSeq.map(i =>
        BoundReference(i, readSchema(i).dataType, nullable = true)))
    val filePart = partition match {
      case GraftBucketPartition(fp, _) => fp
      case p => p
    }
    val in = inner.createReader(filePart)
    if (isMor)
      new MorResolvingReader(in, proj(pkOrdinals), posOrdinal, delOrdinal,
        proj(outOrdinals))
    else new LiveRowsReader(in, delOrdinal, proj(outOrdinals))
  }
}

/** Copy-on-write: stream rows through, dropping tombstones (and null-DEL
  * rows — exactly the `!col(_graft_deleted)` semantics of every other read
  * path) and projecting to the served columns. Zero buffering. */
class LiveRowsReader(
    inner: PartitionReader[InternalRow], delOrdinal: Int,
    outProj: UnsafeProjection) extends PartitionReader[InternalRow] {
  private var cur: InternalRow = _
  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      if (!r.isNullAt(delOrdinal) && !r.getBoolean(delOrdinal)) {
        cur = outProj(r)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}

/** Merge-on-read: the bucket is key-complete, so latest-per-key resolves
  * READER-LOCALLY — a hashmap from the PK projection to the newest
  * version's row ([[graft.cdc.CdcApplier.resolveOnRead]]'s semantics:
  * newest `_graft_pos` wins; replay duplicates are value-identical, so the
  * first-seen tie winner is the same row). Memory is the bucket's RESOLVED
  * working set — the bound the applier's own merge already assumes per
  * bucket — and the shuffle the V1 leg's window resolution pays does not
  * exist here. Tombstones drop AFTER resolution (a newer tombstone
  * suppresses an older upsert). */
class MorResolvingReader(
    inner: PartitionReader[InternalRow], keyProj: UnsafeProjection,
    posOrdinal: Int, delOrdinal: Int, outProj: UnsafeProjection)
    extends PartitionReader[InternalRow] {
  private var it: Iterator[InternalRow] = _
  private var cur: InternalRow = _

  private def materialize(): Unit = {
    val winners = new java.util.HashMap[UnsafeRow, (Long, InternalRow)]()
    while (inner.next()) {
      val r = inner.get()
      val pos = if (r.isNullAt(posOrdinal)) Long.MinValue else r.getLong(posOrdinal)
      val k = keyProj(r)
      val prev = winners.get(k)
      if (prev == null) winners.put(k.copy(), (pos, r.copy()))
      else if (pos > prev._1) winners.put(k.copy(), (pos, r.copy()))
    }
    it = {
      import scala.jdk.CollectionConverters._
      winners.values.iterator.asScala
        .filter { case (_, r) => !r.isNullAt(delOrdinal) && !r.getBoolean(delOrdinal) }
        .map { case (_, r) => outProj(r) }
    }
  }

  override def next(): Boolean = {
    if (it == null) materialize()
    if (it.hasNext) { cur = it.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}
