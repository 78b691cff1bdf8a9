package graft.cdc

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcApplier.TargetMeta

/** Optimization round 15 internals: the persisted-schema read path that
  * replaced per-read mergeSchema inference (guide §6 — the footer sweep is
  * gone, so the crash windows it used to paper over must be pinned
  * explicitly), the MOR additive-evolution schema union, and the
  * bucket-aligned write repartition (guide §2.5 — one bucket per task,
  * no hash-collision stragglers). */
class OptR15Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)
  private def hconf = spark.sparkContext.hadoopConfiguration
  private def metaOf(t: String): TargetMeta =
    TargetMeta.read(hconf, new Path(t)).get

  private def newStore(n: Int): String = {
    val store = Files.createTempDirectory("graft_optr15").toString + "/store"
    val data = spark.range(1, n + 1)
      .select($"id".as("k"), ($"id" % 7).as("v"), ($"id" % 13).cast("int").as("w"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    store
  }

  test("readStored serves the persisted schema without inference") {
    val store = newStore(20)
    val m = metaOf(store)
    assert(m.schemaJson.nonEmpty)
    val viaMeta = CdcApplier.readStored(spark, Some(m), Seq(store))
    val viaInference = spark.read.option("mergeSchema", true).parquet(store)
    assert(viaMeta.schema.fieldNames.toSeq == viaInference.schema.fieldNames.toSeq)
    assert(viaMeta.collect().map(_.toString).sorted.toSeq ==
      viaInference.collect().map(_.toString).sorted.toSeq)
  }

  test("additive-evolution crash window: new column reads NULL on old files") {
    val store = newStore(12)
    // simulate the documented crash: meta already carries the evolved
    // schema, no bucket has been rewritten with the new column yet
    val m = metaOf(store)
    val old = CdcApplier.storedSchema(Some(m)).get
    val evolved = StructType(
      old.fields.filterNot(_.name == CdcApplier.BUCKET) ++
        Seq(StructField("extra", LongType, nullable = true)) ++
        old.fields.filter(_.name == CdcApplier.BUCKET))
    TargetMeta.write(hconf, new Path(store), m.copy(schemaJson = Some(evolved.json)))
    val read = CdcApplier.readStored(spark, TargetMeta.read(hconf, new Path(store)),
      Seq(store))
    assert(read.schema.fieldNames.contains("extra"))
    assert(read.filter($"extra".isNotNull).count() == 0L)
    // snapshot stays serveable through the window
    assert(CdcApplier.snapshot(spark, store).count() == 12L)
  }

  test("widening crash window: int32 files read through a widened long schema") {
    val store = newStore(12)
    // simulate the widen crash: meta schema says LongType for `w` while
    // every file still holds int32 — the Spark 4 parquet reader must
    // upcast (the mergeSchema path this replaced never hit the case
    // because inference followed the files; the explicit-schema path
    // follows the meta, so pin the upcast)
    val m = metaOf(store)
    val old = CdcApplier.storedSchema(Some(m)).get
    assert(old("w").dataType == IntegerType)
    val widened = StructType(old.fields.map(f =>
      if (f.name == "w") f.copy(dataType = LongType) else f))
    TargetMeta.write(hconf, new Path(store), m.copy(schemaJson = Some(widened.json)))
    val read = CdcApplier.readStored(spark, TargetMeta.read(hconf, new Path(store)),
      Seq(store))
    assert(read.schema("w").dataType == LongType)
    val got = read.select($"k", $"w").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 12 && got.forall { case (k, w) => w == k % 13 })
  }

  test("MOR additive apply unions the persisted schema before the delta") {
    val store = Files.createTempDirectory("graft_optr15m").toString + "/store"
    val data = spark.range(1, 11).select($"id".as("k"), ($"id" % 7).as("v"))
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(data, $"k" * 10), store, opts)
    val before = CdcApplier.storedSchema(Some(metaOf(store))).get
    assert(!before.fieldNames.contains("nc"))
    val wider = spark.range(1, 4)
      .select($"id".as("k"), ($"id" % 7).as("v"), ($"id" * 100).as("nc"))
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(wider, Map("v" -> ($"v" + 1)), $"k" * 10 + 5), store, opts)
    val after = CdcApplier.storedSchema(Some(metaOf(store))).get
    assert(after.fieldNames.contains("nc"))
    assert(after.fieldNames.last == CdcApplier.BUCKET)
    // the snapshot serves old rows with NULL nc, updated rows with values
    val snap = CdcApplier.snapshot(spark, store)
    assert(snap.filter($"nc".isNotNull).count() == 3L)
    assert(snap.count() == 10L)
  }

  test("bucketAlignedKey lands exactly one bucket per shuffle partition") {
    for (parts <- Seq(1, 3, 16, 61)) {
      val buckets = 0 until parts
      val keyed = spark.range(0, 1000)
        .select(($"id" % parts).cast("int").as(CdcApplier.BUCKET))
        .repartition(parts, CdcApplier.bucketAlignedKey(buckets, parts))
        .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
          col(CdcApplier.BUCKET))
        .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
      // every partition holds exactly one bucket, every bucket one partition
      assert(keyed.groupBy(_._1).forall(_._2.length == 1), s"parts=$parts")
      assert(keyed.map(_._2).distinct.length == parts, s"parts=$parts")
    }
    // sparse touched set: ids beyond parts still map one-per-task
    val sparse = Seq(3, 8, 13)
    val keyed = spark.range(0, 300)
      .select((element_at(typedLit(sparse), ($"id" % 3).cast("int") + 1))
        .cast("int").as(CdcApplier.BUCKET))
      .repartition(3, CdcApplier.bucketAlignedKey(sparse, 3))
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        col(CdcApplier.BUCKET))
      .distinct().collect()
    assert(keyed.groupBy(_.getInt(0)).forall(_._2.length == 1))
  }

  test("index seed slices still resume and converge after the grouped apply") {
    val store = newStore(30)
    val r1 = IndexLifecycle.createIndex(spark, store, "v", maxBuckets = 1)
    assert(r1.state == "building" && r1.seeded.size == 1)
    val r2 = IndexLifecycle.createIndex(spark, store, "v")
    assert(r2.state == "live")
    val idx = IndexLifecycle.indexDir(store, "v")
    val expect = CdcApplier.snapshot(spark, store)
      .select($"v", $"k").collect().map(_.toString).sorted.toSeq
    val got = CdcApplier.snapshot(spark, idx)
      .select($"v", $"k").collect().map(_.toString).sorted.toSeq
    assert(got == expect)
    IndexLifecycle.dropIndex(spark, store, "v")
  }
}
