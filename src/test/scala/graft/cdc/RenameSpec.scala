package graft.cdc

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q258 column mapping: meta-only renames, read-side logicalization on
  * every serving edge, write-side translation for new-name batches and
  * old-name replays, guard rails, and composition with evolution ops. */
class RenameSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def newTarget(): String =
    Files.createTempDirectory("graft_ren").toString + "/t"
  private val opts = CdcApplier.Options(Seq("k"), numBuckets = 4)

  private def rows(n: Int): DataFrame =
    spark.range(1, n + 1).select($"id".as("k"), ($"id" * 2.0).as("v"),
      concat(lit("t"), $"id" % 3).as("tag"))

  private def metaOf(t: String) = CdcApplier.TargetMeta.read(
    spark.sparkContext.hadoopConfiguration, new Path(t))

  test("rename is meta-only: no data file changes; reads serve the new name") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(40), $"k" * 10), t, opts)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[(String, Long)] =
      CdcApplier.bucketIds(fs, new Path(t)).flatMap { b =>
        fs.listStatus(new Path(t, s"${CdcApplier.BUCKET}=$b"))
          .filterNot(_.getPath.getName.startsWith("."))
          .map(f => (f.getPath.toString, f.getModificationTime))
      }.toSet
    val before = dataFiles()
    CdcApplier.renameColumn(spark, t, "v", "value")
    assert(dataFiles() == before, "a rename must not touch any data file")
    val snap = CdcApplier.snapshot(spark, t)
    assert(snap.columns.contains("value") && !snap.columns.contains("v"))
    assert(snap.filter($"k" === 3).select($"value").as[Double].head() == 6.0)
  }

  test("write-side translation: new-name batch applies, old-name replay converges") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(30), $"k" * 10), t, opts)
    CdcApplier.renameColumn(spark, t, "v", "value")
    val renamed = rows(30).withColumnRenamed("v", "value")
    CdcApplier.applyBatch(spark, ChangeFeed.updates(renamed.filter($"k" % 3 === 0),
      Map("value" -> ($"value" * 10)), $"k" * 10 + 5), t, opts)
    // an OLD-schema batch replays with the physical name at a newer pos
    CdcApplier.applyBatch(spark, ChangeFeed.updates(rows(30).filter($"k" === 6),
      Map("v" -> lit(-1.0)), lit(999L)), t, opts)
    val got = CdcApplier.snapshot(spark, t)
      .select($"k", $"value").as[(Long, Double)].collect().toMap
    assert(got(3L) == 3 * 2.0 * 10)
    assert(got(6L) == -1.0, "the newer old-name replay must win")
    assert(got(5L) == 5 * 2.0)
  }

  test("guards: PK, layout, unknown, collisions; rename-back clears the map") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(10), $"k" * 10), t, opts)
    intercept[IllegalArgumentException] { CdcApplier.renameColumn(spark, t, "k", "id") }
    intercept[IllegalArgumentException] { CdcApplier.renameColumn(spark, t, "nope", "x") }
    intercept[IllegalArgumentException] { CdcApplier.renameColumn(spark, t, "v", "tag") }
    intercept[IllegalArgumentException] { CdcApplier.renameColumn(spark, t, "v", "bad name") }
    CdcApplier.renameColumn(spark, t, "v", "value")
    // the freed physical name may not be taken by another column
    intercept[IllegalArgumentException] { CdcApplier.renameColumn(spark, t, "tag", "v") }
    // rename back to the physical name clears the mapping entirely
    CdcApplier.renameColumn(spark, t, "value", "v")
    assert(metaOf(t).get.renames.isEmpty)
    assert(CdcApplier.snapshot(spark, t).columns.contains("v"))
  }

  test("chained rename keeps ONE mapping to the original physical name") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(10), $"k" * 10), t, opts)
    CdcApplier.renameColumn(spark, t, "v", "b")
    CdcApplier.renameColumn(spark, t, "b", "c")
    assert(metaOf(t).get.renames.get == Map("c" -> "v"))
    assert(CdcApplier.snapshot(spark, t).columns.contains("c"))
  }

  test("mor: rename serves logically through snapshot, as-of, change feed, lookups") {
    val t = newTarget()
    val o = CdcApplier.Options(Seq("k"))
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows(20), lit(100L)), t, o)
    CdcApplier.renameColumn(spark, t, "v", "value")
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(rows(20).withColumnRenamed("v", "value").filter($"k" % 2 === 0),
        Map("value" -> ($"value" * 3)), lit(200L)), t, o)
    assert(CdcApplier.snapshot(spark, t).select($"k", $"value")
      .as[(Long, Double)].collect().toMap.apply(2L) == 12.0)
    assert(CdcApplier.snapshotAsOf(spark, t, 100L).select($"k", $"value")
      .as[(Long, Double)].collect().toMap.apply(2L) == 4.0)
    // change feed envelope speaks the logical name
    val feed = CdcApplier.changeFeed(spark, t, 100L)
    val afterFields = feed.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(afterFields.contains("value") && !afterFields.contains("v"))
    // point lookup serves logical
    val keys = Seq(2L).toDF("k")
    assert(CdcApplier.pointLookup(spark, t, keys).columns.contains("value"))
  }

  // ---- q259 drops ---------------------------------------------------------

  test("drop is meta-only; serving edges exclude; batches both ways converge") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(30), $"k" * 10), t, opts)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[(String, Long)] =
      CdcApplier.bucketIds(fs, new Path(t)).flatMap { b =>
        fs.listStatus(new Path(t, s"${CdcApplier.BUCKET}=$b"))
          .filterNot(_.getPath.getName.startsWith("."))
          .map(f => (f.getPath.toString, f.getModificationTime))
      }.toSet
    val before = dataFiles()
    CdcApplier.dropColumn(spark, t, "tag")
    assert(dataFiles() == before, "a drop must not touch any data file")
    assert(!CdcApplier.snapshot(spark, t).columns.contains("tag"))
    // post-drop batch omits the column
    CdcApplier.applyBatch(spark,
      ChangeFeed.updates(rows(30).drop("tag").filter($"k" % 3 === 0),
        Map("v" -> ($"v" * 10)), $"k" * 10 + 5), t, opts)
    // pre-drop replay still carries it, at a newer position
    CdcApplier.applyBatch(spark, ChangeFeed.updates(rows(30).filter($"k" === 6),
      Map("v" -> lit(-1.0)), lit(999L)), t, opts)
    val got = CdcApplier.snapshot(spark, t)
      .select($"k", $"v").as[(Long, Double)].collect().toMap
    assert(got(3L) == 60.0 && got(6L) == -1.0 && got(5L) == 10.0)
  }

  test("drop guards: PK refuses, unknown refuses, renamed column drops by its logical name") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(10), $"k" * 10), t, opts)
    intercept[IllegalArgumentException] { CdcApplier.dropColumn(spark, t, "k") }
    intercept[IllegalArgumentException] { CdcApplier.dropColumn(spark, t, "ghost") }
    CdcApplier.renameColumn(spark, t, "v", "value")
    CdcApplier.dropColumn(spark, t, "value")
    val m = metaOf(t).get
    assert(m.drops.get == Seq("v") && m.renames.isEmpty,
      "dropping a renamed column retires its PHYSICAL name and clears the mapping")
    // double-drop refuses; renaming the retired name refuses
    intercept[IllegalArgumentException] { CdcApplier.dropColumn(spark, t, "value") }
    intercept[IllegalArgumentException] { CdcApplier.renameColumn(spark, t, "v", "w") }
  }

  test("renames and drops survive an additive-evolution batch (meta is copied, never rebuilt)") {
    val t = newTarget()
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows(20), $"k" * 10), t, opts)
    CdcApplier.renameColumn(spark, t, "v", "value")
    CdcApplier.dropColumn(spark, t, "tag")
    // an EVOLVING batch (new column `extra`) hits the schema-refresh meta
    // write — which used to rebuild TargetMeta from scratch, silently
    // wiping the rename (column-not-found) and resurrecting the drop
    val evolvedRows = rows(20).withColumnRenamed("v", "value").drop("tag")
      .withColumn("extra", $"k" * 3)
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(evolvedRows, lit(500L)), t, opts)
    val m = metaOf(t).get
    assert(m.renames.get == Map("value" -> "v"), "rename must survive evolution")
    assert(m.drops.get == Seq("tag"), "drop must survive evolution")
    val snap = CdcApplier.snapshot(spark, t)
    assert(snap.columns.contains("value") && snap.columns.contains("extra") &&
      !snap.columns.contains("v") && !snap.columns.contains("tag"))
    assert(snap.filter($"k" === 4).select($"extra").as[Long].head() == 12L)
  }

  test("composition: widen and backfill name columns logically after a rename") {
    val t = newTarget()
    val intRows = spark.range(1, 11).select($"id".as("k"),
      ($"id" % 100).cast("int").as("qty"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(intRows, $"k" * 10), t,
      CdcApplier.Options(Seq("k"), numBuckets = 4))
    CdcApplier.renameColumn(spark, t, "qty", "quantity")
    CdcApplier.widenColumn(spark, t, "quantity",
      org.apache.spark.sql.types.LongType)
    val snap = CdcApplier.snapshot(spark, t)
    assert(snap.schema("quantity").dataType ==
      org.apache.spark.sql.types.LongType)
    // backfill expression references the LOGICAL name
    CdcApplier.backfill(spark, t, "qty2", col("quantity") * 2)
    assert(CdcApplier.snapshot(spark, t).filter($"k" === 4)
      .select($"qty2").as[Long].head() == 8L)
  }
}
