package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Correctness properties of the curation operators (q119–q122) beyond the
  * DuckDB hash gate: the z-curve's span bound and invertibility, the diff's
  * status partition, leakage soundness/completeness, and the training-order
  * permutation property. */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("zOrder is invertible: deinterleaving the code recovers both inputs") {
    import spark.implicits._
    val pts = for (px <- 0L until 256L by 17; py <- 0L until 256L by 13) yield (px, py)
    val z = pts.toDF("px", "py").withColumn("zval", Curation.zOrder(col("px"), col("py")))
    val back = z.withColumn("rx",
        (0 until Curation.ZBits).map(i =>
          shiftleft(shiftright(col("zval"), 2 * i).bitwiseAND(lit(1L)), i)).reduce(_ + _))
      .withColumn("ry",
        (0 until Curation.ZBits).map(i =>
          shiftleft(shiftright(col("zval"), 2 * i + 1).bitwiseAND(lit(1L)), i)).reduce(_ + _))
    assert(back.filter(col("rx") =!= col("px") || col("ry") =!= col("py")).count() == 0)
  }

  test("q119: every z-cell's per-dimension span respects the 2^6 bound") {
    val cells = Curation.queries("q119_zorder_layout")(spark, sf).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (minPx, maxPx) = (r.getAs[Long]("min_px"), r.getAs[Long]("max_px"))
      val (minPy, maxPy) = (r.getAs[Long]("min_py"), r.getAs[Long]("max_py"))
      assert(maxPx - minPx < 64, s"px span too wide in cell ${r.getAs[Long]("zcell")}")
      assert(maxPy - minPy < 64, s"py span too wide in cell ${r.getAs[Long]("zcell")}")
    }
  }

  test("q120: statuses land exactly on the mutation predicates") {
    val diff = Curation.queries("q120_corpus_diff")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
    assert(diff.nonEmpty)
    val byStatus = diff.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed"))
    assert(byStatus("removed").forall(_ % 7 == 0))
    assert(byStatus("added").forall(id =>
      id >= Curation.DiffAddBase && (id - Curation.DiffAddBase) % 11 == 0))
    // changed = re-crawled docs that survived deletion
    assert(byStatus("changed").forall(id => id % 5 == 0 && id % 7 != 0))
    // nothing silently dropped: every deleted doc shows up as removed
    assert(byStatus("removed").size ==
      Tables.load(spark, sf, "documents").filter("doc_id % 7 = 0").count())
  }

  test("q121: every reported pair is a true cross-split content collision, and every planted cross-split copy is found") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.load(spark, sf, "documents")
    val split = (id: org.apache.spark.sql.Column) =>
      TextOps.polyHash(id.cast("string")) % 10 < Curation.TrainBuckets
    val leaks = Curation.queries("q121_split_leakage")(spark, sf)
      .collect().map(r => r.getAs[Long]("test_doc") -> r.getAs[Long]("train_doc"))
    assert(leaks.nonEmpty, "the planted copies must produce at least one leak")
    // soundness: test side really is test, train side really is train
    val sides = docs.select(col("doc_id"), split(col("doc_id")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap ++
      docs.filter(col("doc_id") % 9 === 4)
        .select((col("doc_id") + Curation.LeakCopyBase).as("doc_id"),
          split(col("doc_id") + Curation.LeakCopyBase).as("t"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    leaks.foreach { case (te, tr) =>
      assert(!sides(te), s"$te reported as test but hashes to train")
      assert(sides(tr), s"$tr reported as train but hashes to test")
    }
    // completeness: each planted copy whose split differs from its original
    // must appear (as test doc or as the matching train doc)
    val planted = docs.filter(col("doc_id") % 9 === 4)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val reported = leaks.flatMap(p => Seq(p._1, p._2)).toSet
    planted.foreach { orig =>
      val copy = orig + Curation.LeakCopyBase
      if (sides(orig) != sides(copy)) {
        val testSide = if (sides(orig)) copy else orig
        assert(reported.contains(testSide),
          s"cross-split planted pair ($orig, $copy) missing from the audit")
      }
    }
  }

  test("q122: positions form the exact permutation ordered by the epoch key") {
    val rows = Curation.queries("q122_train_order")(spark, sf)
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"), r.getAs[String]("okey")))
    val n = Tables.load(spark, sf, "documents").count()
    assert(rows.length == n)
    assert(rows.map(_._1).toSeq == (0L until n), "positions must be 0..N-1 exactly once")
    // global order agrees with (bucket, key) — i.e. with the md5 key, since
    // the bucket is the key's first hex digit
    val keysInPosOrder = rows.sortBy(_._1).map(_._3).toSeq
    assert(keysInPosOrder == keysInPosOrder.sorted, "pos order must equal md5-key order")
  }
}
