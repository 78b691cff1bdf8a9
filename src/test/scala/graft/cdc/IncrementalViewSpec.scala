package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row image for the randomized IVM feed (file-scoped: product encoders
  * need a stable, TypeTag-visible type). */
case class VRow(id: Long, grp: String, v: Double)

/** The IVM algebra behind q79 on hand-built feeds: contribution signs,
  * group-moving updates, exact decimal cancellation, merge associativity. */
class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def base: DataFrame =
    Seq((1L, "a", 10.5), (2L, "a", 20.25), (3L, "b", 5.0))
      .toDF("id", "grp", "v")

  private def view(batches: Seq[DataFrame]): Map[String, (Long, Double)] =
    IncrementalView.maintain(batches, "grp", "v")
      .select($"grp", $"cnt", $"sum".cast("double"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("inserts then a group-moving update relocate the row exactly") {
    val b1 = ChangeFeed.inserts(base, $"id")
    // row 2 moves a -> b and is repriced
    val b2 = ChangeFeed.updates(base.filter($"id" === 2),
      Map("grp" -> lit("b"), "v" -> lit(7.75)), $"id" + 10)
    assert(view(Seq(b1, b2)) ==
      Map("a" -> (1L, 10.5), "b" -> (2L, 12.75)))
  }

  test("insert + delete cancel exactly; emptied groups disappear") {
    val b1 = ChangeFeed.inserts(base, $"id")
    val b2 = ChangeFeed.deletes(base.filter($"grp" === "b"), $"id" + 10)
    val got = view(Seq(b1, b2))
    assert(got == Map("a" -> (2L, 30.75)), s"b must vanish: $got")
  }

  test("distinct view: refcounts survive duplicate deletes and group moves (q193)") {
    def ndv(batches: Seq[DataFrame]): Map[String, (Long, Long)] =
      IncrementalView.maintainDistinct(batches, "grp", "v")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // two rows in 'a' share v=10.5 (dup value), one distinct 20.25
    val dup = Seq((1L, "a", 10.5), (2L, "a", 10.5), (3L, "a", 20.25),
      (4L, "b", 5.0)).toDF("id", "grp", "v")
    val b1 = ChangeFeed.inserts(dup, $"id")
    assert(ndv(Seq(b1)) == Map("a" -> (2L, 3L), "b" -> (1L, 1L)))
    // deleting ONE of the duplicate copies must NOT drop the ndv
    val b2 = ChangeFeed.deletes(dup.filter($"id" === 1), $"id" + 10)
    assert(ndv(Seq(b1, b2)) == Map("a" -> (2L, 2L), "b" -> (1L, 1L)))
    // deleting the LAST copy drops it
    val b3 = ChangeFeed.deletes(dup.filter($"id" === 2), $"id" + 20)
    assert(ndv(Seq(b1, b2, b3)) == Map("a" -> (1L, 1L), "b" -> (1L, 1L)))
    // a group-moving update relocates the value's refcount
    val b4 = ChangeFeed.updates(dup.filter($"id" === 3),
      Map("grp" -> lit("b")), $"id" + 30)
    assert(ndv(Seq(b1, b2, b3, b4)) == Map("b" -> (2L, 2L)))
  }

  test("merge is associative: pairwise grouping equals sequential fold") {
    val b1 = ChangeFeed.inserts(base, $"id")
    val b2 = ChangeFeed.updates(base.filter($"id" === 1),
      Map("v" -> ($"v" * 1.2)), $"id" + 10)
    val b3 = ChangeFeed.deletes(base.filter($"id" === 3), $"id" + 20)
    val ds = Seq(b1, b2, b3).map(IncrementalView.delta(_, "grp", "v"))
    def fin(df: DataFrame) = df.filter($"cnt" > 0)
      .select($"grp", $"cnt", $"sum".cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val leftFold = fin(IncrementalView.merge(
      IncrementalView.merge(ds(0), ds(1), "grp"), ds(2), "grp"))
    val rightFold = fin(IncrementalView.merge(
      ds(0), IncrementalView.merge(ds(1), ds(2), "grp"), "grp"))
    assert(leftFold == rightFold && leftFold.nonEmpty)
  }

  test("random feeds: the maintained view equals a fresh aggregation, exactly") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      // live table simulated driver-side so update/delete before-images
      // are always the CURRENT row (as a real binlog guarantees)
      val table = scala.collection.mutable.Map.empty[Long, VRow]
      var nextId = 0L
      def cents() = rng.nextInt(100000) / 100.0 // exact under DECIMAL(18,6)
      def grp() = s"g${rng.nextInt(4)}"
      val batches = (1 to 3).map { _ =>
        val evs = (1 to 40).map { _ =>
          val roll = rng.nextInt(10)
          if (roll < 5 || table.isEmpty) {
            val r = VRow({ nextId += 1; nextId }, grp(), cents())
            table(r.id) = r
            ("insert", None, Some(r))
          } else {
            val id = table.keys.toSeq(rng.nextInt(table.size))
            val before = table(id)
            if (roll < 8) { // update: reprice, sometimes move groups
              val after = before.copy(grp = grp(), v = cents())
              table(id) = after
              ("update", Some(before), Some(after))
            } else {
              table.remove(id)
              ("delete", Some(before), None)
            }
          }
        }
        evs.toDF("op", "before", "after")
      }
      val got = IncrementalView.maintain(batches, "grp", "v")
        .select($"grp", $"cnt", $"sum".cast("double"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = table.values.groupBy(_.grp).map { case (g, rs) =>
        g -> (rs.size.toLong,
          rs.map(r => BigDecimal(r.v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble)
      }
      assert(got == want, s"seed=$seed view=$got fresh=$want")
    }
  }

  test("min/max: deleting a group's extreme rescans it; interior deletes do not lie") {
    val rows = Seq((1L, "a", 1.0), (2L, "a", 5.0), (3L, "a", 9.0), (4L, "b", 2.0))
      .toDF("id", "grp", "v")
    val b1 = ChangeFeed.inserts(rows, $"id")
    // delete a's MIN (forces base rescan) and an interior insert for b
    val b2 = ChangeFeed.deletes(rows.filter($"id" === 1), $"id" + 10)
    val finalBase = rows.filter($"id" =!= 1)
    val got = IncrementalView.maintainMinMax(Seq(b1, b2), finalBase, "grp", "v")
      .select($"grp", $"cnt", $"mn", $"mx", $"avg")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got("a") == ((2L, 5.0, 9.0, 7.0)),
      s"deleted minimum must be recovered from the base: $got")
    assert(got("b") == ((1L, 2.0, 2.0, 2.0)))
  }

  test("random feeds: min/max/avg view equals a fresh aggregation, exactly") {
    for (seed <- 11 to 13) {
      val rng = new scala.util.Random(seed)
      val table = scala.collection.mutable.Map.empty[Long, VRow]
      var nextId = 0L
      def cents() = rng.nextInt(100000) / 100.0
      def grp() = s"g${rng.nextInt(4)}"
      val batches = (1 to 3).map { _ =>
        val evs = (1 to 40).map { _ =>
          val roll = rng.nextInt(10)
          if (roll < 5 || table.isEmpty) {
            val r = VRow({ nextId += 1; nextId }, grp(), cents())
            table(r.id) = r
            ("insert", None, Some(r))
          } else {
            val id = table.keys.toSeq(rng.nextInt(table.size))
            val before = table(id)
            if (roll < 8) {
              val after = before.copy(grp = grp(), v = cents())
              table(id) = after
              ("update", Some(before), Some(after))
            } else {
              table.remove(id)
              ("delete", Some(before), None)
            }
          }
        }
        evs.toDF("op", "before", "after")
      }
      val finalBase = table.values.toSeq.toDF()
      val got = IncrementalView.maintainMinMax(batches, finalBase, "grp", "v")
        .select($"grp", $"cnt", $"mn", $"mx")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
      val want = table.values.groupBy(_.grp).map { case (g, rs) =>
        g -> (rs.size.toLong, rs.map(_.v).min, rs.map(_.v).max)
      }
      assert(got == want, s"seed=$seed view=$got fresh=$want")
    }
  }

  test("streaming view: maintained across micro-batches, replay-safe, restartable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_view").toString
    val (viewDir, ckpt) = (s"$root/view", s"$root/ckpt")

    def snap(): Map[String, (Long, Double)] =
      IncrementalView.snapshotView(spark, viewDir).get
        .select($"grp", $"cnt", $"sum".cast("double"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // batches arrive as the (op, before, after) envelope
    def env(op: String, before: Option[VRow], after: Option[VRow]) = (op, before, after)
    val src = MemoryStream[(String, Option[VRow], Option[VRow])]
    val changes = src.toDF().toDF("op", "before", "after")
    val q1 = IncrementalView.startAggView(changes, viewDir, ckpt, "grp", "v")
    src.addData(env("insert", None, Some(VRow(1, "a", 10.5))),
      env("insert", None, Some(VRow(2, "b", 4.25))))
    q1.processAllAvailable()
    assert(snap() == Map("a" -> (1L, 10.5), "b" -> (1L, 4.25)))
    src.addData(env("update", Some(VRow(1, "a", 10.5)), Some(VRow(1, "b", 3.0))))
    q1.processAllAvailable()
    q1.stop()
    assert(snap() == Map("b" -> (2L, 7.25)), "group move must relocate the row")

    // replayed LAST batch id (the at-least-once crash case): exact no-op
    val replay = Seq(env("insert", None, Some(VRow(9, "b", 100.0))))
      .toDF("op", "before", "after")
    IncrementalView.applyViewBatch(spark, replay, batchId = 1L, viewDir, "grp", "v")
    assert(snap() == Map("b" -> (2L, 7.25)), "batch 1 was already applied")
    // an id BELOW the pointer is not a legal replay — it means a fresh
    // checkpoint was pointed at this view; must fail, not silently skip
    val e = intercept[IllegalStateException](
      IncrementalView.applyViewBatch(spark, replay, batchId = 0L, viewDir, "grp", "v"))
    assert(e.getMessage.contains("checkpoint/view mismatch"))

    // restart against the same checkpoint (same source, as a resumed
    // deployment would): the stream continues, only NEW ids apply
    src.addData(env("delete", Some(VRow(2, "b", 4.25)), None))
    val q2 = IncrementalView.startAggView(changes, viewDir, ckpt, "grp", "v")
    q2.processAllAvailable()
    q2.stop()
    assert(snap() == Map("b" -> (1L, 3.0)), "post-restart batch must apply once")
  }

  test("streaming min/max view: extreme-delete rescans against the live target, replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_vmm").toString
    val (target, viewDir, ckpt) = (s"$root/tbl", s"$root/view", s"$root/ckpt")
    val opts = CdcApplier.Options(Seq("id"))

    def snap(): Map[String, (Long, Double, Double)] =
      IncrementalView.snapshotView(spark, viewDir).get
        .select($"grp", $"cnt", $"mn", $"mx")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    def env(op: String, pos: Long, before: Option[VRow], after: Option[VRow]) =
      (op, pos, before, after)
    val src = MemoryStream[(String, Long, Option[VRow], Option[VRow])]
    // the CDC composition: the row applier keeps the primary current, and
    // the min/max view rescans AFFECTED keys against that same primary —
    // base is evaluated after the applier ran, inside one foreachBatch
    val q1 = src.toDF().toDF("op", "next_position", "before", "after")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CdcApplier.applyBatch(spark,
          b.select($"op", $"next_position", $"before", $"after"), target, opts)
        IncrementalView.applyViewBatchMinMax(spark, b, id, viewDir, "grp", "v",
          CdcApplier.snapshot(spark, target))
      }.start()

    src.addData(env("insert", 10L, None, Some(VRow(1, "a", 90.0))),
      env("insert", 11L, None, Some(VRow(2, "a", 80.0))),
      env("insert", 12L, None, Some(VRow(3, "b", 70.0))))
    q1.processAllAvailable()
    assert(snap() == Map("a" -> ((2L, 80.0, 90.0)), "b" -> ((1L, 70.0, 70.0))))

    // delete a's MINIMUM: the optimistic extreme is invalidated, so the
    // view must recover a.mn from the live primary (90 is the survivor)
    src.addData(env("delete", 20L, Some(VRow(2, "a", 80.0)), None))
    q1.processAllAvailable()
    q1.stop()
    assert(snap() == Map("a" -> ((1L, 90.0, 90.0)), "b" -> ((1L, 70.0, 70.0))),
      "deleted extreme must rescan from the primary")

    // replayed LAST batch id: exact no-op (the at-least-once crash case)
    val replay = Seq(env("delete", 30L, Some(VRow(3, "b", 70.0)), None))
      .toDF("op", "next_position", "before", "after")
    IncrementalView.applyViewBatchMinMax(spark, replay, 1L, viewDir, "grp", "v",
      spark.read.parquet(target))
    assert(snap() == Map("a" -> ((1L, 90.0, 90.0)), "b" -> ((1L, 70.0, 70.0))),
      "batch 1 was already applied")
  }

  test("update repricing accumulates as the exact decimal of the new price") {
    val b1 = ChangeFeed.inserts(base, $"id")
    val b2 = ChangeFeed.updates(base.filter($"id" === 1),
      Map("v" -> ($"v" * 3.0)), $"id" + 10)
    val got = view(Seq(b1, b2))
    // dec(10.5) + (dec(31.5) - dec(10.5)) == dec(31.5) exactly
    assert(got("a") == (2L, 31.5 + 20.25), got.toString)
  }
}
