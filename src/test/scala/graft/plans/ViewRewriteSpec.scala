package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApplier, ChangeFeed}

/** The materialized-view rewrite rule: fires on the exact registered
  * shape, refuses every near-miss (eagerness = wrong results). */
class ViewRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private val base = {
    val dir = Files.createTempDirectory("graft_mv").toString + "/base.parquet"
    spark.range(1, 101).select(
      $"id".as("k"), concat(lit("g"), $"id" % 3).as("grp"),
      ($"id" * 2.0).as("x"))
      .write.parquet(dir)
    dir
  }

  private def buildView(): String = {
    val viewDir = Files.createTempDirectory("graft_mv").toString + "/v"
    val rows = spark.read.parquet(base)
      .groupBy($"grp").agg(count(lit(1)).as("cnt"))
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows, lit(1L)), viewDir,
      CdcApplier.Options(Seq("grp"), numBuckets = 2))
    viewDir
  }

  private def agg(): DataFrame =
    spark.read.parquet(base).groupBy($"grp").agg(count(lit(1)).as("cnt"))

  test("registered count(*) aggregate rewrites to the view scan; results equal") {
    val viewDir = buildView()
    GraftViewRewrite.install(spark)
    GraftViewRewrite.register(base, "grp", viewDir)
    try {
      val q = agg()
      // fired = the Aggregate is GONE, replaced by the view snapshot read
      // (its tombstone filter is the signature)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Aggregate ["), "still aggregating the base: " + opt)
      assert(opt.contains("_graft_deleted"), "not reading the view store: " + opt)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("g0" -> 33L, "g1" -> 34L, "g2" -> 33L))
    } finally GraftViewRewrite.unregister(base, "grp")
  }

  test("near-misses pass through: filter present, different group, other agg, unregistered") {
    val viewDir = buildView()
    GraftViewRewrite.install(spark)
    GraftViewRewrite.register(base, "grp", viewDir)
    try {
      // a FILTERED aggregate is not the view's content — must not rewrite
      def stillAggregates(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.toString.contains("Aggregate [")
      val filtered = spark.read.parquet(base).filter($"k" > 50)
        .groupBy($"grp").agg(count(lit(1)).as("cnt"))
      assert(stillAggregates(filtered), "filtered aggregate must not rewrite")
      assert(filtered.collect().map(_.getLong(1)).sum == 50L)

      // different grouping column
      val otherG = spark.read.parquet(base).groupBy($"k").agg(count(lit(1)).as("cnt"))
      assert(stillAggregates(otherG), "different group must not rewrite")

      // a non-count aggregate
      val sumAgg = spark.read.parquet(base).groupBy($"grp").agg(sum($"x").as("cnt"))
      assert(stillAggregates(sumAgg), "sum aggregate must not rewrite")
    } finally GraftViewRewrite.unregister(base, "grp")
    // unregistered: back to the base scan
    assert(agg().queryExecution.optimizedPlan.toString.contains("Aggregate ["))
  }

  private def buildStatsView(): String = {
    val viewDir = Files.createTempDirectory("graft_mv").toString + "/sv"
    val rows = graft.cdc.IncrementalView.maintainMinMax(
      Seq(ChangeFeed.inserts(spark.read.parquet(base), lit(1L))),
      spark.read.parquet(base), "grp", "x")
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows, lit(1L)), viewDir,
      CdcApplier.Options(Seq("grp"), numBuckets = 2))
    viewDir
  }

  test("stats view serves any COUNT/SUM/MIN/MAX/AVG combination; results equal") {
    val viewDir = buildStatsView()
    GraftViewRewrite.install(spark)
    GraftViewRewrite.registerStats(base, "grp", "x", viewDir)
    try {
      val q = spark.read.parquet(base).groupBy($"grp")
        .agg(sum($"x").as("s"), max($"x").as("mx"), count(lit(1)).as("c"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Aggregate ["), "still aggregating the base: " + opt)
      assert(opt.contains("_graft_deleted"), "not reading the view store: " + opt)
      val got = q.collect()
        .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getLong(3))))
        .toMap
      // grp g1 = ids {1,4,...,100} step 3 -> 34 ids; x = 2*id
      assert(got("g1")._3 == 34L && got("g1")._2 == 200.0, got.toString)
      val fresh = spark.read.parquet(base).groupBy($"grp")
        .agg(sum($"x"), max($"x"), count(lit(1))).collect()
        .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getLong(3))))
        .toMap
      assert(got == fresh, s"rewritten != fresh: $got vs $fresh")
    } finally GraftViewRewrite.unregisterStats(base, "grp", "x")
  }

  test("stats near-misses pass through: distinct, wrong value column, expression arg") {
    val viewDir = buildStatsView()
    GraftViewRewrite.install(spark)
    GraftViewRewrite.registerStats(base, "grp", "x", viewDir)
    try {
      def stillAggregates(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.toString.contains("Aggregate [")
      assert(stillAggregates(spark.read.parquet(base).groupBy($"grp")
        .agg(sum_distinct($"x").as("s"))), "DISTINCT must not rewrite")
      assert(stillAggregates(spark.read.parquet(base).groupBy($"grp")
        .agg(sum($"k".cast("double")).as("s"))), "unregistered column must not rewrite")
      assert(stillAggregates(spark.read.parquet(base).groupBy($"grp")
        .agg(sum($"x" * 2).as("s"))), "expression argument must not rewrite")
    } finally GraftViewRewrite.unregisterStats(base, "grp", "x")
  }

  test("parents above the aggregate keep resolving (ExprId re-bind)") {
    val viewDir = buildView()
    GraftViewRewrite.install(spark)
    GraftViewRewrite.register(base, "grp", viewDir)
    try {
      val q = agg().filter($"cnt" > 33).orderBy($"grp".desc).limit(1)
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("g1", 34L)))
    } finally GraftViewRewrite.unregister(base, "grp")
  }
}
