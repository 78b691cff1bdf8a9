package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApplier, ChangeFeed}

/** Storage-partitioned joins (q255): two graft tables bucketed on the same
  * key with the same modulus must join with ZERO shuffle through the V2
  * catalog, and every refusal path must fall back to a (correct) shuffle
  * join rather than a wrong co-location. Also pins the bind-time identity:
  * [[GraftBucketFunction]]'s interpreted fold ≡ the writer's own
  * `pmod(hash(cols), n)` for every hashable key shape. */
class SpjSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private lazy val whRoot: String = {
    val r = Files.createTempDirectory("graft_spj_cat").toString
    spark.conf.set("spark.sql.catalog.spjcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjcat.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    r
  }

  private def facts(n: Int): DataFrame =
    spark.range(1, n + 1).select(
      $"id".as("fk"), ($"id" % 40).as("dim_k"), ($"id" * 1.5).as("v"))
  private def dims(n: Int): DataFrame =
    spark.range(0, n).select($"id".as("dk"), concat(lit("d"), $"id").as("name"))

  /** Create + populate a table through the catalog; returns its dir. */
  private def mkTable(name: String, df: DataFrame, opts: CdcApplier.Options,
      posOf: org.apache.spark.sql.Column, mor: Boolean = false): String = {
    whRoot
    spark.sql(s"DROP TABLE IF EXISTS spjcat.ns.$name")
    val storage = if (mor) ", storage 'mor'" else ""
    val bc = opts.bucketCols.map(c => s", bucketCols '${c.mkString(",")}'").getOrElse("")
    spark.sql(s"""CREATE TABLE spjcat.ns.$name (${df.schema.toDDL})
      OPTIONS (pk '${opts.pkCols.mkString(",")}', buckets '${opts.numBuckets}'$storage$bc)""")
    val dir = s"$whRoot/ns/$name"
    if (mor) CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(df, posOf), dir, opts)
    else CdcApplier.applyBatch(spark, ChangeFeed.inserts(df, posOf), dir, opts)
    dir
  }

  private def withSpjConf[T](f: => T): T = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true")
    spark.conf.set(keys(1), "-1")
    try f
    finally saved.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def executedPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("co-bucketed fact-dim join runs with zero shuffle and right rows") {
    val f = facts(300)
    val d = dims(40)
    mkTable("f1", f, CdcApplier.Options(Seq("dim_k", "fk"),
      bucketCols = Some(Seq("dim_k")), numBuckets = 8), $"fk" * 10)
    mkTable("d1", d, CdcApplier.Options(Seq("dk"), numBuckets = 8), $"dk" * 10)
    withSpjConf {
      val j = spark.sql(
        """SELECT f.fk, f.dim_k, d.name, f.v FROM spjcat.ns.f1 f
           JOIN spjcat.ns.d1 d ON f.dim_k = d.dk""")
      val plan = executedPlan(j)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("GraftBatchScan"), plan)
      val got = j.select($"fk", $"name").as[(Long, String)].collect().toMap
      assert(got.size == 300)
      assert(got(7L) == "d7" && got(40L) == "d0")
    }
  }

  test("merge-on-read side resolves reader-locally inside the zero-shuffle join") {
    val f = facts(200)
    mkTable("f2", f, CdcApplier.Options(Seq("dim_k", "fk"),
      bucketCols = Some(Seq("dim_k")), numBuckets = 8), $"fk" * 10, mor = true)
    // superseding update wave: v doubles for %3 keys; a stale read would
    // serve the original v through the join
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(f.filter($"fk" % 3 === 0), Map("v" -> ($"v" * 2)),
        $"fk" * 10 + 5),
      s"$whRoot/ns/f2",
      CdcApplier.Options(Seq("dim_k", "fk"), bucketCols = Some(Seq("dim_k")),
        numBuckets = 8))
    mkTable("d2", dims(40), CdcApplier.Options(Seq("dk"), numBuckets = 8), $"dk" * 10)
    withSpjConf {
      val j = spark.sql(
        """SELECT f.fk, f.v, d.name FROM spjcat.ns.f2 f
           JOIN spjcat.ns.d2 d ON f.dim_k = d.dk""")
      val plan = executedPlan(j)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      val v = j.select($"fk", $"v").as[(Long, Double)].collect().toMap
      assert(v(6L) == 6 * 1.5 * 2 && v(7L) == 7 * 1.5)
    }
  }

  test("mismatched modulus falls back to a shuffle join with identical results") {
    mkTable("f3", facts(150), CdcApplier.Options(Seq("dim_k", "fk"),
      bucketCols = Some(Seq("dim_k")), numBuckets = 8), $"fk" * 10)
    mkTable("d3", dims(40), CdcApplier.Options(Seq("dk"), numBuckets = 4), $"dk" * 10)
    withSpjConf {
      val j = spark.sql(
        """SELECT f.fk, d.name FROM spjcat.ns.f3 f
           JOIN spjcat.ns.d3 d ON f.dim_k = d.dk""")
      val plan = executedPlan(j)
      assert(plan.contains("Exchange"), s"expected shuffle fallback:\n$plan")
      assert(j.count() == 150)
    }
  }

  test("range layouts report no bucket transform (never co-locate on the wrong math)") {
    val f = facts(100)
    spark.sql("DROP TABLE IF EXISTS spjcat.ns.fr")
    whRoot
    spark.sql(s"""CREATE TABLE spjcat.ns.fr (${f.schema.toDDL})
      OPTIONS (pk 'fk', rangeBounds '30,60')""")
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(f, $"fk" * 10),
      s"$whRoot/ns/fr",
      CdcApplier.Options(Seq("fk"), rangeBounds = Some(Seq(30L, 60L))))
    val t = new graft.sources.GraftTable(s"$whRoot/ns/fr",
      GraftTable.tableSchema(spark, s"$whRoot/ns/fr"), spjCapable = true)
    assert(t.partitioning().isEmpty)
    // hash layout DOES report it — but only when served by the graft
    // catalog (spjCapable); a path-based table must stay silent (the
    // session catalog cannot resolve `bucket` and would throw, q226)
    val th = new graft.sources.GraftTable(s"$whRoot/ns/f3",
      GraftTable.tableSchema(spark, s"$whRoot/ns/f3"), spjCapable = true)
    assert(th.partitioning().map(_.toString).toSeq == Seq("bucket(8, dim_k)"))
    val tp = new graft.sources.GraftTable(s"$whRoot/ns/f3",
      GraftTable.tableSchema(spark, s"$whRoot/ns/f3"))
    assert(tp.partitioning().isEmpty)
  }

  test("bucket function ≡ the writer's assignment for every hashable key shape") {
    val fn = GraftBucketFunction
    // long, string, int, composite (long,string) — writer truth via the
    // applier's own bucketExprCols over literals
    def writerBucket(n: Int, vals: Seq[org.apache.spark.sql.Column]): Int =
      CdcApplier.bucketIdsOf(spark, Seq(vals), n, None).head
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val k = rnd.nextLong()
      val b = fn.bind(StructType(Seq(
        StructField("_0", IntegerType, nullable = false),
        StructField("_1", LongType))))
        .asInstanceOf[GraftBucketBound]
      val got = b.produceResult(org.apache.spark.sql.catalyst.InternalRow(n, k))
      assert(got == writerBucket(n, Seq(lit(k))), s"long key $k mod $n")
    }
    (1 to 20).foreach { i =>
      val n = 1 + rnd.nextInt(32)
      val sv = s"key-$i-${rnd.nextInt(1000)}"
      val b = fn.bind(StructType(Seq(
        StructField("_0", IntegerType, nullable = false),
        StructField("_1", StringType))))
        .asInstanceOf[GraftBucketBound]
      val got = b.produceResult(org.apache.spark.sql.catalyst.InternalRow(
        n, org.apache.spark.unsafe.types.UTF8String.fromString(sv)))
      assert(got == writerBucket(n, Seq(lit(sv))), s"string key $sv mod $n")
    }
    // composite
    val bc = fn.bind(StructType(Seq(
      StructField("_0", IntegerType, nullable = false),
      StructField("_1", LongType), StructField("_2", StringType))))
      .asInstanceOf[GraftBucketBound]
    (1 to 20).foreach { i =>
      val n = 1 + rnd.nextInt(32)
      val k1 = rnd.nextLong(); val k2 = s"c$i"
      val got = bc.produceResult(org.apache.spark.sql.catalyst.InternalRow(
        n, k1, org.apache.spark.unsafe.types.UTF8String.fromString(k2)))
      assert(got == writerBucket(n, Seq(lit(k1), lit(k2))), s"composite ($k1,$k2) mod $n")
    }
    // null key column: hash seed passes through unchanged (writer rule)
    val bn = fn.bind(StructType(Seq(
      StructField("_0", IntegerType, nullable = false),
      StructField("_1", LongType))))
      .asInstanceOf[GraftBucketBound]
    val gotNull = bn.produceResult(org.apache.spark.sql.catalyst.InternalRow(8, null))
    assert(gotNull == writerBucket(8, Seq(lit(null).cast("bigint"))))
    // unhashable type refuses to bind
    intercept[Exception] {
      fn.bind(StructType(Seq(
        StructField("_0", IntegerType, nullable = false),
        StructField("_1", org.apache.spark.sql.types.ArrayType(LongType)))))
    }
  }
}
