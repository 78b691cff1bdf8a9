package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** exactQuantiles (the distributed sort-based exact percentile) must be
  * BIT-identical to Spark's buffering `percentile` — that is what keeps
  * q34's DuckDB oracle green — while never holding a whole group in one
  * task. */
class QuantileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def compare(
      df: org.apache.spark.sql.DataFrame, grp: String, col0: String,
      qs: Seq[Double]): Unit = {
    val specs = qs.zipWithIndex.map { case (q, i) => s"q$i" -> q }
    val ours = Advanced.exactQuantiles(df, grp, col0, specs)
      .collect().map(r => r.getString(0) -> r).toMap
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile($col0, ${q}D)").as(s"q$i")
    }
    val ref = df.groupBy(col(grp)).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ours.keySet == ref.keySet)
    for (k <- ref.keySet; i <- qs.indices) {
      val a = ours(k).getDouble(i + 1)
      val b = ref(k).getDouble(i + 1)
      assert(bits(a) == bits(b),
        s"group $k q=${qs(i)}: exactQuantiles=$a percentile=$b")
    }
  }

  test("bit-identical to percentile() on lineitem (integer-ish quantities)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    compare(li, "l_returnflag", "l_quantity", Seq(0.0, 0.25, 0.5, 0.95, 1.0))
  }

  test("bit-identical to percentile() on a near-unique double column") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    compare(li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.9, 0.99))
  }

  test("edge groups: size 1, size 2, heavy ties, nulls ignored") {
    import spark.implicits._
    val rows = Seq(
      ("a", Some(42.0)),                       // n=1 group
      ("b", Some(1.0)), ("b", Some(2.0)),      // n=2 group
      ("c", Some(7.0)), ("c", Some(7.0)), ("c", Some(7.0)), ("c", Some(9.0)),
      ("d", Some(3.0)), ("d", None), ("d", Some(5.0)) // NULL must be skipped
    ).toDF("g", "v")
    compare(rows, "g", "v", Seq(0.0, 0.1, 0.5, 0.75, 1.0))
  }

  test("all-NULL group is absent (callers restore it by joining from totals, as q34 does)") {
    import spark.implicits._
    val rows = Seq(("e", Option.empty[Double]), ("e", None), ("f", Some(1.0)))
      .toDF("g", "v")
    val got = Advanced.exactQuantiles(rows, "g", "v", Seq("p50" -> 0.5))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("f"), s"all-NULL group must be absent, got $got")
  }

  test("many range partitions on tiny data still correct") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("g" + (i % 3), i.toDouble))
      .toDF("g", "v")
    val specs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val wide = Advanced.exactQuantiles(rows, "g", "v", specs, rangeParts = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val narrow = Advanced.exactQuantiles(rows, "g", "v", specs, rangeParts = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(wide == narrow)
  }

  test("plan holds no per-group percentile buffer; rank windows are per range-partition") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val df = Advanced.exactQuantiles(li, "l_returnflag", "l_extendedprice",
      Seq("p25" -> 0.25))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("percentile("), p)         // no buffering aggregate
    // the ranged exchange itself sits behind the pid-stamp localCheckpoint
    // (one physical partitioning for both consumers), so downstream the
    // plan starts from the checkpointed scan; what must hold here is that
    // the rank window is keyed by (_pid, _g) — bounded per range
    // partition, never a whole group on one task
    assert(p.contains("windowspecdefinition(_pid"), p)
    assert(p.contains("Scan ExistingRDD"), p)     // the checkpointed ranged frame
  }
}
