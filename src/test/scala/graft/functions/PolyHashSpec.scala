package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native graft_polyhash expression: interpreted eval == codegen eval ==
  * the reference HOF fold it replaced, plus null handling and the
  * SparkSessionExtensions injection path. */
class PolyHashSpec extends AnyFunSuite {
  // NOTE: specs share one JVM; getOrCreate() may return a session built by
  // another suite, whose configs (including spark.sql.extensions) are fixed.
  // Register imperatively; the extensions hook is covered separately below.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  import spark.implicits._

  test("GraftExtensions injects every native function") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must accept all registry entries
    assert(GraftFunctions.entries.map(_._1.funcName).sorted ==
      Seq("graft_bitmap", "graft_bloom_might", "graft_dot", "graft_fingerprint",
        "graft_gram_hashes", "graft_i8quant", "graft_maxabs", "graft_minhash_sig",
        "graft_normalize", "graft_polyhash", "graft_qdot", "graft_rep_stats",
        "graft_shingle_hashes", "graft_simhash", "graft_winnow"))
  }

  test("graft_bloom_might: kernel equals the scala reference; probe stays in-plan") {
    import graft.ext.NearDup.Bloom
    val numBits = 1 << 12
    val k = 7
    val bits = new Array[Long](numBits >>> 6)
    val members = (0 until 200).map(i => 0x9E3779B97F4A7C15L * i + 17)
    members.foreach(h => Bloom.set(bits, h, numBits, k))
    // no false negatives by construction; kernel must agree with the scala
    // reference on members AND on a non-member sweep (some of which are FPs
    // — agreement, not absence, is the contract)
    val probes = members ++ (0 until 500).map(i => 0xC2B2AE3D27D4EB4FL * i + 3)
    val df = probes.toDF("h")
      .withColumn("m", expr(s"graft_bloom_might(h, ${bits.mkString("array(", "L,", "L)")}, $numBits, $k)"))
    val got = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { h =>
      assert(got(h) == Bloom.mightContain(bits, h, numBits, k), s"h=$h")
    }
    members.foreach(h => assert(got(h), s"member $h must probe true"))
    // the probe is a native expression — in-plan over a real scan (a local
    // relation constant-folds the whole projection), no ScalaUDF node
    val planDf = spark.range(3)
      .selectExpr(s"graft_bloom_might(id, ${bits.mkString("array(", "L,", "L)")}, $numBits, $k) AS m")
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might") && !plan.toLowerCase.contains("scalaudf"),
      plan.take(2000))
  }

  test("graft_winnow: window minima, distinct sorted, short-text edges, MOSS guarantee") {
    def ph(x: String) = x.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    def reference(s: String, k: Int, w: Int): Seq[Long] = {
      if (s.length < k) return Seq.empty
      val hs = s.sliding(k).map(ph).toVector
      val nw = math.max(hs.length - w + 1, 1)
      (0 until nw).map(i => hs.slice(i, math.min(i + w, hs.length)).min)
        .distinct.sorted
    }
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaa",      // constant text: all gram hashes equal, 1 fp
      "abcd",              // shorter than k -> empty
      "abcdef",            // exactly one gram -> one window over it
      "")
    val (k, w) = (5, 4)
    val got = texts.toDF("s")
      .select(call_function("graft_winnow", $"s", lit(k), lit(w),
        lit(31), lit(1000000007L)).as("fps"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == texts.map(reference(_, k, w)))
    // MOSS guarantee: two texts sharing a >= k+w-1 char run share a fp
    val shared = "zqxwvutsrqponm" // 14 chars >= 5+4-1
    val a = reference("prefix " + shared + " suffixone", k, w).toSet
    val b = reference("other lead " + shared + " trail", k, w).toSet
    assert((a intersect b).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("graft_maxabs / graft_i8quant / graft_qdot: int8 quantization kernels (q66)") {
    // codes = floor(x * 127 / maxabs + 0.5) as signed bytes; extremes hit +-127
    val df = Seq((1, Array(0.5f, -1.0f, 0.25f, 0.0f)), (2, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
      .select($"id",
        call_function("graft_maxabs", $"v").as("m"),
        call_function("graft_i8quant", $"v").as("c"))
      .orderBy($"id").collect()
    assert(df(0).getDouble(1) == 1.0)
    val codes = df(0).getAs[Array[Byte]](2)
    def q(x: Float, m: Double): Byte = math.floor(x.toDouble * 127.0 / m + 0.5).toByte
    assert(codes.toSeq == Seq(q(0.5f, 1.0), q(-1.0f, 1.0), q(0.25f, 1.0), q(0.0f, 1.0)))
    assert(codes(1) == -127) // the -maxabs component maps to exactly -127
    // the all-zero vector quantizes to all-zero codes, not a NaN division
    assert(df(1).getDouble(1) == 0.0)
    assert(df(1).getAs[Array[Byte]](2).toSeq == Seq[Byte](0, 0, 0, 0))

    // integer code dot: exact, order-independent; null on length mismatch
    val d = Seq((Array[Byte](1, -2, 3), Array[Byte](4, 5, -6)))
      .toDF("a", "b")
      .select(call_function("graft_qdot", $"a", $"b").as("d")).first()
    assert(d.getLong(0) == (1 * 4 + -2 * 5 + 3 * -6).toLong)
    val mm = Seq((Array[Byte](1), Array[Byte](1, 2))).toDF("a", "b")
      .select(call_function("graft_qdot", $"a", $"b").as("d")).first()
    assert(mm.isNullAt(0))

    // edge contract in lockstep with the DuckDB oracle: the empty vector
    // yields null (list_max of [] is NULL), a non-finite component fails
    // loudly (the oracle's CAST(floor(NaN)) would abort there too)
    val empty = Seq(Tuple1(Array.empty[Float])).toDF("v")
      .select(call_function("graft_maxabs", $"v").as("m"),
        call_function("graft_i8quant", $"v").as("c")).first()
    assert(empty.isNullAt(0) && empty.isNullAt(1))
    // the error may surface raw (driver-side eval) or SparkException-wrapped
    val nan = intercept[Exception] {
      Seq(Tuple1(Array(1.0f, Float.NaN))).toDF("v")
        .select(call_function("graft_i8quant", $"v")).collect()
    }
    assert(Iterator.iterate[Throwable](nan)(_.getCause).takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage).exists(_.contains("non-finite"))), nan.toString)
  }

  test("graft_bitmap: membership bits against a sorted dict; AND-popcount = intersection") {
    val dict = Seq(5L, 10L, 15L, 20L, 25L)
    val bms = Seq((1, Seq(5L, 15L, 25L)), (2, Seq(10L, 15L, 99L))) // 99 not in dict -> ignored
      .toDF("id", "hs")
      .select($"id", org.apache.spark.sql.functions.call_function(
        "graft_bitmap", $"hs", org.apache.spark.sql.functions.typedLit(dict)).as("bm"))
      .orderBy($"id")
      .collect().map(_.getSeq[Long](1))
    assert(bms(0) == Seq(1L | (1L << 2) | (1L << 4))) // bits 0,2,4 = {5,15,25}
    assert(bms(1) == Seq((1L << 1) | (1L << 2)))      // bits 1,2   = {10,15}
    assert(java.lang.Long.bitCount(bms(0).head & bms(1).head) == 1) // intersection {15}
  }

  test("graft_fingerprint: fused min-shingle-polyhash equals the compositional form") {
    val df = Seq("the quick brown fox", "abcd", "abcde").toDF("s")
    val fused = df.select(org.apache.spark.sql.functions.call_function(
        "graft_fingerprint", $"s", lit(5), lit(31), lit(1000000007L)).as("fp"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    def ph(x: String) = x.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    def expect(x: String) =
      if (x.length < 5) None
      else Some(x.sliding(5).map(ph).min)
    assert(fused == Seq("the quick brown fox", "abcd", "abcde").map(expect))
  }

  private def hofFold(s: String, base: Long, mod: Long): Long =
    s.foldLeft(0L)((acc, c) => (acc * base + c) % mod)

  test("graft_polyhash matches a scala fold (codegen path)") {
    val df = Seq("hello", "world", "", "a b c 123", "x" * 500).toDF("s")
      .select($"s", expr("graft_polyhash(s, 31, 1000000007L)").as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == hofFold(r.getString(0), 31, 1000000007L), s"for '${r.getString(0)}'")
    }
  }

  test("known vector matches the DuckDB oracle fold value") {
    // duckdb: list_reduce fold over 'hello' chars with base 31 mod 1e9+7
    val h = Seq("hello").toDF("s")
      .select(expr("graft_polyhash(s, 31, 1000000007L)")).first().getLong(0)
    assert(h == 99162322L)
  }

  test("null input yields null; works through call_function and groupBy") {
    val df = Seq(Some("abc"), None).toDF("s")
      .select(call_function("graft_polyhash", $"s", lit(31), lit(1000000007L)).as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)

    // usable inside codegen'd aggregates (the minhash/simhash shape)
    val agg = Seq("aa", "ab", "aa").toDF("s")
      .groupBy(call_function("graft_polyhash", $"s", lit(131), lit(998244353L)).as("h"))
      .count().collect()
    assert(agg.length == 2)
  }

  test("graft_dot: index-order double accumulation over float arrays") {
    val df = Seq((Array(1.5f, -2.0f, 0.25f), Array(4.0f, 0.5f, 8.0f))).toDF("a", "b")
      .select(call_function("graft_dot", $"a", $"b").as("d"))
    val expect = 1.5 * 4.0 + (-2.0) * 0.5 + 0.25 * 8.0
    assert(df.first().getDouble(0) == expect)

    // float x double (the hyperplane-literal case)
    val mixed = Seq((Array(2.0f, 3.0f), Array(0.5, -1.0))).toDF("a", "b")
      .select(call_function("graft_dot", $"a", $"b").as("d"))
    assert(mixed.first().getDouble(0) == 2.0 * 0.5 + 3.0 * -1.0)

    // null semantics match the zip_with/aggregate fold it replaced:
    // length mismatch and null elements yield NULL, not an error or a 0-fill
    val edge = spark.sql(
      """SELECT graft_dot(array(1.0D), array(1.0D, 2.0D)) AS mismatch,
                graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS nullelem""")
      .first()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    withCodegenDisabled {
      val h = Seq("interpreted path").toDF("s")
        .select(expr("graft_polyhash(s, 31, 1000000007L)")).first().getLong(0)
      assert(h == hofFold("interpreted path", 31, 1000000007L))
    }
  }

  private def withCodegenDisabled[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
