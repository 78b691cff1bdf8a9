package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.TypeMapper
import graft.functions.HashUtil

/** Property-based invariants for the engine's pure kernels (seeded random
  * generation — deterministic across runs). */
class PropertySpec extends AnyFunSuite {
  private val rnd = new Random(42)
  private val Trials = 200

  private def asciiText(max: Int = 60): String = {
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    val n = rnd.nextInt(max + 1)
    Seq.fill(n)(chars(rnd.nextInt(chars.length))).mkString
  }

  test("shingleHashes: count equals naive distinct string-shingle count; sorted distinct") {
    (1 to Trials).foreach { _ =>
      val s = asciiText()
      val k = 1 + rnd.nextInt(8)
      val got = HashUtil.shingleHashes(UTF8String.fromString(s), k).toLongArray().toSeq
      val naive = (0 to s.length - k).map(i => s.substring(i, i + k)).distinct
      assert(got.length == naive.length, s"for '$s' k=$k")
      assert(got == got.sorted && got.distinct == got, s"for '$s' k=$k")
    }
  }

  test("bitmapEncode: AND-popcount equals exact set-intersection size") {
    (1 to Trials).foreach { _ =>
      val universe = Seq.fill(5 + rnd.nextInt(200))(rnd.nextLong()).distinct
      val dict = universe.sorted
      def randSubset() = universe.filter(_ => rnd.nextBoolean())
      val a = randSubset()
      val b = randSubset()
      def bm(s: Seq[Long]) = HashUtil
        .bitmapEncode(new GenericArrayData(s.toArray), new GenericArrayData(dict.toArray))
        .toLongArray()
      val c = bm(a).zip(bm(b)).map { case (x, y) => java.lang.Long.bitCount(x & y) }.sum
      assert(c == a.toSet.intersect(b.toSet).size)
      assert(bm(a).map(java.lang.Long.bitCount).sum == a.distinct.length)
    }
  }

  test("simhash: invariant under token order; sensitive to token counts") {
    def sh(s: String) = HashUtil.simhash(UTF8String.fromString(s))
    (1 to Trials).foreach { _ =>
      val words = Seq.fill(2 + rnd.nextInt(20))(asciiText(8).trim).filter(_.nonEmpty)
      if (words.nonEmpty) {
        val shuffled = rnd.shuffle(words)
        assert(sh(words.mkString(" ")) == sh(shuffled.mkString(" ")),
          "simhash is a bag-of-words signature: token order must not matter")
      }
    }
    assert(sh("Hello HELLO hello") == sh("hello hello hello"), "case-insensitive")
  }

  test("minhashSig: signature of a union is the elementwise min (the MinHash axiom)") {
    val perms = 16
    def sig(l: Seq[Long]) =
      HashUtil.minhashSig(new GenericArrayData(l.toArray), perms).toLongArray().toSeq
    (1 to Trials).foreach { _ =>
      val a = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())
      val b = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())
      // the kernel's permutation hashes are compared UNSIGNED (see
      // HashUtil.minhashSig) — the axiom holds in that same order
      val expected = sig(a).zip(sig(b)).map { case (x, y) =>
        if (java.lang.Long.compareUnsigned(x, y) <= 0) x else y
      }
      assert(sig(a ++ b) == expected)
    }
  }

  test("i8Quant: codes bounded by +-127, reconstruction within half a step, qdot exact") {
    (1 to Trials).foreach { _ =>
      val n = 1 + rnd.nextInt(128)
      def vec() = Array.fill(n)((rnd.nextFloat() - 0.5f) * rnd.nextInt(100))
      val (a, b) = (vec(), vec())
      def arr(v: Array[Float]) = new GenericArrayData(v.map(x => x: Any))
      val (ma, mb) = (HashUtil.maxAbs(arr(a)).doubleValue(), HashUtil.maxAbs(arr(b)).doubleValue())
      val (ca, cb) = (HashUtil.i8Quant(arr(a)), HashUtil.i8Quant(arr(b)))
      // codes live in [-127, 127]; the symmetric grid never emits -128
      assert(ca.forall(c => c >= -127 && c <= 127))
      // per-component reconstruction error is at most half a quantization
      // step (m/254 <= |err| bound from round-to-nearest): the guarantee
      // the whole int8 path rests on
      if (ma > 0) a.zip(ca).foreach { case (x, c) =>
        val err = math.abs(c.toDouble * ma / 127.0 - x.toDouble)
        assert(err <= ma / 254.0 + 1e-12, s"err $err vs step ${ma / 254.0}")
      }
      // integer code dot is exactly the sum of code products
      val qd = HashUtil.qdot(ca, cb).longValue()
      assert(qd == ca.zip(cb).map { case (x, y) => x.toLong * y.toLong }.sum)
      // and the dequantized score approximates the true dot within the
      // summed per-component bounds (loose triangle-inequality bound)
      if (ma > 0 && mb > 0) {
        val score = qd.toDouble * (ma * mb) / 16129.0
        val truth = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val bound = a.zip(b).map { case (x, y) =>
          ma / 254.0 * math.abs(y) + mb / 254.0 * math.abs(x) + ma / 254.0 * mb / 254.0
        }.sum
        assert(math.abs(score - truth) <= bound + 1e-9,
          s"score $score truth $truth bound $bound")
      }
    }
  }

  test("KmvAgg: order/partition-independent, idempotent, equals true k-smallest; winnow props") {
    val agg = new graft.operators.KmvAgg(16)
    (1 to 50).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(200))(rnd.nextLong(10000))
      val truth = xs.distinct.sorted.take(16)
      // sequential reduce
      val seq = xs.foldLeft(agg.zero)(agg.reduce)
      assert(seq == truth)
      // arbitrary partitioning + merge in shuffled order
      val parts = xs.grouped(1 + rnd.nextInt(7)).toSeq
      val merged = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged == truth, "merge must be order-independent")
      // idempotence: re-merging a sketch with itself changes nothing
      assert(agg.merge(merged, merged) == truth)
      assert(merged.length <= 16)
    }
  }

  test("winnow: density bound and subset-of-gram-hashes over random text") {
    (1 to Trials).foreach { _ =>
      val s = asciiText(80)
      val (k, w) = (1 + rnd.nextInt(6), 1 + rnd.nextInt(6))
      val got = HashUtil.winnow(UTF8String.fromString(s), k, w, 31, 1000000007L)
        .toLongArray().toSeq
      def ph(x: String) = x.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
      if (s.length < k) assert(got.isEmpty)
      else {
        val grams = s.sliding(k).map(ph).toSeq
        assert(got.toSet.subsetOf(grams.toSet), "fps must be gram hashes")
        assert(got == got.distinct.sorted, "sorted distinct contract")
        val nw = math.max(grams.length - w + 1, 1)
        assert(got.nonEmpty && got.length <= nw)
        // the global minimum is always selected (it wins its window)
        assert(got.head == grams.min)
      }
    }
  }

  test("shingles column fn: empty array (not garbage) for text shorter than k") {
    val spark = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val out = Seq("ab", "", "abcdef").toDF("text")
      .select(graft.ext.TextOps.shingles(org.apache.spark.sql.functions.col("text"), 5).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2) == Seq("abcde", "bcdef"))
  }

  test("TypeMapper.compat: total (never throws) and lands in the reference's lattice") {
    val lattice = Set[DataType](BooleanType, IntegerType, LongType, FloatType,
      DoubleType, StringType)
    (1 to Trials).foreach { _ =>
      assert(lattice.contains(TypeMapper.compat(asciiText(20))))
    }
  }

  test("TypeMapper.full: decimal(p,s) round-trips precision and scale") {
    (1 to Trials).foreach { _ =>
      val p = 1 + rnd.nextInt(38)
      val s = rnd.nextInt(math.min(p, 18) + 1)
      assert(TypeMapper.full(s"decimal($p,$s)") == DecimalType(p, s))
    }
  }

  test("decodeEnum: never throws, 1-based, 0 and out-of-range encode None") {
    (1 to Trials).foreach { _ =>
      val labels = IndexedSeq.fill(rnd.nextInt(5))(asciiText(8))
      val ord = rnd.nextInt(16) - 5
      val r = TypeMapper.decodeEnum(ord, labels)
      if (ord >= 1 && ord <= labels.size) assert(r.contains(labels(ord - 1)))
      else assert(r.isEmpty)
    }
  }
}
