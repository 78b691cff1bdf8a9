package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels shared by the interpreted and codegen paths of the hashing
  * expressions (top-level object => Java-callable static forwarders, so the
  * generated code calls `graft.functions.HashUtil.xxx(...)` directly). */
object HashUtil {
  /** Distinct xxh64 hashes of every k-byte window of `s`, sorted.
    * Hashing the byte windows in place avoids one String allocation per
    * shingle; for ASCII text a byte window IS the character k-shingle. */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val n = s.numBytes()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = XXH64.hashUnsafeBytes(base, off + i, k, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    var j = 0
    while (j < out.length) {
      if (m == 0 || out(j) != out(m - 1)) { out(m) = out(j); m += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Index-order double dot product (see [[DotProduct]]). Returns null —
    * like the `aggregate(zip_with(...))` fold it replaces — when the arrays
    * differ in length (zip_with pads with null) or any element is null. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** 64-bit finalizer (murmur3 fmix64) — the Bloom kernel's mixer. */
  private def bloomFmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** THE shared Bloom construction (Kirsch–Mitzenmacher double hashing over
    * fmix64): [[graft.ext.NearDup.BloomAgg]]'s build and the
    * `graft_bloom_might` probe both call these two, so filter build and
    * probe cannot disagree on bit positions. */
  def bloomSet(bits: Array[Long], h: Long, numBits: Int, k: Int): Unit = {
    val h1 = bloomFmix64(h)
    val h2 = bloomFmix64(h ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val p = (((h1 + i * h2) >>> 1) % numBits).toInt
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Probe half of [[bloomSet]] over a column-borne bitset (the broadcast
    * Bloom artifact as an array<bigint> literal) — a tight branch-per-hash
    * loop, codegen-framed by [[BloomMight]]. */
  def bloomMight(bits: ArrayData, h: Long, numBits: Int, k: Int): Boolean = {
    val h1 = bloomFmix64(h)
    val h2 = bloomFmix64(h ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val p = (((h1 + i * h2) >>> 1) % numBits).toInt
      if ((bits.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Membership bitmap of `hs` against a SORTED dictionary: bit i of the
    * output (word i>>6, bit i&63) is set iff dict(i) occurs in `hs`.
    * Binary search per element — O(n log m) per row, no shuffle, no
    * explode/pivot round-trip. Elements not in the dictionary are ignored
    * (the caller builds the dictionary from the same corpus). */
  def bitmapEncode(hs: ArrayData, dict: ArrayData): ArrayData = {
    val m = dict.numElements()
    val out = new Array[Long]((m + 63) >> 6)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var lo = 0
      var hi = m - 1
      var done = false
      while (!done && lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = dict.getLong(mid)
        if (v < h) lo = mid + 1
        else if (v > h) hi = mid - 1
        else { out(mid >> 6) |= 1L << (mid & 63); done = true }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Minimum polynomial hash over all character k-shingles of `str`
    * (see [[graft.functions.ShingleFingerprint]]); null when shorter than k. */
  def minPolyShingle(str: UTF8String, k: Int, base: Int, mod: Long): java.lang.Long = {
    val s = str.toString
    val n = s.length
    if (n < k) return null
    var best = Long.MaxValue
    var i = 0
    while (i <= n - k) {
      var acc = 0L
      var j = i
      while (j < i + k) { acc = (acc * base + s.charAt(j)) % mod; j += 1 }
      if (acc < best) best = acc
      i += 1
    }
    best
  }

  /** Polynomial hash of every character k-gram of `str` in DOCUMENT ORDER,
    * duplicates preserved (position i-1 holds the hash of the gram starting
    * at char i; see [[graft.functions.GramHashes]]). The positional variant
    * of [[shingleHashes]] — [[winnow]] and the q150 duplicated-substring
    * removal need positions, which the distinct-sorted form discards.
    * Empty array for text shorter than k. */
  def gramHashes(str: UTF8String, k: Int, base: Int, mod: Long): ArrayData = {
    val s = str.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val g = n - k + 1
    val out = new Array[Long](g)
    var i = 0
    while (i < g) {
      var acc = 0L
      var j = i
      while (j < i + k) { acc = (acc * base + s.charAt(j)) % mod; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint set (Schleimer et al. SIGMOD 2003, the MOSS
    * algorithm; see [[graft.functions.Winnow]]): polynomial hash of every
    * character k-gram in document order, minimum of each sliding window of
    * `w` consecutive gram hashes, distinct + sorted. Guarantee: any shared
    * substring of length >= k+w-1 contributes at least one shared
    * fingerprint. Fewer than w grams -> one window over all grams; shorter
    * than k -> empty set. The per-window min (not the rightmost-min
    * density refinement) keeps the definition exactly replayable in
    * declarative SQL. */
  def winnow(str: UTF8String, k: Int, w: Int, base: Int, mod: Long): ArrayData = {
    val s = str.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val g = n - k + 1
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      var acc = 0L
      var j = i
      while (j < i + k) { acc = (acc * base + s.charAt(j)) % mod; j += 1 }
      hs(i) = acc
      i += 1
    }
    val nw = math.max(g - w + 1, 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, g)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      set.add(m)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit count-weighted SimHash over lowercase-alnum word tokens (the
    * engine's fixed simhash definition — see [[graft.ext.NearDup]]):
    * word hash = low 30 bits of polyhash(w, 31, 1e9+7) + polyhash(w, 131,
    * 998244353) << 30; bit i of the output is set iff the token-count-
    * weighted vote for bit i exceeds half the total token count. The
    * tokenizer is exactly `regexp_extract_all(lower(text), '[a-z0-9]+')`:
    * the WHOLE string is lowercased first with Locale.ROOT (matching
    * Spark's `lower` ASCII fast path even under a Turkish/Azeri default
    * JVM locale, where bare toLowerCase maps 'I' to dotless U+0131 and
    * breaks the [a-z0-9] token test; ROOT also keeps 1-to-many Unicode
    * mappings like U+0130 -> "i" + combining dot, which a per-char
    * Character.toLowerCase would collapse into a different token), then
    * tokens are the maximal [a-z0-9] runs. */
  def simhash(str: UTF8String): Long = {
    val s = str.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new java.util.HashMap[String, Array[Long]]()
    var total = 0L
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length() > 0) {
        val w = sb.toString
        val e = counts.get(w)
        if (e == null) counts.put(w, Array(1L)) else e(0) += 1
        total += 1
        sb.setLength(0)
      }
      i += 1
    }
    val votes = new Array[Long](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = e.getKey
      var h1 = 0L
      var h2 = 0L
      var j = 0
      while (j < w.length) {
        val ch = w.charAt(j)
        h1 = (h1 * 31 + ch) % 1000000007L
        h2 = (h2 * 131 + ch) % 998244353L
        j += 1
      }
      val h = h1 + (h2 << 30)
      val c = e.getValue()(0)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += c
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (2 * votes(b) > total) out |= 1L << b
      b += 1
    }
    out
  }

  /** MinHash signature via Kirsch-Mitzenmacher double hashing: per shingle
    * two independent xxh64 values a, b; permutation p's hash is a + p*b
    * (unsigned 64-bit wrap). Published minhash practice — the p-th
    * permutation family stays pairwise well-mixed while the inner loop is
    * one multiply-add instead of a full xxh64 per permutation (~10x fewer
    * hash evaluations per row). The comparison is UNSIGNED (compareUnsigned)
    * so the "minimum" is over the same uniform [0, 2^64) order a per-perm
    * hash would give. One tight O(n * perms) loop, no shuffle, no
    * per-permutation array materialization. */
  def minhashSig(hs: ArrayData, perms: Int): ArrayData = {
    val n = hs.numElements()
    val sig = Array.fill(perms)(-1L) // unsigned max
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      val a = XXH64.hashLong(h, 0x9E3779B97F4A7C15L)
      val b = XXH64.hashLong(h, 0xC2B2AE3D27D4EB4FL) | 1L // odd => bijective step
      var v = a
      var p = 0
      while (p < perms) {
        if (java.lang.Long.compareUnsigned(v, sig(p)) < 0) sig(p) = v
        v += b
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Largest |component| of a float vector, in double (q66's quantization
    * scale). Exact: float→double widening and abs are both value-preserving,
    * max is a comparison — so any engine computing the same definition gets
    * the same double bit pattern. Edge contract, kept in lockstep with the
    * DuckDB oracle: the EMPTY vector yields null (list_max of an empty list
    * is NULL); a non-finite component fails loudly with a named error — a
    * NaN would otherwise quantize to a silent garbage code here while
    * aborting the oracle's CAST, and an ANN index built over NaN embeddings
    * is corrupt by definition. */
  def maxAbs(v: ArrayData): java.lang.Double = {
    val n = v.numElements()
    if (n == 0) return null
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i)
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
        throw new IllegalArgumentException(
          s"graft_maxabs/graft_i8quant: non-finite embedding component $x at index $i")
      val a = math.abs(x.toDouble)
      if (a > m) m = a
      i += 1
    }
    m
  }

  /** Symmetric int8 scalar quantization of a float vector (q66): code_i =
    * floor(x_i * 127.0 / maxabs + 0.5), packed one SIGNED BYTE per
    * component — the genuinely-4x-smaller representation a 100 TB vector
    * store would hold (array<long> codes would be 8x LARGER than the
    * float input). Codes are exact integers in [-127, 127] reachable by
    * any engine running the same three IEEE ops (multiply, divide, add)
    * plus floor, so the oracle reproduces them from SQL. The all-zero
    * vector quantizes to all-zero codes (maxabs = 0 guard); the empty
    * vector yields null and non-finite components throw, both via
    * [[maxAbs]]'s edge contract. */
  def i8Quant(v: ArrayData): Array[Byte] = {
    val boxed = maxAbs(v)
    if (boxed == null) return null
    val m = boxed.doubleValue()
    val n = v.numElements()
    val out = new Array[Byte](n)
    if (m == 0.0) return out
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * 127.0 / m + 0.5).toByte
      i += 1
    }
    out
  }

  /** Integer dot product of two packed int8 code vectors (q66): pure
    * integer arithmetic — exact in any engine, no fold-order concerns at
    * all (unlike the double fold in [[dot]]). Null on length mismatch,
    * mirroring [[dot]]'s convention. */
  def qdot(a: Array[Byte], b: Array[Byte]): java.lang.Long = {
    if (a.length != b.length) return null
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }

  /** Repetition statistics in ONE pass over the text (q58): returns
    * `[n_words, n_distinct_words, top_bigram_count]` for the same lowercase
    * `[a-z0-9]+` tokenizer as `regexp_extract_all(lower(text), '[a-z0-9]+')`
    * (whole-string Locale.ROOT toLowerCase first — Unicode and
    * locale-independence parity with `lower()`, same discipline as
    * [[simhash]]). Replaces the interpreted HOF formulation
    * that scanned distinct-x-all for words AND bigrams (O(doc^2)); this is
    * O(doc) with two hash maps. */
  def repStats(str: UTF8String): ArrayData = {
    val s = str.toString.toLowerCase(java.util.Locale.ROOT)
    val words = new java.util.HashMap[String, Array[Long]]()
    val bigrams = new java.util.HashMap[String, Array[Long]]()
    var nWords = 0L
    var topBigram = 0L
    var prev: String = null
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length() > 0) {
        val w = sb.toString
        val e = words.get(w)
        if (e == null) words.put(w, Array(1L)) else e(0) += 1
        nWords += 1
        if (prev != null) {
          val bg = prev + " " + w
          val b = bigrams.get(bg)
          val cnt = if (b == null) { bigrams.put(bg, Array(1L)); 1L }
                    else { b(0) += 1; b(0) }
          if (cnt > topBigram) topBigram = cnt
        }
        prev = w
        sb.setLength(0)
      }
      i += 1
    }
    new GenericArrayData(Array(nWords, words.size.toLong, topBigram))
  }
}

/** `graft_shingle_hashes(text, k)` — distinct sorted xxh64 hashes of the
  * k-byte shingle windows, as a native codegen expression. Replaces
  * `array_distinct(transform(shingles(text), xxhash64))`, which allocates a
  * String per shingle and runs interpreted. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects (string, int), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(str: Any, k: Any): Any =
    HashUtil.shingleHashes(str.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, k) =>
      s"${ev.value} = graft.functions.HashUtil.shingleHashes($str, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_gram_hashes(text, k, base, mod)` — positional k-gram polyhash
  * array (document order, duplicates preserved): the positional sibling of
  * [[ShingleHashes]], for operators that need to know WHERE a gram sits
  * (q150's duplicated-substring removal: posexplode of this array is the
  * (pos, hash) occurrence stream). One codegen'd O(n·k) loop per row. */
case class GramHashes(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, IntegerType, IntegerType, LongType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes expects (string, int, int, bigint), got (${actual.mkString(", ")})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(str: Any, k: Any, base: Any, mod: Any): Any =
    HashUtil.gramHashes(str.asInstanceOf[UTF8String], k.asInstanceOf[Int],
      base.asInstanceOf[Int], mod.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, k, base, mod) =>
      s"${ev.value} = graft.functions.HashUtil.gramHashes($str, $k, $base, $mod);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `graft_winnow(text, k, w, base, mod)` — winnowing fingerprint set
  * (Schleimer et al. SIGMOD 2003): min polynomial hash of each sliding
  * window of `w` consecutive k-gram hashes, distinct sorted. The local
  * document-fingerprinting primitive behind MOSS-style overlap detection —
  * [[ShingleFingerprint]] is its global-minimum special case (one window
  * spanning the whole document). One codegen'd O(n·(k+w)) loop per row;
  * mirrored declaratively by the DuckDB oracle (window minima over the
  * per-position polyhash list). */
case class Winnow(children: Seq[Expression])
    extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {
  require(children.length == 5)

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, IntegerType, IntegerType, IntegerType, LongType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects (string, int, int, int, bigint), got (${actual.mkString(", ")})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(str: Any, k: Any, w: Any, base: Any, mod: Any): Any =
    HashUtil.winnow(str.asInstanceOf[UTF8String], k.asInstanceOf[Int],
      w.asInstanceOf[Int], base.asInstanceOf[Int], mod.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, k, w, base, mod) =>
      s"${ev.value} = graft.functions.HashUtil.winnow($str, $k, $w, $base, $mod);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `graft_bloom_might(h, bits, numBits, k)` — Bloom-filter membership probe
  * (q248's admission scan): k Kirsch–Mitzenmacher positions of `h` tested
  * against the bitset column (the broadcast filter as an array<bigint>
  * literal). The 15th native kernel: the probe stays inside whole-stage
  * codegen like every other per-row kernel — the scalar `udf` it replaced
  * opaqued the admission scan. The construction is [[HashUtil.bloomSet]]'s
  * mirror, one definition for build and probe. */
case class BloomMight(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val actual = Seq(first, second, third, fourth).map(_.dataType)
    val ok = actual.head == LongType &&
      (actual(1) match {
        case ArrayType(LongType, _) => true
        case _ => false
      }) && actual(2) == IntegerType && actual(3) == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might expects (bigint, array<bigint>, int, int), got (${actual.mkString(", ")})")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might"

  override def nullSafeEval(h: Any, bits: Any, numBits: Any, k: Any): Any =
    HashUtil.bloomMight(bits.asInstanceOf[ArrayData], h.asInstanceOf[Long],
      numBits.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, bits, numBits, k) =>
      s"${ev.value} = graft.functions.HashUtil.bloomMight($bits, $h, $numBits, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** `graft_minhash_sig(hashes, perms)` — MinHash signature over an
  * array<long>, one codegen'd loop per row. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects (array<bigint>, int), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(hs: Any, perms: Any): Any =
    HashUtil.minhashSig(hs.asInstanceOf[ArrayData], perms.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, perms) =>
      s"${ev.value} = graft.functions.HashUtil.minhashSig($hs, $perms);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_bitmap(hashes, dict)` — membership bitmap (array<long> of
  * ceil(|dict|/64) words) of a hash set against a sorted dictionary, as one
  * codegen'd binary-search loop per row. Replaces an explode → broadcast
  * dictionary join → pivot(bit_or) round-trip (two shuffles and a
  * driver-blocking pivot) with a pure projection; the dictionary arrives as
  * a driver-sized array literal, the same class of decision as the bitmap
  * width itself. */
case class BitmapEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isLongArray(e: Expression) = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap expects (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap"

  override protected def nullSafeEval(hs: Any, dict: Any): Any =
    HashUtil.bitmapEncode(hs.asInstanceOf[ArrayData], dict.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, dict) =>
      s"${ev.value} = graft.functions.HashUtil.bitmapEncode($hs, $dict);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_simhash(text)` — the engine's 60-bit count-weighted SimHash as one
  * codegen'd pass (tokenize, count, two polynomial hashes, weighted bit
  * votes). Replaces a ~60-iteration interpreted `aggregate(sequence(...))`
  * HOF nest that dominated q47. Definition mirrored by the DuckDB oracle in
  * [[graft.ext.NearDup]]. */
case class SimHash60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects (string), got (${child.dataType})")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(str: Any): Any =
    HashUtil.simhash(str.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.HashUtil.simhash($str);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_rep_stats(text)` — one-pass repetition statistics
  * `[n_words, n_distinct_words, top_bigram_count]` (see
  * [[HashUtil.repStats]]). */
case class RepStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats expects (string), got (${child.dataType})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rep_stats"

  override protected def nullSafeEval(str: Any): Any =
    HashUtil.repStats(str.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.HashUtil.repStats($str);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_dot(a, b)` — dot product of two equal-length float/double arrays
  * as a native codegen expression: double accumulation in INDEX ORDER, the
  * exact IEEE sequence of the `aggregate(zip_with(...))` fold it replaces
  * (and of the DuckDB oracle's list_reduce), so output cosines stay
  * bit-identical while skipping the interpreted-HOF cost and the
  * intermediate zipped-array allocation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float|double>, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null even for non-null inputs: length mismatch / null elements
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def leftFloat = elemType(left) == FloatType
  private def rightFloat = elemType(right) == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
        java.lang.Double $boxed =
          graft.functions.HashUtil.dot($a, $b, $leftFloat, $rightFloat);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_maxabs(vec)` — largest |component| of a float vector as a double
  * (the symmetric-quantization scale of q66; see [[HashUtil.maxAbs]]). */
case class MaxAbs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_maxabs expects array<float>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null even for non-null input: the empty vector
  override def nullable: Boolean = true
  override def prettyName: String = "graft_maxabs"

  override protected def nullSafeEval(v: Any): Any =
    HashUtil.maxAbs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val boxed = ctx.freshName("maxabs")
      s"""
        java.lang.Double $boxed = graft.functions.HashUtil.maxAbs($v);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_i8quant(vec)` — symmetric int8 scalar quantization of a float
  * vector, packed one signed byte per component (see [[HashUtil.i8Quant]]).
  * BinaryType on purpose: the quantized corpus is what a 100 TB vector
  * store keeps resident, and bytes are the only Spark type that is
  * actually 4x smaller than the float32 input. */
case class I8Quant(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_i8quant expects array<float>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  // null even for non-null input: the empty vector
  override def nullable: Boolean = true
  override def prettyName: String = "graft_i8quant"

  override protected def nullSafeEval(v: Any): Any =
    HashUtil.i8Quant(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      s"""
        byte[] $codes = graft.functions.HashUtil.i8Quant($v);
        if ($codes == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $codes; }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_qdot(a, b)` — integer dot product of two packed int8 code
  * vectors (see [[HashUtil.qdot]]); null on length mismatch, like
  * [[DotProduct]]. */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.BinaryType &&
      right.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qdot expects (binary, binary), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // null even for non-null inputs: length mismatch
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.qdot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("qdot")
      s"""
        java.lang.Long $boxed = graft.functions.HashUtil.qdot($a, $b);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All native functions of the engine, for registry injection. */
object GraftFunctions {
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    PolyHash.registryEntry,
    NormalizeString.registryEntry,
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_shingle_hashes(text, k) takes 2 arguments")
        ShingleHashes(children(0), children(1))
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_minhash_sig(hashes, perms) takes 2 arguments")
        MinHashSig(children(0), children(1))
      }),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      { children: Seq[Expression] =>
        require(children.length == 5,
          "graft_winnow(text, k, w, base, mod) takes 5 arguments")
        Winnow(children)
      }),
    (FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
      { children: Seq[Expression] =>
        require(children.length == 4,
          "graft_gram_hashes(text, k, base, mod) takes 4 arguments")
        GramHashes(children(0), children(1), children(2), children(3))
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_dot(a, b) takes 2 arguments")
        DotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("graft_bitmap"),
      new ExpressionInfo(classOf[BitmapEncode].getName, "graft_bitmap"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_bitmap(hashes, dict) takes 2 arguments")
        BitmapEncode(children(0), children(1))
      }),
    (FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[ShingleFingerprint].getName, "graft_fingerprint"),
      { children: Seq[Expression] =>
        require(children.length == 4, "graft_fingerprint(str, k, base, mod) takes 4 arguments")
        ShingleFingerprint(children(0), children(1), children(2), children(3))
      }),
    (FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_rep_stats"),
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_rep_stats(text) takes 1 argument")
        RepStats(children(0))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash"),
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_simhash(text) takes 1 argument")
        SimHash60(children(0))
      }),
    (FunctionIdentifier("graft_maxabs"),
      new ExpressionInfo(classOf[MaxAbs].getName, "graft_maxabs"),
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_maxabs(vec) takes 1 argument")
        MaxAbs(children(0))
      }),
    (FunctionIdentifier("graft_i8quant"),
      new ExpressionInfo(classOf[I8Quant].getName, "graft_i8quant"),
      { children: Seq[Expression] =>
        require(children.length == 1, "graft_i8quant(vec) takes 1 argument")
        I8Quant(children(0))
      }),
    (FunctionIdentifier("graft_qdot"),
      new ExpressionInfo(classOf[QDot].getName, "graft_qdot"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_qdot(a, b) takes 2 arguments")
        QDot(children(0), children(1))
      }),
    (FunctionIdentifier("graft_bloom_might"),
      new ExpressionInfo(classOf[BloomMight].getName, "graft_bloom_might"),
      { children: Seq[Expression] =>
        require(children.length == 4,
          "graft_bloom_might(h, bits, numBits, k) takes 4 arguments")
        BloomMight(children(0), children(1), children(2), children(3))
      }))

  /** Idempotent imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (id, info, builder) =>
      if (!spark.catalog.functionExists(id.funcName))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
