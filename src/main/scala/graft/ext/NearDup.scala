package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection over the `documents` corpus — three independent
  * scale paths to the same goal, each a `queries` entry with an exact oracle:
  *
  *  - q41 exact n-gram Jaccard similarity join via an inverted shingle
  *    index count-join (+ exact length-ratio filter) — guaranteed recall,
  *    fully codegen'd; see [[exactJaccardPairs]] for where PPJoin-style
  *    prefix filtering slots in on natural corpora.
  *  - q42 MinHash-LSH: 126 xxhash64 min-hash permutations, 21 bands x 6
  *    rows, candidates = band-bucket collisions, then exact Jaccard verify.
  *    P(miss | J=0.9) ~= 1.2e-7, so at the corpus' planted similarity
  *    separation (J>=0.9 vs <=0.3) the output equals the exact all-pairs
  *    answer, which is the oracle.
  *  - q47 SimHash: 60-bit signature over word tokens; pairs at Hamming
  *    distance <= 3 found by pigeonhole banding (4 blocks of 15 bits — a
  *    pair within distance 3 must match exactly on >= 1 block). Exact by
  *    construction, no probabilistic gap.
  *
  * The reference has no similarity operators (it delegates all query
  * capability to Spark SQL); these are the training-data-pipeline extension.
  */
object NearDup {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val ShingleK = 5
  val JaccardT = 0.8
  // JaccardT as an exact rational (TNum/TDen) — the exact-join threshold
  // arithmetic runs in integers so float rounding can't flip boundary pairs
  // (J exactly 0.8 occurs: e.g. a 4-shingle subset of a 5-shingle doc).
  private val TNum = 4L
  private val TDen = 5L

  // -- MinHash parameters (fixed, deterministic). r=6 rows x 21 bands gives a
  // steep S-curve fitted to this corpus' similarity gap (background J~0.2,
  // near-dups J>=0.9): P(candidate | J=0.2) ~= 1.3e-3 keeps the verify join
  // small, P(miss | J=0.9) ~= 1.2e-7 makes the exact-all-pairs oracle safe.
  val NumPerms = 126
  val BandRows = 6 // 21 bands
  private val P = TextOps.HashMod

  // -- Winnowing parameters (q144): k-gram size, window width, df-prune
  // bound, and the shared-fingerprint report threshold. The MOSS guarantee:
  // any shared substring of >= WinnowK + WinnowW - 1 = 20 chars contributes
  // at least one shared fingerprint.
  val WinnowK = 13
  val WinnowW = 8
  val WinnowMaxDf = 20L
  val WinnowMinShared = 10L


  /** documents -> (doc_id, shh: array<long> distinct sorted xxh64 5-shingle
    * hashes, sz) via the native [[graft.functions.ShingleHashes]] kernel —
    * no per-shingle String allocation, full codegen. Hashed shingle sets
    * have the same distinct counts as the string sets up to a negligible
    * 64-bit collision probability. */
  /** (doc_id, band, key) LSH band keys off a hashed-shingle frame — the
    * shared banding of the batch pairs operator and the streaming
    * admission gate ([[graft.streaming.StreamNearDup]]), so the two cannot
    * disagree on the signature geometry. */
  private[graft] def bandKeys(hashed: DataFrame): DataFrame = {
    val bandArr = TextOps.bind(call_function("graft_minhash_sig", col("shh"), lit(NumPerms))) {
      sig =>
        array((0 until NumPerms / BandRows).map(b =>
          struct(lit(b).as("band"),
            concat_ws("-", (0 until BandRows)
              .map(r => element_at(sig, b * BandRows + r + 1).cast("string")): _*).as("key"))): _*)
    }
    hashed.select(col("doc_id"), explode(bandArr).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** [[withHashedShingles]] for the streaming admission operator. */
  private[graft] def hashedShingles(docs: DataFrame): DataFrame =
    withHashedShingles(docs)

  private def withHashedShingles(docs: DataFrame): DataFrame =
    docs.repartition(col("doc_id")) // spread CPU-heavy narrow work
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(ShingleK)).as("shh"))
      .withColumn("sz", size(col("shh")))

  // Length-band geometry: J >= t forces min(sz) >= t*max(sz), so with bands
  // of multiplicative width 1/t' (t' = t - BandSlack, the slack keeping the
  // qualifying log-ratio strictly below one band width so float rounding in
  // log() can never split a qualifying pair across non-adjacent bands) every
  // qualifying pair lands in the same or adjacent bands.
  private val BandSlack = 0.01
  // Salt blocks per band: the quadratic within-band pair work is decomposed
  // into R(R+1)/2 triangle blocks (same band) + R^2 grid blocks (adjacent
  // bands), each an independent reducer — a hot band parallelizes instead of
  // serializing one shuffle partition.
  private val SaltR = 16

  /** Conf key bounding the bitmap fast path's shingle dictionary. The bound
    * protects two things at once: the driver collect of the sorted distinct
    * hashes (64 K longs = 512 KB — trivial) and, the real constraint, the
    * per-row bitmap width W = dict/64 longs that every exploded block-join
    * row carries (64 K dict = 8 KB/row). Above the bound the exact join
    * dispatches to the fully-distributed PPJoin plan instead. */
  val MaxDictConf = "spark.graft.neardup.maxDict"
  val DefaultMaxDict = 65536L

  /** Exact similarity join — ADAPTIVE dispatcher between the two exact
    * plans, keyed on the corpus' global shingle-dictionary size (estimated
    * with `approx_count_distinct`, rsd 5% — the bound is a soft safety
    * limit, so sketch error cannot cause more than a ~5% overshoot of a
    * limit that already carries orders-of-magnitude headroom):
    *
    *  - dictionary <= [[MaxDictConf]] (default 64 K): the BITMAP-BAND plan
    *    ([[bitmapJaccardPairs]]). This corpus draws from a ~30-word
    *    vocabulary, so the GLOBAL distinct 5-shingle count is tiny (~2k)
    *    while per-shingle document frequencies are in the hundreds — which
    *    defeats every frequency-based pruning scheme: PPJoin prefix
    *    filtering (each doc's rarest shingles are still shared by hundreds
    *    of docs) degenerates to all-pairs with extra work, and an
    *    inverted-index count-join explodes into sum(df^2) ~= 500M join rows
    *    through 2k join keys. The bitmap plan dictionary-encodes shingles
    *    and intersects via flat codegen'd `bit_count(a.w_i & b.w_i)` sums.
    *  - dictionary above the bound (natural zipfian text: huge dictionary,
    *    rare shingles): [[ppjoinJaccardPairs]] — prefix filtering over an
    *    inverted index, no driver-sized collect anywhere. The dispatch
    *    happens BEFORE any collect, so a data-scale dictionary can never
    *    reach the driver.
    *
    * Both plans are cross-validated equal in NearDupSpec; the estimate adds
    * one small aggregation job over the already-checkpointed shingle
    * arrays. */
  def exactJaccardPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // materialized once: shared by the dictionary estimate and whichever
    // exact plan wins the dispatch (the shingle kernel is the CPU-heavy step)
    val hashed = withHashedShingles(docs).filter(col("sz") > 0).localCheckpoint()
    val maxDict = spark.conf.getOption(MaxDictConf).map(_.toLong).getOrElse(DefaultMaxDict)
    val estDict = hashed.select(explode(col("shh")).as("h"))
      .agg(approx_count_distinct(col("h")).as("d")).head.getLong(0)
    if (estDict > maxDict) ppjoinFromHashed(hashed)
    else bitmapJaccardPairs(hashed)
  }

  /** The bitmap-band exact plan (see [[exactJaccardPairs]] for when it
    * applies). Pair generation is scale-shaped: docs are bucketed into
    * multiplicative length bands (a qualifying pair can only span adjacent
    * bands — see [[BandSlack]]) and each band is salted into [[SaltR]]
    * blocks, so the inherently-quadratic exact-similarity work arrives as
    * equi-joins on (band, i, j) block keys — partitioned, skew-spread, no
    * cross product. */
  private def bitmapJaccardPairs(hashed: DataFrame): DataFrame = {
    val spark = hashed.sparkSession
    // Global dictionary: sorted distinct shingle hashes, collected to the
    // driver and embedded as a literal into the encode kernel. Driver-sized
    // BY CONSTRUCTION: the dispatcher above only routes here when the
    // approx_count_distinct estimate is under the MaxDictConf bound.
    val dictArr: Array[Long] = {
      import spark.implicits._
      hashed.select(explode(col("shh")).as("h")).distinct().as[Long].collect()
    }
    java.util.Arrays.sort(dictArr)
    val W = ((dictArr.length + 63) / 64).toInt
    // One projection: shh -> W bitmap words via the graft_bitmap kernel
    // (replaces an explode -> broadcast-join -> pivot round-trip: two
    // shuffles + a pivot). localCheckpoint so the pair join's two sides
    // and the explode fan-out don't re-run the kernel per reference.
    val packed = hashed.select(col("doc_id"), col("sz"),
      call_function("graft_bitmap", col("shh"), typedLit(dictArr.toSeq)).as("bm"))
    val named = packed.select(Seq(col("doc_id"), col("sz")) ++
        (0 until W).map(i => element_at(col("bm"), i + 1).as(s"w$i")): _*)
      // element_at is nullable (out-of-bounds semantics); restore the
      // non-null w columns the join condition codegen expects
      .na.fill(0L)
      .localCheckpoint()
    val banded = named
      .withColumn("band",
        floor(log(col("sz").cast("double")) / lit(math.log(1.0 / (JaccardT - BandSlack)))).cast("int"))
      .withColumn("salt", pmod(hash(col("doc_id")), lit(SaltR)))

    // Block keys (role, band, i, j), where role 0 = same-band triangle and
    // role 1 = adjacent-band grid (left side pre-shifts band by one so both
    // roles join on plain equality). The left role carries i = own salt and
    // explodes partner-salts j; the right role carries j = own salt and
    // explodes partner-salts i. Ranges make each unordered pair match
    // exactly one block: triangle (i <= j) within a band, full grid across
    // adjacent bands. Folding both roles into ONE equi-join (vs two joins
    // unioned) halves the stage count — measured wall-clock win at 32 cores.
    val lKeys = expr(
      s"""concat(
            transform(sequence(salt, ${SaltR - 1}), j -> struct(0 AS role, band AS band, salt AS i, j AS j)),
            transform(sequence(0, ${SaltR - 1}),    j -> struct(1 AS role, band + 1 AS band, salt AS i, j AS j)))""")
    val rKeys = expr(
      s"""concat(
            transform(sequence(0, salt),            i -> struct(0 AS role, band AS band, i AS i, salt AS j)),
            transform(sequence(0, ${SaltR - 1}),    i -> struct(1 AS role, band AS band, i AS i, salt AS j)))""")
    // Explicit co-partitioning of both join sides on the block key: a
    // user-specified partition count is exempt from AQE coalescing, which
    // would otherwise see the (small) shuffle BYTES and fold the
    // (quadratic) pair-evaluation WORK onto one partition. The join reuses
    // this exact partitioning, so no extra exchange appears.
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wcols = named.columns.filter(_.matches("w\\d+")).toSeq
    def side(p: String, keys: Column)(df: DataFrame): DataFrame = {
      val exploded = df
        .withColumn("k", explode(keys))
        .select(Seq(col("k.role").as("role"), col("k.band").as("band"),
          col("k.i").as("i"), col("k.j").as("j"),
          col("doc_id"), col("sz")) ++ wcols.map(col): _*)
      val prefd = exploded.toDF(exploded.columns.map(p + _).toIndexedSeq: _*)
      prefd.repartition(nPart,
        col(s"${p}role"), col(s"${p}band"), col(s"${p}i"), col(s"${p}j"))
    }
    val left = side("l_", lKeys)(banded)
    val right = side("r_", rKeys)(banded)

    // The whole J >= t decision lives INSIDE the join condition, in exact
    // integer arithmetic (t = TNum/TDen): c/(sa+sb-c) >= t  <=>
    // (TDen+TNum)*c >= TNum*(sa+sb). A post-join `filter(jaccard >= t)`
    // would be pushed back into the join condition by Catalyst with the
    // 32-term bitmap sum inlined TWICE (numerator + denominator) — measured
    // 3x the bitmap work. Cheap conjuncts (dedup, length ratio) run first so
    // most pairs short-circuit before any bitmap word is touched; only
    // surviving pairs (a tiny set) re-evaluate c for the output column.
    val cInt = (0 until W).map(i => expr(s"bit_count(l_w$i & r_w$i)")).reduce(_ + _)
    val ratioInt = least(col("l_sz"), col("r_sz")) * TDen >=
      greatest(col("l_sz"), col("r_sz")) * TNum
    val jaccardGE = cInt * (TDen + TNum) >= (col("l_sz") + col("r_sz")) * TNum
    val keyEq = Seq("role", "band", "i", "j")
      .map(k => col(s"l_$k") === col(s"r_$k")).reduce(_ && _)
    val pairs = left.join(right.hint("shuffle_hash"),
      keyEq &&
        // same-band diagonal blocks (i = j) see each unordered pair twice —
        // id order dedups; adjacent-band blocks match each pair once
        (col("l_role") === 1 || col("l_i") =!= col("l_j") ||
          col("l_doc_id") < col("r_doc_id")) &&
        ratioInt && jaccardGE)

    val c = cInt.cast("double")
    pairs
      .select(
        least(col("l_doc_id"), col("r_doc_id")).as("id_a"),
        greatest(col("l_doc_id"), col("r_doc_id")).as("id_b"),
        (c / (col("l_sz") + col("r_sz") - c)).as("jaccard"))
  }

  /** PPJoin-style exact similarity join — the scale path for NATURAL
    * (zipfian) corpora, where the shingle dictionary is data-scale (so the
    * bitmap plan's driver-sized dictionary assumption breaks) but
    * per-shingle document frequencies are low. Fully distributed: no
    * driver-sized collect anywhere.
    *
    * Each doc's shingle set is ordered by ascending global document
    * frequency (rarest first; ties by hash — a total order). Prefix
    * filtering: J(x,y) >= t forces an overlap o >= ceil(t*|x|), and any
    * pair with overlap o must share a token within the first |x|-o+1
    * tokens of BOTH docs' orderings (Chaudhuri/Xiao prefix principle) — so
    * the inverted index is built over the first |x| - ceil(t*|x|) + 1
    * (rarest) tokens only, candidates are pairs sharing an indexed token
    * and passing the exact length-ratio bound, and exact Jaccard
    * verification runs on the candidates. On zipfian data the prefix
    * tokens are rare, so the index lists (and the candidate join) stay
    * small; on THIS test corpus (tiny dictionary, df in the hundreds) it
    * degenerates to ~all-pairs with extra shuffles — which is exactly why
    * q41 ships the bitmap-band plan and this variant is cross-validated in
    * NearDupSpec instead of benchmarked. Same contract and output as
    * [[exactJaccardPairs]]. */
  def ppjoinJaccardPairs(docs: DataFrame): DataFrame =
    // materialized once: the kernel would otherwise rerun for the df pass,
    // each candidate-join side, and both verifyPairs sides
    ppjoinFromHashed(withHashedShingles(docs).filter(col("sz") > 0).localCheckpoint())

  private def ppjoinFromHashed(hashed: DataFrame): DataFrame = {
    val ex = hashed.select(col("doc_id"), explode(col("shh")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // rarest-first total order per doc; ceil(t*sz) in exact integers
    val ordered = ex.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
      .withColumn("sz", size(col("ord")))
      .withColumn("plen",
        col("sz") - floor((col("sz") * TNum + TDen - 1) / TDen).cast("int") + 1)
    val pex = ordered
      .select(col("doc_id"), col("sz"), explode(expr("slice(ord, 1, plen)")).as("tok"))
      .select(col("doc_id"), col("sz"), col("tok.h").as("h"))
      // one row per prefix token; materialize so the candidate self-join's
      // two sides don't each recompute the df join + ordering aggregation
      .localCheckpoint()
    val ratio = least(col("a.sz"), col("b.sz")) * TDen >=
      greatest(col("a.sz"), col("b.sz")) * TNum
    val cand = pex.as("a").join(pex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") && ratio)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyPairs(cand, hashed)
  }

  /** Join candidate (id_a, id_b) pairs back to shingle-hash arrays and keep
    * exact-Jaccard >= t. The intersect runs on xxhash64'd shingles — same
    * distinct counts as the string sets up to a ~2^-47 per-pair collision
    * probability, and far cheaper to ship and intersect. Two broadcast-able
    * joins at small candidate counts; at scale both sides shuffle on doc_id,
    * the natural key. */
  private def verifyPairs(cand: DataFrame, hashed: DataFrame): DataFrame =
    cand
      .join(hashed.select(col("doc_id").as("id_a"), col("shh").as("sh_a")), "id_a")
      .join(hashed.select(col("doc_id").as("id_b"), col("shh").as("sh_b")), "id_b")
      .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("c") / (size(col("sh_a")) + size(col("sh_b")) - col("c")))
      .filter(col("jaccard") >= JaccardT)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** MinHash-LSH candidates + exact verify.
    *
    * The 126-permutation signature is one codegen'd per-row kernel
    * ([[graft.functions.MinHashSig]] — `min over shingles of xxh64(h, p)`),
    * so candidate generation needs no shuffle at all before the band join.
    * xxh64-seeded permutations are well-mixed and independent (a weak
    * linear-perm scheme correlated minima across docs and blew the
    * candidate count up 50x); an earlier higher-order-function formulation
    * ran interpreted and was ~20x slower. The signature is let-bound
    * (TextOps.bind) before fan-out into 21 band keys so projection collapse
    * can't re-inline it per band. */
  def minhashLshPairs(docs: DataFrame): DataFrame = {
    val hashed = withHashedShingles(docs)
    val bands = bandKeys(hashed)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyPairs(cand, hashed)
  }

  // -- SimHash: 60-bit signature = two portable 30-bit polynomial hashes.
  val SimBits = 60
  val HammingT = 3
  val SimBlocks = HammingT + 1 // pigeonhole: d<=3 => >=1 of 4 blocks equal
  private val P2 = 998244353L

  /** 60-bit count-weighted SimHash over word tokens: bit i of the signature
    * is set iff the token-count-weighted vote for bit i wins (sum over words
    * of count*[bit set] exceeds half the total token count). Weighting
    * matters here: distinct-word sets are near-identical across a
    * small-vocabulary corpus, while term frequencies distinguish documents.
    * Word hash = low 30 bits polyHash, high 30 bits polyHash2. The bit fold
    * uses SQL `shiftright(h, i)` (column bit-index), which the Scala
    * functions API doesn't expose. */
  // SQL form of the two portable polynomial hashes, backed by the native
  // codegen expression (the interpreted HOF fold was ~10x slower here).
  private def sqlPolyHash(e: String): String = s"graft_polyhash($e, 31, ${P}L)"
  private def sqlPolyHash2(e: String): String = s"graft_polyhash($e, 131, ${P2}L)"

  def withSimhash(docs: DataFrame): DataFrame =
    docs
      .repartition(col("doc_id")) // spread CPU-heavy narrow work (see withShingles)
      .select(col("doc_id"),
        // one codegen'd pass (graft.functions.SimHash60); the HOF
        // formulation it replaces ([[simhashHofExpr]]) ran interpreted and
        // ~60x over the token structs
        call_function("graft_simhash", col("text")).as("simhash"))

  /** The original HOF formulation of the same simhash — kept as the
    * cross-implementation check for the [[graft.functions.SimHash60]]
    * kernel (NearDupSpec asserts equality on the corpus). */
  private[graft] def simhashHofExpr: Column = expr(
    s"""element_at(transform(array(regexp_extract_all(lower(text), '[a-z0-9]+', 0)), ws ->
          element_at(transform(array(transform(array_distinct(ws), w ->
              named_struct(
                'h', ${sqlPolyHash("w")} + shiftleft(${sqlPolyHash2("w")}, 30),
                'c', CAST(size(filter(ws, x -> x = w)) AS BIGINT)))), whs ->
            aggregate(sequence(0, ${SimBits - 1}), 0L, (acc, i) -> acc +
              IF(2 * aggregate(whs, 0L,
                     (a2, s) -> a2 + IF(shiftright(s.h, i) % 2 = 1, s.c, 0L))
                   > CAST(size(ws) AS BIGINT),
                 shiftleft(1L, i), 0L))), 1)), 1)""")

  /** The pigeonhole block keys of a 60-bit simhash — 4 blocks of 15 bits;
    * a Hamming-distance<=3 pair shares at least one equal block. ONE
    * definition on purpose: the streaming admission gate
    * ([[graft.streaming.StreamingPipeline.streamingNearDupAdmit]]) and the
    * batch q47 join must partition identically or the streaming gate's
    * exact-recall argument silently breaks. Returns
    * array<struct<blk:int, key:bigint>> for explode. */
  def simhashBlockKeys(sim: Column): Column = {
    val blockBits = SimBits / SimBlocks
    array((0 until SimBlocks).map(b =>
      struct(lit(b).as("blk"),
        pmod(shiftright(sim, b * blockBits), lit(1L << blockBits)).as("key"))): _*)
  }

  def simhashPairs(docs: DataFrame): DataFrame = {
    val sig = withSimhash(docs)
    val blocks = sig
      .select(col("doc_id"), col("simhash"), explode(simhashBlockKeys(col("simhash"))).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)").cast("long"))
      .filter(col("hamming") <= HammingT)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Presentation ordering for a pair output (tiny by nature: the near-dup
    * fraction). Applied by the QUERY ENTRIES, never by the pair engines —
    * downstream pipeline consumers (q54 clustering, q67 admission) would
    * otherwise inherit a one-partition funnel between the pair join and
    * their own shuffles. */
  /** SymSpell-style fuzzy vocabulary linkage (Garbe's deletion-neighborhood
    * blocking, public algorithm): every pair of corpus words within
    * Levenshtein distance 1, found WITHOUT an all-pairs scan, plus the
    * higher-frequency side as the suggested canonical form — the
    * typo/OCR-variant normalization step of corpus cleaning, and the
    * word-level sibling of the document near-dup family above.
    *
    * Blocking is exact, not heuristic: two words are within edit distance
    * 1 iff they share a key in {word} ∪ {word with one char deleted}
    * (equal → same word; insertion/deletion → one IS the other's deletion;
    * substitution → same-position deletions collide). So the equi-join on
    * the key has GUARANTEED recall, and the `levenshtein <= 1` filter only
    * removes false candidates (e.g. "ab"/"ba" share deletion keys but are
    * distance 2). First-char or length blocking — the tempting simple
    * schemes — would MISS first-char substitutions; this one cannot.
    *
    * Scale shape: everything is VOCABULARY-sized (Zipf-small vs the
    * corpus). Keys explode to |w|+1 rows per word; candidates come from ONE
    * self-equi-join on the key (shuffle on md5-like short strings, hot
    * short-word keys are bounded by the alphabet); the distance check and
    * count joins are vocab-scale. Never doc×doc, never word×word. */
  /** q144's core: MOSS-style overlap detection via winnowing fingerprints
    * (Schleimer et al. SIGMOD 2003, the local-fingerprinting refinement of
    * q46's single global minimum) — each doc keeps the min k-gram hash of
    * every [[WinnowW]]-wide window ([[graft.functions.Winnow]], one fused
    * codegen pass), fingerprints recurring across more than [[WinnowMaxDf]]
    * docs are pruned (corpus-wide boilerplate grams — MOSS's shared-code
    * exclusion), and doc pairs sharing at least [[WinnowMinShared]]
    * survivors are reported with their overlap count. The 4th member of
    * the near-dup family: Jaccard (q41) measures SET similarity, MinHash
    * (q42) approximates it, SimHash (q47) measures angular similarity —
    * winnowing localizes CONTIGUOUS overlap (any shared run of
    * k+w-1 = 20 chars is guaranteed a shared fingerprint).
    *
    * Scale shape: fingerprints are ~2/(w+1) of the gram count per doc
    * (the winnowing density bound), candidate generation is one
    * fingerprint-equi self-join whose bucket sizes the df-prune caps at
    * [[WinnowMaxDf]] — output <= df·|fps| — and the pair count is one
    * partial+final agg. Never doc×doc. */
  def winnowPairs(docs: DataFrame): DataFrame = {
    val fps = docs.repartition(col("doc_id")) // spread CPU-heavy narrow work
      .select(col("doc_id"), explode(call_function("graft_winnow",
        col("text"), lit(WinnowK), lit(WinnowW), lit(31), lit(P))).as("fp"))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") <= WinnowMaxDf)
      .select(col("fp"))
    val pruned = fps.join(rare, Seq("fp"))
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= WinnowMinShared)
  }

  def fuzzyVocabLinkage(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val keys = vocab.select(col("w"), explode(expr(
      """array_union(
           array(w),
           transform(sequence(1, length(w)),
             i -> concat(substring(w, 1, i - 1), substring(w, i + 1))))"""))
      .as("key"))
    val cands = keys.as("a").join(keys.as("b"), col("a.key") === col("b.key"))
      .filter(col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
    cands
      .join(vocab.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(vocab.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("c1"), col("c2"),
        when(col("c2") > col("c1"), col("w2")).otherwise(col("w1")).as("canonical"))
  }

  def sortedPairs(pairs: DataFrame): DataFrame =
    pairs.repartition(1).sortWithinPartitions(col("id_a"), col("id_b"))

  /** q230 content-defined chunking parameters: rolling window, boundary
    * divisor (expected chunk length ≈ divisor chars). */
  val CdcWindow = 16
  val CdcDivisor = 32

  // -- Bloom cross-release dedup (q248) parameters: m = 2^20 bits (128 KiB
  // of filter, 16384 longs), k = 7 probes. At this gate's history size
  // (n <= ~3.5k docs at sf0.1) the false-positive rate
  // (1 - e^{-kn/m})^k is below 1e-11, so the deterministic audit bound of
  // 16 observed FPs is astronomically conservative at every sf. Sizing at
  // 100 TB: m scales with |history| (1% FPR needs ~9.6 bits/key — 10B keys
  // = 12 GiB, beyond comfortable broadcast), so a full-corpus deployment
  // shards the filter by key prefix and routes arrivals with an
  // equi-shuffle; the ALGEBRA here (OR-merge bitsets, double-hash probes)
  // is shard-shape already.
  val BloomBits = 1 << 20
  val BloomHashes = 7

  /** ONE definition of the probe positions for builder and prober — the
    * two cannot desynchronize. Kirsch-Mitzenmacher double hashing
    * (g_i = h1 + i*h2, 2006, public) over two murmur3-finalizer mixes of
    * the 64-bit key. */
  object Bloom {
    /** Build half — delegates to the ONE Kirsch–Mitzenmacher construction
      * ([[graft.functions.HashUtil.bloomSet]]) the `graft_bloom_might`
      * codegen probe mirrors, so build and probe cannot disagree. */
    def set(bits: Array[Long], h: Long, numBits: Int, k: Int): Unit =
      graft.functions.HashUtil.bloomSet(bits, h, numBits, k)
    /** Scala reference of the probe (specs pin kernel ≡ this). */
    def mightContain(bits: Array[Long], h: Long, numBits: Int, k: Int): Boolean =
      graft.functions.HashUtil.bloomMight(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(bits), h, numBits, k)
  }

  /** Fixed-size Bloom filter over 64-bit content hashes as a typed
    * Aggregator (Bloom 1970; the deployment mode is Dolma's cross-release
    * deduper, Soldaini et al. 2024): the state is the bitset itself,
    * reduce sets k bits, merge ORs — fully commutative/associative, so the
    * build is ONE distributed aggregation pass over the historical release
    * with a fixed-size (never history-sized) state. */
  class BloomAgg(numBits: Int, numHashes: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numBits >>> 6)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      Bloom.set(b, h, numBits, numHashes); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BLOOM CROSS-RELEASE DEDUP (q248, Dolma's deployment mode): admit a
    // new crawl against a PREVIOUS RELEASE too large to equi-join every
    // day. History = the whole documents release, folded ONCE into a
    // fixed-size Bloom filter (BloomAgg, broadcast — 128 KiB here, never
    // history-sized); arrivals = recrawls of every %5 doc (verbatim — must
    // be rejected) plus updated texts of every %7 doc (novel — must be
    // admitted). An arrival whose probe says DEFINITELY-NEW admits with no
    // further work (the Bloom has no false negatives); only the MAYBE-SEEN
    // subset — true duplicates plus <= the FP bound — pays the exact
    // digest anti-join, so the exact join's left side is duplicate-sized,
    // never crawl-sized. The result is therefore EXACTLY the exact
    // anti-join (the oracle), and the probabilistic step never emits an
    // ungated answer: in-query raise_error audits pin (a) zero false
    // negatives (a definitely-new arrival found in history = broken
    // filter) and (b) the observed FP count within the deterministic
    // bound; both are reproduced as literal columns the oracle pins true.
    // Digests shuffle, never text (house dedup rule).
    "q248_bloom_cross_release" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      val docs = t(s, dir, "documents")
      val bloomAgg = new BloomAgg(BloomBits, BloomHashes).toColumn
      val bits = docs.select(xxhash64($"text").as("h")).as[Long]
        .select(bloomAgg).head() // fixed 128 KiB artifact, one agg pass
      // probe through the graft_bloom_might codegen kernel (the filter
      // rides as an array literal — same 128 KiB, inside whole-stage
      // codegen; the scalar udf this replaced opaqued the admission scan)
      val arrivals = docs.filter($"doc_id" % 5 === 0)
        .select($"doc_id", $"text")
        .unionByName(docs.filter($"doc_id" % 7 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"),
            concat($"text", lit(" v2")).as("text")))
        .withColumn("ck", md5($"text"))
        .withColumn("maybe_seen", call_function("graft_bloom_might",
          xxhash64($"text"), typedLit(bits.toSeq), lit(BloomBits), lit(BloomHashes)))
      val histKeys = docs.select(md5($"text").as("ck")).distinct()
      // definitely-new arrivals admit with zero further I/O; only the
      // maybe-set pays the exact anti-join (FP rescue)
      val definite = arrivals.filter(!$"maybe_seen")
      val rescued = arrivals.filter($"maybe_seen")
        .join(histKeys, Seq("ck"), "left_anti")
      // audit (a): a definitely-new arrival must NEVER be in history — a
      // violation means the filter lost a bit (broken no-false-negatives)
      val fnAudit = definite.join(histKeys, Seq("ck"), "left_semi")
        .agg(count(lit(1)).as("fn"))
        .select(when($"fn" > 0, raise_error(concat(
          lit("bloom false negative: "), $"fn".cast("string"),
          lit(" definitely-new arrivals found in history"))).cast("boolean"))
          .otherwise(lit(true)).as("no_false_negatives"))
      // audit (b): observed FPs = maybe-seen arrivals that were actually
      // novel. The bound TRACKS the design FPR at the actual scale instead
      // of a fixed constant: expected FPs = |novel arrivals| x
      // (1-e^{-kn/m})^k with n = the history actually folded — 4x that
      // (floor 16 for tiny sf) only trips on a construction bug (probe/
      // build drift, lost bits), never on growth in n.
      val counts = docs.agg(count(lit(1)).as("n"),
        sum(when($"doc_id" % 7 === 0, 1L).otherwise(0L)).as("novel")).head()
      val histN = counts.getLong(0).toDouble
      val novelN = counts.getLong(1).toDouble
      val fpr = math.pow(
        1.0 - math.exp(-BloomHashes.toDouble * histN / BloomBits), BloomHashes)
      val fpBound = math.max(16L, math.ceil(4.0 * novelN * fpr).toLong)
      val fpAudit = rescued.agg(count(lit(1)).as("fp"))
        .select(when($"fp" > fpBound, raise_error(concat(
          lit(s"bloom FP count out of bound ($fpBound): "), $"fp".cast("string")))
            .cast("boolean"))
          .otherwise(lit(true)).as("fp_within_bound"))
      definite.select($"doc_id", $"ck")
        .unionByName(rescued.select($"doc_id", $"ck"))
        .crossJoin(broadcast(fnAudit)).crossJoin(broadcast(fpAudit))
        .orderBy($"doc_id")
    }),
    // ---- q230: content-defined chunking dedup (the FastCDC/LBFS family,
    //      Muthitacharoen et al. SOSP 2001) — STORAGE-level dedup beside
    //      the semantic members (q40 exact, q42 MinHash, q141 paragraph):
    //      chunk boundaries are set by the CONTENT (rolling-hash windows
    //      whose hash ≡ 0 mod the divisor), so an insertion shifts only
    //      the chunk it lands in and duplicate spans re-align — the
    //      property fixed-size blocks lack and the reason every backup /
    //      dataset-versioning system chunks this way. Pipeline per doc,
    //      entirely inside one projection (text NEVER shuffles): the
    //      graft_gram_hashes window hashes mark cut positions, cuts fold
    //      to (start, end) spans, each span hashes its substring through
    //      graft_polyhash — only (clen, hash) pairs explode out. Corpus
    //      rollup: total/distinct chunk counts and bytes + the top-10
    //      most-duplicated chunks, dedup keyed on (hash, len) so a
    //      modulus collision cannot merge unequal-length chunks. The
    //      oracle recomputes boundaries, spans and hashes from the same
    //      shared polyhash definition. 100 TB: per-doc work ∝ text
    //      length (the same class as q144 winnowing); the shuffle carries
    //      8-byte digests; the rollup is one (hash, len)-keyed agg.
    "q230_cdc_chunking" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val mod = graft.ext.TextOps.HashMod
      val chunks = t(s, dir, "documents")
        .selectExpr("doc_id", "text", s"""
          filter(transform(graft_gram_hashes(text, $CdcWindow, 31, CAST($mod AS BIGINT)),
                   (h, i) -> IF(h % $CdcDivisor = 0, i + $CdcWindow, CAST(NULL AS INT))),
                 x -> x IS NOT NULL) AS cuts""")
        .selectExpr("doc_id", s"""
          transform(
            filter(
              zip_with(concat(array(1), transform(cuts, c -> c + 1)),
                       concat(cuts, array(length(text))),
                       (s, e) -> struct(s AS s, e AS e)),
              sp -> sp.s <= sp.e),
            sp -> struct(CAST(sp.e - sp.s + 1 AS BIGINT) AS clen,
                         graft_polyhash(substring(text, sp.s, sp.e - sp.s + 1), 31,
                                        CAST($mod AS BIGINT)) AS h))
          AS chunks""")
        .selectExpr("doc_id", "explode(chunks) AS ch")
        .select(col("ch.clen").as("clen"), col("ch.h").as("h"))
        .localCheckpoint() // three aggregates read it; compute the pass once
      val total = chunks.agg(count(lit(1)).as("a"), sum(col("clen")).as("b"))
        .select(lit("chunks").as("sect"), col("a"), col("b"))
      val distinctStats = chunks.groupBy(col("h"), col("clen")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("a"), sum(col("clen")).as("b"))
        .select(lit("distinct").as("sect"), col("a"), col("b"))
      val top = chunks.groupBy(col("h"), col("clen")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("h"), col("clen")).limit(10)
        .select(lit("top").as("sect"), col("h").as("a"), col("cnt").as("b"))
      total.unionByName(distinctStats).unionByName(top)
        .repartition(1).sortWithinPartitions(col("sect"), col("a"), col("b"))
    }),

    "q41_neardup_jaccard" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      sortedPairs(exactJaccardPairs(t(s, dir, "documents")))
    }),
    "q42_minhash_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      sortedPairs(minhashLshPairs(t(s, dir, "documents")))
    }),
    "q47_simhash" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      sortedPairs(simhashPairs(t(s, dir, "documents")))
    }),

    // ---- q114: word-level fuzzy linkage. The corpus vocabulary is
    //      synthetic word soup with no real typos, so variants are PLANTED
    //      deterministically (every 7th doc appends a one-char-mangled
    //      copy of its own first word — substitution/deletion/insertion
    //      rotating by doc_id) and the operator must link each variant
    //      back to its source word by edit distance alone.
    "q114_fuzzy_vocab" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" "),
          expr("""CASE doc_id % 21
                    WHEN 0 THEN concat('q', substring(element_at(split(lower(text), ' '), 1), 2))
                    WHEN 7 THEN substring(element_at(split(lower(text), ' '), 1), 2)
                    ELSE concat('q', element_at(split(lower(text), ' '), 1))
                  END""")))
          .otherwise(col("text")))
      fuzzyVocabLinkage(planted)
        .repartition(1).sortWithinPartitions(col("w1"), col("w2"))
    }),

    // ---- q144: winnowing fingerprint overlap — contiguous-substring
    //      near-dup detection over the corpus' natural re-crawl copies
    //      (the same planted duplicates q41/q42/q47 find by other
    //      metrics), plus whatever genuinely shares >= 20-char runs.
    "q144_winnow_overlap" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      winnowPairs(t(s, dir, "documents"))
        .repartition(1).sortWithinPartitions(col("id_a"), col("id_b"))
    })
  )

  // Exact all-pairs oracles (fine at sf0.01's 500 docs; the Spark side is the
  // scalable plan). q41 and q42 share one oracle by construction.
  private def jaccardOracle: String = s"""
    WITH sh AS (
      SELECT doc_id, ${TextOps.shinglesSql("text", ShingleK)} AS sh FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      len(list_intersect(a.sh, b.sh))::DOUBLE
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardT
    ORDER BY id_a, id_b"""

  /** DuckDB SQL computing (doc_id, simhash) over any relation with
    * (doc_id, text) — the oracle-side mirror of [[withSimhash]], shared by
    * the q47 batch oracle and the q87 bounded-streaming-admission oracle so
    * both gates provably check the SAME signature definition. */
  def simhashSigSql(rel: String): String = s"""
      SELECT doc_id,
        list_reduce(list_prepend(0::BIGINT, range(0, $SimBits)), (acc, i) -> acc +
          CASE WHEN 2 * list_sum(list_transform(whs,
                 s -> CASE WHEN (s.h >> i) % 2 = 1 THEN s.c ELSE 0 END)) > total
               THEN (1::BIGINT << i) ELSE 0 END) AS simhash
      FROM (
        SELECT doc_id, len(ws)::BIGINT AS total,
          list_transform(list_distinct(ws),
            w -> {'h': ${TextOps.polyHashSql("w")} + ((${polyHash2Sql("w")}) << 30),
                  'c': len(list_filter(ws, x -> x = w))::BIGINT}) AS whs
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM $rel))"""

  private def simhashOracle: String = s"""
    WITH sig AS (${simhashSigSql("documents")})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingT
    ORDER BY id_a, id_b"""

  private def polyHash2Sql(e: String): String =
    s"""list_reduce(
          list_prepend(0::BIGINT,
            list_transform(range(1, length($e)+1), i -> ord(substring($e, i, 1))::BIGINT)),
          (acc, c) -> (acc*131 + c) % $P2)"""

  val oracles: Map[String, String] = Map(
    // q248: the exact anti-join truth — recrawls are rejected (their text
    // is in the release), ' v2' updates admit; audits pinned true.
    "q248_bloom_cross_release" -> """
      WITH hist AS (SELECT md5(text) AS ck FROM documents),
      arr AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1000000, text || ' v2' FROM documents WHERE doc_id % 7 = 0)
      SELECT a.doc_id, md5(a.text) AS ck,
        true AS no_false_negatives, true AS fp_within_bound
      FROM arr a
      WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.ck = md5(a.text))
      ORDER BY a.doc_id""",
    // q230: recompute boundaries, spans, chunk hashes from the shared
    // polyhash definition, declaratively.
    "q230_cdc_chunking" -> s"""
      WITH cuts AS (
        SELECT doc_id, text,
          list_filter(
            list_transform(range(1, length(text) - $CdcWindow + 2),
              gi -> CASE WHEN (${TextOps.polyHashSql(s"substring(text, gi, $CdcWindow)")})
                              % $CdcDivisor = 0
                         THEN gi + ${CdcWindow - 1} END),
            x -> x IS NOT NULL) AS cuts
        FROM documents),
      spans AS (
        SELECT doc_id, text,
          list_prepend(1, list_transform(cuts, bc -> bc + 1)) AS starts,
          list_append(cuts, length(text)) AS ends
        FROM cuts),
      sp AS (
        SELECT doc_id, text,
          unnest(list_filter(
            list_transform(range(1, len(starts) + 1),
              si -> struct_pack(s := starts[si], e := ends[si])),
            spn -> spn.s <= spn.e)) AS spn
        FROM spans),
      ch AS (
        SELECT CAST(spn.e - spn.s + 1 AS BIGINT) AS clen,
          (${TextOps.polyHashSql("substring(text, spn.s, spn.e - spn.s + 1)")}) AS h
        FROM sp),
      dist AS (SELECT h, clen, CAST(count(*) AS BIGINT) AS cnt
               FROM ch GROUP BY h, clen)
      SELECT 'chunks' AS sect, CAST(count(*) AS BIGINT) AS a,
             CAST(sum(clen) AS BIGINT) AS b FROM ch
      UNION ALL
      SELECT 'distinct' AS sect, CAST(count(*) AS BIGINT) AS a,
             CAST(sum(clen) AS BIGINT) AS b FROM dist
      UNION ALL
      SELECT 'top' AS sect, h AS a, cnt AS b FROM (
        SELECT h, clen, cnt FROM dist ORDER BY cnt DESC, h, clen LIMIT 10)
      ORDER BY sect, a, b""",

    "q41_neardup_jaccard" -> jaccardOracle,
    "q42_minhash_lsh" -> jaccardOracle,
    "q47_simhash" -> simhashOracle,

    // All-pairs ground truth over the (vocab-sized) word set: every word
    // pair at levenshtein <= 1 — the set the deletion-key blocking must
    // reproduce exactly. Same planted-variant synthesis.
    "q114_fuzzy_vocab" -> """
      WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN
            text || ' ' ||
            CASE doc_id % 21
              WHEN 0 THEN 'q' || substring(string_split(lower(text), ' ')[1], 2)
              WHEN 7 THEN substring(string_split(lower(text), ' ')[1], 2)
              ELSE 'q' || string_split(lower(text), ' ')[1]
            END
          ELSE text END AS text
        FROM documents),
      v AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
              FROM planted)
        GROUP BY w),
      p AS (
        SELECT a.w AS w1, b.w AS w2, a.c AS c1, b.c AS c2
        FROM v a JOIN v b ON a.w < b.w
        WHERE levenshtein(a.w, b.w) <= 1)
      SELECT w1, w2, c1, c2,
        CASE WHEN c2 > c1 THEN w2 ELSE w1 END AS canonical
      FROM p
      ORDER BY w1, w2""",

    // Replays winnowing declaratively: per-position k-gram polyhashes in
    // document order, window minima, distinct per doc, df prune, pair
    // counts — the kernel's exact contract.
    "q144_winnow_overlap" -> s"""
      WITH hs AS (
        SELECT doc_id,
          CASE WHEN length(text) < $WinnowK THEN CAST([] AS BIGINT[])
            ELSE list_transform(range(1, length(text) - ${WinnowK - 2}),
              gi -> ${TextOps.polyHashSql(s"substring(text, CAST(gi AS INT), $WinnowK)")})
          END AS hs
        FROM documents),
      fp AS (
        SELECT DISTINCT doc_id, fp FROM (
          SELECT doc_id,
            unnest(list_transform(
              range(1, greatest(len(hs) - ${WinnowW - 1}, 1) + 1),
              i -> list_min(hs[CAST(i AS INT) : CAST(i + ${WinnowW - 1} AS INT)]))) AS fp
          FROM hs WHERE len(hs) > 0)),
      rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= $WinnowMaxDf),
      pf AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared
      FROM pf a JOIN pf b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared
      ORDER BY id_a, id_b"""
  )
}
