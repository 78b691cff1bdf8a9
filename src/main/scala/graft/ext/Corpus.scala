package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-construction operators — the second tier of the training-data
  * pipeline extension (SURVEY §2 ext rows): what a 100 TB pre-training
  * corpus build runs AFTER near-dup detection and quality scoring.
  *
  *  - q54 dedup clustering: connected components over the exact near-dup
  *    pair set, canonical doc (min id) per cluster — "keep one per cluster"
  *    is the step that actually shrinks the corpus.
  *  - q55 deterministic stratified sampling: per-language keep rates, keyed
  *    on a portable content hash — reproducible corpus mixing with no RNG
  *    state anywhere.
  *  - q56 sequence packing: per-language fixed-budget (4096-token) context
  *    window assignment by running token count.
  *  - q57 benchmark contamination: documents sharing any char-13-gram with
  *    a benchmark set (the n-gram-overlap decontamination rule).
  *  - q58 repetition signals: duplicate-word and top-bigram fractions
  *    (Gopher-style repetition quality gates).
  *  - q59 TF-IDF top terms per document (ratio-form idf — exact cross-engine
  *    arithmetic, no libm log whose last ulp may differ).
  *  - q65 domain-mixture sampling: each source (domain) gets a token
  *    budget; docs are admitted in deterministic content-hash order until
  *    the budget fills — the "mix domains to target token counts" step of
  *    a pre-training data recipe.
  *  - q67 incremental admission: a new crawl batch is near-dup-gated
  *    against the existing corpus (and first-wins within the batch) — the
  *    daily operation of a living 100 TB corpus, as an anti-join over the
  *    q41 banded pair set.
  *  - q68 quality-filter audit: C4/Gopher-style priority rule chain
  *    (length, alphabetic ratio, word repetition) with per-rule rejection
  *    counts — the "why did the corpus shrink" report every filtering run
  *    ships with. All thresholds are integer cross-multiplications, so no
  *    engine ever divides.
  *  - q69 vocabulary build: top-K corpus terms with cumulative coverage —
  *    the seed-vocabulary step of tokenizer training. Top-K is a
  *    distributed TakeOrdered, never a global sort.
  *
  * The reference has no corpus operators (it delegates all query capability
  * to Spark SQL); these extend the documents/embeddings extension surface.
  */
object Corpus {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Tokens per 4096-token context window (q56). */
  val PackBudget = 4096L

  /** Per-source token budgets for the q65/q86 mixture (whitespace tokens;
    * the table is the recipe's mixing weights — ONE definition for the
    * batch CASE, its SQL mirror, and the streaming budget function). */
  val MixBudgets: Map[String, Long] =
    Map("src0" -> 1500L, "src1" -> 900L, "src2" -> 600L)
  val MixDefaultBudget = 500L
  def mixBudgetFor(source: String): Long =
    MixBudgets.getOrElse(source, MixDefaultBudget)
  private def mixBudget: Column =
    MixBudgets.foldLeft(null: Column) { case (acc, (src, b)) =>
      if (acc == null) when(col("source") === src, b)
      else acc.when(col("source") === src, b)
    }.otherwise(MixDefaultBudget)
  private[graft] val mixBudgetSql =
    "CASE source " + MixBudgets.toSeq.sortBy(_._1)
      .map { case (s, b) => s"WHEN '$s' THEN $b" }.mkString(" ") +
      s" ELSE $MixDefaultBudget END"

  /** Top-K vocabulary size for q69. */
  val VocabK = 100

  /** Per-canonical-host whitespace-token budget for q96's admission
    * (q65's start-below-budget rule, keyed by canonical host). */
  val HostBudget = 1200L

  /** q98 line-dedup geometry: content "lines" are [[LineWords]]-word groups
    * (the corpus has no newlines — both engines synthesize the identical
    * segmentation), and a line recurring across at least [[BoilerDf]]
    * distinct documents is boilerplate. */
  val LineWords = 8L
  val BoilerDf = 5L

  /** q141 paragraph-dedup geometry: "paragraphs" are [[ParaWords]]-word
    * groups (q98's no-newline synthesis discipline, coarser granularity),
    * and dedup keeps each distinct paragraph's FIRST global occurrence —
    * the Dolma-style paragraph-level exact dedup between q40's document
    * granularity and q70's substring granularity. */
  val ParaWords = 12L

  /** q178 Gopher rule constants (Rae et al. 2021, Table A1 — public):
    * word-count bounds, mean-word-length bounds, the ≥2-distinct-stopword
    * requirement, and the top-repeated-2-gram character-fraction cap.
    * The stop list is adapted to this corpus's 30-word vocabulary (only
    * `the`/`a` of Gopher's list occur at all — the paper's own list would
    * make the rule constant-false); the 2-gram rule is made deterministic
    * by scoring the most CHARACTER-COVERING repeated bigram (max over
    * bigrams of count x chars — no "most frequent" tie to break). One
    * definition feeds the Spark plan and the oracle. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinWlen = 3.0
  val GopherMaxWlen = 10.0
  val GopherMinStop = 2L
  val Gopher2gCap = 0.20
  val GopherStops: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "for")

  /** q179 DSIR geometry (Xie et al. NeurIPS 2023 — public): the target
    * domain whose distribution raw docs are scored against, and the
    * selection budget (the paper resamples a fixed-size subset; the
    * deterministic variant takes the top-[[DsirK]] by importance weight,
    * doc_id tie-break). */
  val DsirTarget = "src0"
  val DsirK = 100

  /** q183 length-bucketed batching geometry: docs bucket by token-count
    * range ([[LenBucketWidth]] tokens per bucket), batches of
    * [[BatchDocs]] docs form WITHIN a bucket in (len desc, doc_id) order —
    * the fairseq/HF `group_by_length` idiom that bounds padding waste
    * without any global sort. */
  val LenBucketWidth = 16L
  val BatchDocs = 8L

  /** q184 seed-label coarseness: initial community labels are id mod
    * this (label propagation needs colliding seeds for the neighbor MODE
    * to be meaningful — with all-distinct init labels one step degenerates
    * to the CC min rule q54 already covers). */
  val LabelPropMod = 7L

  /** q186 diversity orders: distinct-n ratios reported for n = 1..3. */
  val DiversityMaxN = 3

  /** q201 k-core geometry: the coreness bar and the FIXED number of peel
    * rounds whose trajectory the gate reports (at sf0.01 the 3-core
    * empties in 6 rounds; at other SFs the trajectory after exactly
    * [[PeelRounds]] rounds is still a deterministic, comparable object —
    * the gate pins the trajectory, not a fixpoint claim). */
  val CoreK = 3L
  val PeelRounds = 6

  /** q229 BFS horizon — rounds are driver-synchronized equi-joins, so the
    * hop bound is the iteration budget, not a correctness parameter. */
  val BfsHops = 6

  /** One BFS frontier expansion: the hop-`h` discoveries given the
    * undirected edge set `und(v, u)`, the current `frontier(node)` and the
    * `visited(node, dist)` set — ONE left-semi equi-join (edges touching
    * the frontier) + one left-anti (drop already-discovered). Shared by
    * the q229 gate and its PlanSpec round-shape lock. */
  private[graft] def bfsRound(und: DataFrame, frontier: DataFrame,
      visited: DataFrame, h: Int): DataFrame =
    und.join(frontier.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .select(col("u").as("node")).distinct()
      .join(visited, Seq("node"), "left_anti")
      .select(col("node"), lit(h.toLong).as("dist"))

  /** q142 temperature-mixture geometry: sampling temperature alpha = 0.5
    * realized as sqrt (correctly-rounded IEEE in BOTH engines — a general
    * pow would go through exp/ln whose last ulp is libm-specific), and the
    * global admitted-token budget is total corpus tokens div
    * [[TempBudgetDiv]]. */
  val TempBudgetDiv = 4L

  /** q99 BPE training length: merge iterations to run. Production
    * tokenizers run 30k-100k merges; the gate runs 4 because each
    * iteration exercises the identical argmax/merge step and the oracle
    * replays every one of them in SQL. */
  val BpeTrainIters = 4

  /** q164 lattice bounds: words longer than `UniMaxWordLen` are excluded
    * from the unigram-LM step (SentencePiece caps sentence/word length for
    * the same reason — the lattice is exponential in length), and seed
    * pieces are capped at `UniMaxPieceLen` chars. 2^(8-1) = 128 masks per
    * word keeps the vocabulary-sized E-step explode bounded. Shared by the
    * Spark plan and the oracle. */
  val UniMaxWordLen = 8
  val UniMaxPieceLen = 4

  /** q173 training-sequence length (tokens per packed block, EOS
    * included). Shared by the Spark plan and the oracle. */
  val SeqLen = 512L

  /** Per-word Viterbi winner under the seed unigram LM — (w, f, seg) with
    * `seg` the '|'-joined best segmentation. Shared by the EM M-step
    * (q164) and corpus encoding (q168), so the training-time and
    * apply-time segmentations cannot disagree. See the q164 entry's
    * scaladoc for the algorithm/scale narrative. */
  def unigramSegment(docs: DataFrame): DataFrame = {
    val wf = docs
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .filter(length(col("w")).between(1, UniMaxWordLen))
      .localCheckpoint() // one corpus pass feeds seed AND lattice
    val seed = wf.select(col("f"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           st -> transform(sequence(1, least($UniMaxPieceLen, length(w) - st + 1)),
           ln -> substring(w, st, ln))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("c0"))
    val probs = seed
      .crossJoin(broadcast(seed.agg(sum(col("c0")).as("t0"))))
      .select(col("piece"), (col("c0").cast("double") / col("t0").cast("double")).as("p"))
    // the lattice: every boundary mask of every distinct word; pieces
    // longer than the seed cap are invalid (their mask is pruned BEFORE
    // the probability join — every surviving piece is in the seed by
    // construction, so no segmentation can half-match)
    val lat = wf
      .select(col("w"), col("f"),
        explode(expr("sequence(0L, shiftleft(1L, length(w) - 1) - 1)")).as("m"))
      .withColumn("bounds", expr(
        "concat(array(0), " +
          "filter(sequence(1, length(w)), i -> i < length(w) " +
          "AND (shiftright(m, i - 1) & 1) = 1), array(length(w)))"))
      .withColumn("pieces", expr(
        "transform(sequence(1, size(bounds) - 1), " +
          "k -> substring(w, element_at(bounds, k) + 1, " +
          "element_at(bounds, k + 1) - element_at(bounds, k)))"))
      .filter(expr(s"forall(pieces, pp -> length(pp) <= $UniMaxPieceLen)"))
    val scored = lat
      .selectExpr("w", "f", "m", "posexplode(pieces) AS (pos, piece)")
      .join(probs, Seq("piece"))
      .groupBy(col("w"), col("f"), col("m"))
      .agg(
        expr("aggregate(array_sort(collect_list(struct(pos, p))), " +
          "cast(1.0 AS double), (acc, x) -> acc * x.p)").as("score"),
        count(lit(1)).as("np"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, piece))), " +
          "x -> x.piece), '|')").as("seg"))
    val wBest = Window.partitionBy(col("w"))
      .orderBy(col("score").desc, col("np").asc, col("seg").asc)
    scored
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("w"), col("f"), col("seg"))
  }

  /** One hard-EM unigram-LM tokenizer iteration (q164): M-step piece
    * counts + renormalized probabilities over [[unigramSegment]]'s
    * winners. Returns (piece, cnt, prob). */
  def unigramStep(docs: DataFrame): DataFrame = {
    val counts = unigramSegment(docs)
      .select(col("f"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).cast("long").as("cnt"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("tot"))))
      .select(col("piece"), col("cnt"),
        (col("cnt").cast("double") / col("tot").cast("double")).as("prob"))
      .repartition(1).sortWithinPartitions(col("piece"))
  }

  /** q73 chunking geometry: window of [[ChunkSize]] word tokens advancing by
    * [[ChunkStride]] (so consecutive chunks overlap by Size-Stride tokens —
    * the standard RAG/pre-training context-window slicing). Production
    * values are 512/384 or 2048/1536; the gate uses 32/24 because the
    * corpus docs top out near 100 tokens and a larger window would leave
    * the multi-chunk + overlap path untested. */
  val ChunkSize = 32L
  val ChunkStride = 24L

  /** Whitespace token count — the ONE definition q56's packing budget and
    * the q65/q86 mixing budgets all meter against (they must never
    * drift). */
  def wsTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^ ]+"), lit(0))).cast("long")
  private[graft] def wsTokenCountSql(e: String): String =
    s"len(regexp_extract_all($e, '[^ ]+'))::BIGINT"

  /** q73's core: slice each doc's word tokens into [[ChunkSize]]-token
    * windows advancing by [[ChunkStride]] (zero-token docs are dropped —
    * there is nothing to slice). Output: (doc_id, ci, chunk) with the
    * chunk token array retained so callers (and tests) can inspect the
    * exact slicing. Narrow end-to-end: tokenize → integer chunk count →
    * explode a per-doc index sequence → slice; no shuffle at any size. */
  def chunkOverlap(docs: DataFrame): DataFrame = {
    val (cs, st) = (ChunkSize, ChunkStride)
    docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= cs, 1L)
          .otherwise(lit(1L) + expr(s"(n - $cs + $st - 1) DIV $st")))
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("ci"))
      .select(col("doc_id"), col("ci"),
        slice(col("ws"), (col("ci") * st + 1).cast("int"), lit(cs.toInt)).as("chunk"))
  }

  /** q98's core: RefinedWeb-style line-level boilerplate removal (Penedo et
    * al. 2023 drop duplicated lines; C4, Raffel et al. 2020, drops site
    * chrome) — a line whose exact text recurs across >= `minDf` DISTINCT
    * documents (headers, footers, cookie banners: df ~ the site's doc
    * count) is dropped from EVERY document; content lines (essentially
    * unique) pass through. Input: (doc_id, li, line); output: one row per
    * doc with the line totals and a [[TextOps.polyHash]] of the cleaned
    * text reassembled in line order (emitting a hash, not the rebuilt
    * document, keeps the gate row narrow — q73's chash discipline).
    *
    * Scale shape: the document-frequency pass is a partial+final agg keyed
    * by `md5(line)` (128-bit, collision-free in practice — the key you
    * shuffle at 100 TB instead of raw line strings); the boilerplate set
    * joins back by ONE equi-join (its size ~ sites, not docs — AQE
    * broadcasts it); the reassembly is one per-doc aggregate. Never
    * doc×doc, no driver collect. */
  def removeBoilerplateLines(lines: DataFrame, minDf: Long = BoilerDf): DataFrame = {
    val keyed = lines.withColumn("lkey", md5(col("line").cast("binary")))
    val boiler = keyed.groupBy(col("lkey"))
      .agg(countDistinct(col("doc_id")).as("dfc"))
      .filter(col("dfc") >= minDf)
      .select(col("lkey"), lit(true).as("is_boiler"))
    keyed.join(boiler, Seq("lkey"), "left")
      .withColumn("keep", col("is_boiler").isNull)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("lines_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("lines_kept"),
        TextOps.polyHash(
          expr("array_join(transform(sort_array(collect_list(" +
            "CASE WHEN keep THEN struct(li, line) END)), x -> x.line), ' | ')"))
          .as("clean_hash"))
  }

  /** q141's core: paragraph-level exact dedup (the Dolma pipeline's
    * paragraph granularity, Soldaini et al. 2024; C4 dedups at the
    * three-sentence span) — each DISTINCT paragraph keeps its FIRST global
    * occurrence (lowest (doc_id, pi)) and every later copy is dropped from
    * its document; documents are reassembled in paragraph order. The rule
    * q98's boilerplate removal deliberately is not: df-thresholding drops
    * ALL copies of site chrome, dedup keeps exactly ONE copy of shared
    * content. Input: (doc_id, pi, para); output: one row per doc with
    * paragraph totals and the [[TextOps.polyHash]] of the cleaned text
    * (q73's chash discipline).
    *
    * Scale shape: occurrences are keyed by `md5(para)`, so the winner
    * election shuffles 16-byte digests + (doc_id, pi) — never paragraph
    * text; the winner per digest is ONE partial+final `min(struct)`
    * aggregate; keepers are marked by ONE digest-equi-join (the text rides
    * the probe side, already co-partitioned by the digest); reassembly is
    * one per-doc aggregate. Never paragraph×paragraph, no driver collect. */
  def dedupParagraphs(paras: DataFrame): DataFrame = {
    val keyed = paras.withColumn("pkey", md5(col("para").cast("binary")))
    val firsts = keyed.groupBy(col("pkey"))
      .agg(min(struct(col("doc_id"), col("pi"))).as("first"))
    keyed.join(firsts, Seq("pkey"))
      .withColumn("keep",
        col("doc_id") === col("first.doc_id") && col("pi") === col("first.pi"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("paras_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("paras_kept"),
        TextOps.polyHash(
          expr("array_join(transform(sort_array(collect_list(" +
            "CASE WHEN keep THEN struct(pi, para) END)), x -> x.para), ' | ')"))
          .as("clean_hash"))
  }

  /** q142's core: per-source token targets under temperature sampling
    * (alpha-weighted mixture, the multilingual/multi-domain re-balancing
    * rule of XLM-R / GPT-3 style recipes: weight ∝ tokens^alpha flattens
    * the head and boosts the tail). alpha = 0.5 via `sqrt` so every
    * arithmetic step is correctly-rounded IEEE on both engines; the weight
    * normalizer is a [[graft.util.Sumd.sumd]] decimal-exact sum (source
    * count is small, but partial-agg ORDER must still not drift). Input:
    * (source, src_tokens); output adds (w, target) where
    * target = floor(budget·w / Σw), budget = Σ tokens div [[TempBudgetDiv]].
    * Everything is source-cardinality-sized: one tiny agg + one 1-row
    * broadcast — the corpus is touched only by the caller's admission
    * window (q65's machinery). */
  def temperatureTargets(bySource: DataFrame,
      budgetDiv: Long = TempBudgetDiv): DataFrame = {
    val w = bySource.withColumn("w", sqrt(col("src_tokens").cast("double")))
    val totals = w.agg(
      graft.util.Sumd.sumd(col("w")).as("sumw"),
      sum(col("src_tokens")).as("total_tokens"))
    w.crossJoin(broadcast(totals))
      .withColumn("budget", expr(s"total_tokens div $budgetDiv"))
      .withColumn("target",
        floor(col("budget").cast("double") * col("w") / col("sumw")).cast("long"))
      .drop("sumw", "total_tokens")
  }

  /** q141/q154's shared paragraph synthesis: the per-source promo
    * paragraph + [[ParaWords]]-word content groups, as (doc_id, pi, para)
    * — one definition for the batch dedup, the streaming dedup's feed,
    * and (mirrored in SQL) their SHARED oracle. */
  private[graft] def paragraphs(s: SparkSession, dir: String): DataFrame = {
    val pw = ParaWords
    val contentParas = when(size(col("ws")) === 0,
        expr("cast(array() as array<string>)"))
      .otherwise(expr(
        s"transform(sequence(1, cast((size(ws)+${pw - 1}) div $pw as int)), " +
          s"i -> array_join(slice(ws, cast((i-1)*$pw+1 as int), $pw), ' '))"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"),
        posexplode(concat(
          array(concat(lit("promo "), col("source"), lit(" visit our network today"))),
          contentParas)))
      .select(col("doc_id"), col("pos").cast("long").as("pi"), col("col").as("para"))
  }

  /** q150's core: exact duplicated-substring REMOVAL (Lee et al. ACL 2022
    * — "Deduplicating Training Data Makes Language Models Better" removes
    * repeated spans, not just repeated documents; q70 is the detection
    * report, this is the surgery). Rule, replayed verbatim by the oracle:
    * every k-char gram occurring more than once in the corpus keeps its
    * FIRST occurrence (min (doc_id, pos)) and every other occurrence
    * becomes a removal seed covering chars [pos, pos+k-1]; per doc the
    * seed intervals merge (strict gaps-and-islands: a new island starts
    * when s > max prior end) and the covered chars are cut out, the
    * remainder splicing back together in order.
    *
    * Input: (doc_id, text). Output: (doc_id, chars_total, chars_removed,
    * clean_hash of the spliced text).
    *
    * Scale shape: occurrences come off ONE kernel pass (positional gram
    * hashes, posexploded); the duplicated-gram winner election is q141's
    * partial+final min(struct) + count agg ON THE HASH (the shuffle
    * carries (hash, doc, pos), never text); seeds join back by ONE hash
    * equi-join; interval merge, complement segments, and splicing are
    * per-DOC windows and one per-doc aggregate — bounded by document
    * length, never corpus-wide. No driver collect, never doc×doc. */
  def removeDuplicateSubstrings(docs: DataFrame, k: Int = SubRemK): DataFrame = {
    val occ = docs.repartition(col("doc_id")) // spread CPU-heavy narrow work
      .select(col("doc_id"), col("text"),
        posexplode(call_function("graft_gram_hashes",
          col("text"), lit(k), lit(31), lit(TextOps.HashMod))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
    val dup = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"), min(struct(col("doc_id"), col("p"))).as("first"))
      .filter(col("cnt") >= 2)
    val seeds = occ.join(dup, Seq("h"))
      .filter(!(col("doc_id") === col("first.doc_id") && col("p") === col("first.p")))
      .select(col("doc_id"), col("p").as("s"), (col("p") + (k - 1)).as("e"))
    // strict gaps-and-islands merge of the seed intervals, per doc
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = seeds
      .withColumn("newisl", when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("isl", sum(col("newisl")).over(wDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
    // complement segments: before each island (from prior island end + 1)
    // plus the tail after the last island
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("is"))
    val before = islands
      .withColumn("from", coalesce(lag(col("ie"), 1).over(wIsl) + 1, lit(1L)))
      .select(col("doc_id"), col("from"), (col("is") - 1).as("to"))
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val tails = islands.groupBy(col("doc_id"))
      .agg(max(col("ie")).as("lastie"), sum(col("ie") - col("is") + 1).as("removed"))
      .join(lens, Seq("doc_id"))
      .select(col("doc_id"), (col("lastie") + 1).as("from"), col("len").as("to"),
        col("removed"))
    val segs = before.unionByName(tails.drop("removed"))
      .filter(col("from") <= col("to")) // empty segments (adjacent islands,
        // island ending at the doc's last char) drop out; what remains has
        // 1 <= from <= to <= len, so every substring below is well-formed
    docs.select(col("doc_id"), col("text"))
      .join(segs, Seq("doc_id"), "left")
      .join(tails.select(col("doc_id"), col("removed")), Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("text"), col("removed"))
      .agg(collect_list(when(col("from").isNotNull, struct(col("from"), col("to"))))
        .as("rawsegs"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("chars_total"),
        coalesce(col("removed"), lit(0L)).as("chars_removed"),
        TextOps.polyHash(
          when(col("removed").isNull, col("text")) // no removals: whole doc
            .otherwise(expr(
              "array_join(transform(sort_array(rawsegs), x -> " +
                "substring(text, cast(x.from as int), " +
                "cast(x.to - x.from + 1 as int))), '')")))
          .as("clean_hash"))
  }

  /** q151's core: exact triangle count with degree orientation (Suri &
    * Vassilvitskii WWW 2011). Input: raw (a, b) pairs in any order /
    * multiplicity / with self-loops — canonicalized here. Output: one row
    * (n_nodes, n_edges, n_triangles). Each edge orients from its
    * lower-(degree, id) endpoint; each triangle is counted exactly once
    * at its lowest vertex, and wedge generation per vertex is bounded by
    * the oriented out-degree — O(sqrt(m)) even at a raw-degree hub. */
  def triangleCount(raw: DataFrame): DataFrame = {
    val edges = raw
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // materialized edge table, like q111's feed
    val deg = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("dg"))
    val withDeg = edges
      .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("p"), col("y.v").as("q")) // p < q by construction
    val tri = wedges.join(
        edges.select(col("a").as("p"), col("b").as("q")), Seq("p", "q"))
      .agg(count(lit(1)).as("n_triangles"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = edges.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
  }

  /** q150 removal-span size. DELIBERATELY coarser than q70's 13-char
    * detection grams: removal follows Lee et al.'s long-span threshold
    * (they remove 50+-token repeats; fine grams are for SIGNALS, not
    * surgery). On this corpus the chance-collision rate falls off a cliff
    * between 30 and 40 chars (13-char grams over the small synthetic
    * vocabulary recur by chance and would cut 90% of the corpus; 40-char
    * spans hit exactly the planted re-crawl runs — 24 docs at sf0.01). */
  val SubRemK = 40

  /** q99's core: ONE BPE merge iteration over a segmented vocabulary
    * (f: word frequency, s: current symbol array). Returns (best, merged):
    * the argmax pair as a one-row frame (pair as "L R", its weighted
    * count) and the vocabulary with that merge applied. The merge encodes
    * the segmentation with symbols double-space separated and single-space
    * fenced (' a  b  c '), so the literal replace ' L  R ' -> ' LR ' is
    * boundary-safe for MULTI-character symbols (pair (b,c) cannot match
    * inside [ab, c]) and keeps BPE's greedy left-to-right non-overlapping
    * order ([a,a,a] -> [aa,a], [a,a,a,a] -> [aa,aa]) — Sennrich et al.
    * 2016's reference semantics. Everything runs on the vocabulary: pair
    * counts are partial+final aggs; the argmax joins back as a one-row
    * broadcast, never a collect. Columns beyond (f, s) — q112 carries the
    * word itself — pass through untouched. */
  def bpeStep(vocab: DataFrame): (DataFrame, DataFrame) = {
    val pairs = vocab.filter(size(col("s")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, size(s)-1), " +
          "j -> concat(element_at(s, j), ' ', element_at(s, j+1)))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
    val best = pairs.orderBy(col("cnt").desc, col("pair")).limit(1)
    val merged = vocab.crossJoin(broadcast(best))
      .withColumn("seg", concat(lit(" "), array_join(col("s"), "  "), lit(" ")))
      .withColumn("s", expr(
        "split(trim(replace(seg, " +
          "concat(' ', replace(pair, ' ', '  '), ' '), " +
          "concat(' ', replace(pair, ' ', ''), ' '))), '  ')"))
      .drop("seg", "pair", "cnt")
    (best, merged)
  }

  /** q54's core, presentation-free (q82 aggregates it directly): exact
    * near-dup pairs → connected components → per-cluster canonical (min
    * id) and size. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val pairs = NearDup.exactJaccardPairs(t(s, dir, "documents"))
    val labels = connectedComponents(pairs)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("canonical_id"), col("cluster_size"))
  }

  /** Conf key: pair count at or under which [[connectedComponents]] runs
    * the driver union-find instead of the iterative distributed loop. */
  val CcMaxDriverPairsConf = "spark.graft.cc.maxDriverPairs"
  val CcDefaultMaxDriverPairs = 1000000L

  /** Adaptive dispatch, the same design as q41's bitmap/PPJoin split: the
    * pair set is the near-dup FRACTION of the corpus, usually orders of
    * magnitude smaller, so when one count shows it is driver-sized a
    * single-pass union-find beats rounds of join+aggregate jobs (each
    * round is 2-3 jobs of pure scheduling overhead on a small frame). The
    * decision is one cheap aggregate; above the bound the fully
    * distributed loop runs. Both paths produce identical labels
    * (CorpusSpec cross-validates). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val maxDriver = math.max(0L, pairs.sparkSession.conf
      .getOption(CcMaxDriverPairsConf).map(_.toLong).getOrElse(CcDefaultMaxDriverPairs))
    // The pair plan is typically the EXPENSIVE part (q54 feeds the q41
    // banded join in here) — materialize it exactly once, so the dispatch
    // probe and whichever path wins both read the checkpointed rows
    // instead of re-running the join. Bounded: the pair set IS the
    // near-dup fraction. Freed below once the winning path no longer
    // needs the blocks (union-find is done after its collect; the loop's
    // result is itself checkpointed, lineage truncated).
    val p = pairs.localCheckpoint()
    try {
      // limit+count (not a full count): at scale this stops after
      // maxDriver+1 rows. A bound at/above Int.MaxValue cannot be probed
      // with limit (and maxDriver+1 would overflow at Long.MaxValue) — a
      // driver collect that size is a misconfiguration, so pay one full
      // count rather than silently routing everything to the driver.
      val probed =
        if (maxDriver < Int.MaxValue.toLong) p.limit((maxDriver + 1).toInt).count()
        else p.count()
      if (probed <= maxDriver) unionFindLabels(p)
      else {
        // the probe stopped at maxDriver+1; the loop sizes its partitioning
        // from the REAL pair count (cheap: p is checkpointed)
        connectedComponentsLoop(p, maxIters, pairCount = p.count())
      }
    } finally freeCheckpoint(p)
  }

  /** One PageRank power-iteration step over a link graph (Page et al.
    * 1999, public algorithm) — the link-analysis quality signal of a
    * web-scale corpus build: crawl prioritization and page-quality
    * weighting rank pages/hosts by incoming-link mass, the graph sibling
    * of q107's embedding power iteration.
    *
    * `edges(src, dst)`, `ranks(id, rank)` — the caller's complete node set
    * with current mass (the q111 gate feeds the uniform start). One step:
    * r'(v) = (1-d)/N + d·Σ_{u→v} r(u)/outdeg(u) + d·dangling/N, the
    * dangling mass (nodes with no out-links) redistributed uniformly so
    * total mass is conserved.
    *
    * Scale shape: outdeg is a partial+final agg on src; contributions are
    * ONE equi-join of edges with the per-src rate (shuffle on src — both
    * frames are graph-sized, neither broadcastable at 100 TB) then a
    * partial+final agg on dst; N and the dangling mass ride in one
    * broadcast row. Sums run at DECIMAL(38,18) ([[graft.util.Sumd.sumdHi]]
    * — probability-scale terms, far below DECIMAL(18,6)'s resolution) so
    * partial-agg order cannot drift from the oracle. Every IEEE op is
    * ordered identically in the q111 oracle SQL. */
  def pageRankStep(edges: DataFrame, ranks: DataFrame, damping: Double = 0.85): DataFrame = {
    val d = lit(damping)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = ranks.join(deg, col("id") === col("src"), "left").drop("src")
    val totals = withDeg.agg(
      count(lit(1)).as("n"),
      graft.util.Sumd.sumdHi(
        when(col("outdeg").isNull, col("rank")).otherwise(lit(0.0))).as("dangling"))
    val rate = withDeg.filter(col("outdeg").isNotNull)
      .select(col("id").as("src_id"), (col("rank") / col("outdeg")).as("c"))
    val inSum = edges.join(rate, col("src") === col("src_id"))
      .groupBy(col("dst")).agg(graft.util.Sumd.sumdHi(col("c")).as("in_sum"))
    ranks.select(col("id")).join(inSum, col("id") === col("dst"), "left").drop("dst")
      .crossJoin(broadcast(totals))
      .select(col("id"),
        ((lit(1.0) - d) / col("n")
          + d * coalesce(col("in_sum"), lit(0.0))
          + d * col("dangling") / col("n")).as("rank"))
  }

  /** Release a localCheckpoint'ed frame's executor storage blocks (no-op
    * for frames that are not checkpointed). */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))

  /** Driver union-find over a driver-sized pair set (path-halving, union
    * by min label so the canonical id is the component minimum — the same
    * labels the distributed loop converges to). */
  private[graft] def unionFindLabels(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) {
        parent.put(r, parent.get(parent.get(r))) // path halving
        r = parent.get(r)
      }
      r
    }
    // self-pairs are malformed input (upstream pair joins emit id_a <
    // id_b); skip them so both dispatch paths agree (the distributed loop
    // canonicalizes them away)
    edges.foreach { case (a, b) =>
      if (a != b) {
        parent.putIfAbsent(a, a)
        parent.putIfAbsent(b, b)
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) { // union by MIN root: canonical = component minimum
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
    }
    val out = parent.keySet().iterator()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (out.hasNext) { val id = out.next(); rows += ((id, find(id))) }
    rows.toSeq.toDF("id", "label")
  }

  /** Directed loop edges per partition — the target that sizes the star
    * loop's partitioning from the dispatcher's pair-count probe. */
  val CcEdgesPerLoopPartition = 2000000L

  /** The fully distributed scale path of [[connectedComponents]]: the
    * alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * algorithm). Each round every node re-attaches its neighbors to the
    * minimum of its neighborhood:
    *
    *  - large-star: for each node u, every STRICTLY LARGER neighbor is
    *    re-pointed at m = min(neighborhood(u) ∪ {u});
    *  - small-star: for each node u, its smaller-or-equal neighbors (and u
    *    itself) are re-pointed at the minimum among them.
    *
    * Unlike plain min-label propagation (whose round count is the graph
    * DIAMETER — a 2000-link chain needs 2000 rounds), the contraction
    * converges in O(log^2 n) rounds on ANY topology, so one iteration
    * budget covers near-clique dup clusters and pathological chains alike.
    * Each phase is one aggregation + one equi-join on the node id —
    * shuffle-local, no driver data path; the convergence witness (edge
    * count + an order-independent xxhash64 checksum) is two longs per
    * round. At the fixed point every component is a star centered at its
    * minimum node, which is exactly the label relation. `localCheckpoint`
    * per round keeps the plan from growing with iterations; the partition
    * count is derived from the dispatcher's pair-count probe
    * ([[CcEdgesPerLoopPartition]]), clamped to the session's shuffle
    * parallelism — the near-dup fraction is usually tiny, but a 100 TB
    * crawl's pair set sizes up automatically. */
  private[graft] def connectedComponentsLoop(pairs: DataFrame, maxIters: Int = 50,
      pairCount: Long = -1L): DataFrame = {
    val spark = pairs.sparkSession
    val shuffleParts = math.max(1,
      spark.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32))
    val nPairs = if (pairCount >= 0L) pairCount else pairs.count()
    val loopParts = math.max(4L, math.min(shuffleParts.toLong,
      2L * nPairs / CcEdgesPerLoopPartition + 1L)).toInt

    // canonical undirected edges (lo < hi), deduped; self-pairs dropped
    var edges = pairs
      .select(least(col("id_a"), col("id_b")).cast("long").as("lo"),
        greatest(col("id_a"), col("id_b")).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .repartition(loopParts, col("lo"))
      .localCheckpoint()

    // large-star: symmetrize, m(u) = min(u, min neighbor), re-point every
    // neighbor v > u at m — emitted (m, v) keeps the lo<hi canonical form
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi"))
        .distinct()
    }
    // small-star: per node u (the hi side), m = min of its smaller
    // neighbors; re-point those neighbors AND u itself at m
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val nbrs = e.select(col("hi"), col("lo").as("v"))
        .union(mins.select(col("hi"), col("hi").as("v")))
      nbrs.join(mins, "hi")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("lo"), col("v").as("hi"))
        .distinct()
    }
    // Order-independent witness of the edge SET: count + sum of per-edge
    // xxhash64 (summed as DECIMAL(38,0) — a long sum overflows under ANSI).
    // Two scalars cross the driver per round; a changed edge set collides
    // only with ~2^-64 probability, and maxIters still backstops.
    def witness(e: DataFrame): (Long, String) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("lo"), col("hi"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))), lit(0))).head
      (r.getLong(0), String.valueOf(r.get(1)))
    }
    var prev = witness(edges)
    var iter = 0
    var converged = prev._1 == 0L
    while (!converged && iter < maxIters) {
      val old = edges
      // re-pin each round's output to loopParts: the phases' groupBy /
      // join / distinct otherwise shuffle at the session default, which is
      // exactly the per-round scheduling overhead the adaptive partition
      // count exists to avoid on small pair sets
      edges = smallStar(largeStar(old))
        .repartition(loopParts, col("lo"))
        .localCheckpoint() // eager, then free old
      freeCheckpoint(old)
      val w = witness(edges)
      converged = w == prev
      prev = w
      iter += 1
    }
    // Partially-contracted edges are SILENT data corruption for a dedup
    // pipeline (one real cluster reported as several "canonical" docs) —
    // never return them.
    if (!converged) {
      freeCheckpoint(edges)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds — " +
          "raise maxIters (the star contraction needs O(log^2 n) rounds)")
    }
    // fixed point: every component is a star (componentMin, member) — the
    // label relation is the edges themselves plus the centers' self-labels
    edges.select(col("hi").as("id"), col("lo").as("label"))
      .union(edges.select(col("lo").as("id"), col("lo").as("label")).distinct())
  }

  /** The interpreted-HOF formulation of q58's statistics — kept as the
    * cross-implementation check for the `graft_rep_stats` kernel
    * (CorpusSpec asserts equality on the corpus). Columns:
    * (doc_id, n, n_distinct, top_bigram). */
  private[graft] def repetitionHof(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("bg",
        when(col("n") >= 2, expr(
          "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("n"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        when(col("n") < 2, 0L).otherwise(
          expr("array_max(transform(array_distinct(bg), b -> size(filter(bg, x -> x = b))))")
            .cast("long")).as("top_bigram"))

  /** q178's per-doc Gopher rule matrix over a (doc_id, text) frame. Two
    * doc_id-keyed aggregates off one words-array projection (per-word
    * stats, adjacent-bigram cover) joined on doc_id; ratios are single
    * IEEE divisions of exact integer sums. */
  def gopherMatrix(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val perWord = d.select(col("doc_id"), explode(col("ws")).as("wd"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"),
        sum(length(col("wd"))).cast("long").as("sumlen"),
        countDistinct(when(col("wd").isInCollection(GopherStops), col("wd")))
          .as("n_stop"))
    // adjacent bigrams via two shifted slices zipped — no self-join
    val cover = d
      .select(col("doc_id"), explode(expr(
        "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))"))
        .as("bg"))
      .select(col("doc_id"), col("bg").getField("0").as("w1"),
        col("bg").getField("1").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt") * (length(col("w1")) + length(col("w2"))))
        .cast("long").as("cover"))
    perWord.join(cover, Seq("doc_id"))
      .withColumn("mean_wlen",
        col("sumlen").cast("double") / col("nw").cast("double"))
      .withColumn("top2g_frac",
        col("cover").cast("double") / col("sumlen").cast("double"))
      .withColumn("r_words",
        col("nw") >= GopherMinWords && col("nw") <= GopherMaxWords)
      .withColumn("r_wlen",
        col("mean_wlen") >= GopherMinWlen && col("mean_wlen") <= GopherMaxWlen)
      .withColumn("r_stop", col("n_stop") >= GopherMinStop)
      .withColumn("r_2gram", col("top2g_frac") < Gopher2gCap)
      .withColumn("keep",
        col("r_words") && col("r_wlen") && col("r_stop") && col("r_2gram"))
      .select(col("doc_id"), col("nw"), col("mean_wlen"), col("n_stop"),
        col("top2g_frac"), col("r_words"), col("r_wlen"), col("r_stop"),
        col("r_2gram"), col("keep"))
  }

  /** The q203/q221 shared five-stage pipeline chain (Gopher filter →
    * exact dedup → near-dup → calibration → temperature admission), each
    * frame exposed so the funnel gate (q203) and the release capstone
    * (q221) compose the SAME stage plans — one definition, two gates. */
  private[graft] case class PipelineStages(docs: DataFrame, d1: DataFrame,
      d2: DataFrame, d3: DataFrame, d4: DataFrame, toks: DataFrame,
      tgt: DataFrame, admitted: DataFrame)

  private[graft] def pipelineStages(s: SparkSession, dir: String): PipelineStages = {
    graft.functions.GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    val d1 = docs.join(
      gopherMatrix(docs).filter(col("keep")).select(col("doc_id")), Seq("doc_id"))
    val w2 = Window.partitionBy(col("dg")).orderBy(col("doc_id"))
    val d2 = d1.withColumn("dg", md5(col("text")))
      .withColumn("rn", row_number().over(w2)).filter(col("rn") === 1)
      .drop("dg", "rn")
      .localCheckpoint() // feeds the pair join twice + the next stage
    val rejects = NearDup.exactJaccardPairs(d2)
      .select(col("id_b").as("doc_id")).distinct()
    val d3 = d2.join(rejects, Seq("doc_id"), "left_anti")
    val w4 = Window.partitionBy(col("source")).orderBy(col("quality"))
    val d4 = TextOps.qualityScore(d3)
      .join(d3.select(col("doc_id"), col("source"), col("text")), Seq("doc_id"))
      .withColumn("pct", percent_rank().over(w4))
      .filter(col("pct") >= lit(TextOps.CalibAdmit))
    val toks = d4.select(col("doc_id"), col("source"),
      wsTokenCount(col("text")).as("n_tokens"),
      call_function("graft_polyhash", col("text"), lit(31),
        lit(TextOps.HashMod)).as("ohash"))
      .localCheckpoint() // feeds targets AND admission
    val tgt = temperatureTargets(toks.groupBy(col("source"))
        .agg(sum(col("n_tokens")).cast("long").as("src_tokens")))
      .select(col("source"), col("target"))
    val w5 = Window.partitionBy(col("source")).orderBy(col("ohash"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val admitted = toks.join(broadcast(tgt), Seq("source"))
      .withColumn("start", sum(col("n_tokens")).over(w5) - col("n_tokens"))
      .filter(col("start") < col("target"))
    PipelineStages(docs, d1, d2, d3, d4, toks, tgt, admitted)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q178: Gopher quality rule MATRIX (Rae et al. 2021) — the
    //      per-rule boolean audit that complements q68's first-fail
    //      chain: every doc gets every rule's verdict (word-count bounds,
    //      mean-word-length bounds, >=2 distinct stopwords, repeated-
    //      2-gram character fraction < 0.20) plus the conjunction `keep`,
    //      so a corpus owner can see WHICH rules overlap and tune
    //      thresholds — the report behind a MassiveText-style filter
    //      sweep. Scale shape: two doc_id-keyed aggregates off one
    //      words-array projection (the per-word pass and the adjacent-
    //      bigram pass), joined on doc_id — all shuffles on the doc key,
    //      no corpus-wide window, stop list a broadcast literal. Ratios
    //      are single IEEE divisions of exact integer sums, so the flag
    //      set cannot drift cross-engine.
    "q178_gopher_rules" -> ((s, dir) =>
      gopherMatrix(t(s, dir, "documents"))
        .repartition(1).sortWithinPartitions(col("doc_id"))),

    // ---- q203: END-TO-END pretraining-corpus pipeline — the capstone
    //      composition gate: the five stages a real corpus build chains,
    //      each individually proven, composed into ONE decision the
    //      oracle replays end to end (the q166 composition discipline at
    //      pipeline scale):
    //        1. Gopher rule filter        (q178's gopherMatrix.keep)
    //        2. exact dedup               (q40's md5 election, min id)
    //        3. near-dup dedup            (q41's banded pair set; one-pass
    //                                      greedy — drop the larger id)
    //        4. per-source calibration    (q175's percent_rank admission)
    //        5. temperature mixture       (q142's sqrt targets + q65's
    //                                      running-sum admission)
    //      Output: one row per source with every stage's survivor count,
    //      final admitted tokens, and the temperature target — the shrink
    //      funnel a corpus release documents. Scale shape: every stage
    //      keeps its own proven plan (doc-keyed aggs, banded equi-joins,
    //      per-source windows, broadcast target frames); the composition
    //      adds only per-source count aggs and left joins on the
    //      source key.
    "q203_pipeline_e2e" -> ((s, dir) => {
      val st = pipelineStages(s, dir)
      def cnt(df: DataFrame, name: String): DataFrame =
        df.groupBy(col("source")).agg(count(lit(1)).as(name))
      st.docs.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
        .join(cnt(st.d1, "n_gopher"), Seq("source"), "left")
        .join(cnt(st.d2, "n_exact"), Seq("source"), "left")
        .join(cnt(st.d3, "n_neardup"), Seq("source"), "left")
        .join(cnt(st.d4, "n_cal"), Seq("source"), "left")
        .join(st.admitted.groupBy(col("source"))
          .agg(count(lit(1)).as("n_final"),
            sum(col("n_tokens")).cast("long").as("tokens_final")),
          Seq("source"), "left")
        .join(st.tgt, Seq("source"), "left")
        .na.fill(0L, Seq("n_gopher", "n_exact", "n_neardup", "n_cal",
          "n_final", "tokens_final", "target"))
        .repartition(1).sortWithinPartitions(col("source"))
    }),

    // ---- q221: the FULL RELEASE ARTIFACT capstone — q203 stops at
    //      mixture admission; a real corpus release continues on the
    //      ADMITTED set: train the tokenizer ON the released corpus and
    //      tokenize it (q112's vocab-sized merge chain), concat-and-chunk
    //      pack (q173's span arithmetic over BPE+EOS counts), shard the
    //      training permutation (q140's two-phase prefix sum via
    //      Curation.shardAssign — the SAME definition the q140/q156 gates
    //      lock), and emit the release's two manifest artifacts (q156
    //      xor-digest integrity manifest, q157 data card) — all in ONE
    //      gate, so the shard manifest provably describes exactly the
    //      filtered corpus (the oracle replays all nine stages through
    //      the SHARED q203 CTE chain; the stages cannot desynchronize).
    //      Output: long-format (section, k_num, k1, n_docs, n_tokens,
    //      extra) — card rows per (source, lang) with char sums, pack
    //      rows per source with sequence counts, shard rows with xor
    //      digests. Scale shape: every stage keeps its proven plan; the
    //      composition adds only doc_id/source-keyed joins and aggs, and
    //      the admitted corpus is localCheckpointed ONCE where it feeds
    //      four consumers.
    "q221_release_capstone" -> ((s, dir) => {
      val st = pipelineStages(s, dir)
      val d5 = st.admitted.select(col("doc_id"), col("source"))
        .join(st.d4.select(col("doc_id"), col("text")), Seq("doc_id"))
        .join(st.docs.select(col("doc_id"), col("lang"), col("n_chars")), Seq("doc_id"))
        .localCheckpoint() // feeds tokenizer training, encode, card
      // q112's train+encode, on the RELEASED corpus
      val words = d5.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      var vocab = words.groupBy(col("w")).agg(count(lit(1)).as("f"))
        .withColumn("s", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .select(col("w"), col("f"), col("s"))
        .localCheckpoint()
      (1 to BpeTrainIters).foreach { _ =>
        vocab = bpeStep(vocab)._2.localCheckpoint()
      }
      val enc = vocab.select(col("w"), size(col("s")).cast("long").as("n_sym"))
      val docToks = words.join(enc, "w")
        .groupBy(col("doc_id")).agg(sum(col("n_sym")).cast("long").as("bpe"))
      val d6 = d5.join(docToks, Seq("doc_id"))
        .localCheckpoint() // feeds pack, shard, manifest, card
      // q173's pack over BPE+EOS counts
      val wp = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val spans = d6.select(col("source"), col("doc_id"), (col("bpe") + 1L).as("n"))
        .withColumn("endc", sum(col("n")).over(wp))
        .withColumn("strt", col("endc") - col("n"))
        .select(col("source"),
          explode(expr(s"sequence(strt div $SeqLen, (endc - 1) div $SeqLen)"))
            .as("seq_id"))
      val packs = d6.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("bpe") + 1L).cast("long").as("n_tokens"))
        .join(spans.groupBy(col("source"))
          .agg(countDistinct(col("seq_id")).as("n_seqs")), Seq("source"))
      // q140's shard assignment + q156's manifest, over the released corpus
      val shards = Curation.shardAssign(
        d6.select(col("doc_id"), col("bpe").as("n_tokens")))
      val mani = shards
        .join(d6.select(col("doc_id"), TextOps.polyHash(col("text")).as("dh")),
          Seq("doc_id"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_tokens"),
          expr("bit_xor(dh)").as("digest"))
      // q157's card over the released corpus (BPE token counts)
      val card = d6.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("bpe")).cast("long").as("n_tokens"),
          sum(col("n_chars")).cast("long").as("n_chars"))
      card.select(lit("card").as("section"), lit(0L).as("k_num"),
          concat(col("source"), lit("/"), col("lang")).as("k1"),
          col("n_docs"), col("n_tokens"), col("n_chars").as("extra"))
        .unionByName(packs.select(lit("pack").as("section"), lit(0L).as("k_num"),
          col("source").as("k1"), col("n_docs"), col("n_tokens"),
          col("n_seqs").as("extra")))
        .unionByName(mani.select(lit("shard").as("section"), col("shard").as("k_num"),
          lit("").as("k1"), col("n_docs"), col("n_tokens"), col("digest").as("extra")))
        .repartition(1).sortWithinPartitions(col("section"), col("k_num"), col("k1"))
    }),

    // ---- q201: k-core peeling (Matula & Beck 1983; Batagelj-Zaversnik
    //      is the sequential classic, this is the synchronous
    //      distributed form) — iteratively remove nodes of degree < k
    //      and report the (round, nodes, edges) TRAJECTORY, the
    //      degeneracy profile a graph-curation pass reads to find the
    //      dense core (near-dup cluster nuclei, link farms). Each round
    //      is one degree agg + two semi-joins on the endpoint — never
    //      adjacency materialization beyond the live edge set, and the
    //      edge set only shrinks; rounds are a fixed constant (the
    //      trajectory is the gated object, not a fixpoint claim).
    //      Oracle = the identical rounds unrolled as CTEs.
    // ---- q229: BFS hop layers (bounded multi-round frontier expansion) —
    //      the reachability member of the graph family (q54 CC labels
    //      components, this labels DISTANCE): per-hop counts and node sums
    //      from the corpus min-id seed over q111's synthetic edge set,
    //      undirected. Scale shape: each round is ONE left-semi equi-join
    //      of the edge set against the frontier (shuffle keyed on node)
    //      plus an anti-join against the visited set — cost ∝ frontier
    //      degree sum, never nodes²; visited/frontier localCheckpoint per
    //      round keeps the plan depth constant (q201's peel discipline).
    //      First discovery = min distance, so no per-node min fold is
    //      needed. The oracle walks the same graph with a recursive CTE
    //      and takes min(dist) per node — an independent decision
    //      procedure for every layer's membership.
    "q229_bfs_layers" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
      val e0 = d.select(col("doc_id").as("src"), (col("doc_id") % 97).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"), expr("doc_id div 2").as("dst")))
        .distinct()
        .filter(col("src") =!= col("dst"))
      val und = e0.select(col("src").as("v"), col("dst").as("u"))
        .unionByName(e0.select(col("dst").as("v"), col("src").as("u")))
        .distinct().localCheckpoint()
      val seed = d.agg(min(col("doc_id")).as("node"))
      var visited = seed.select(col("node"), lit(0L).as("dist")).localCheckpoint()
      var frontier = visited.select(col("node"))
      for (h <- 1 to BfsHops) {
        val next = bfsRound(und, frontier, visited, h).localCheckpoint()
        visited = visited.unionByName(next).localCheckpoint()
        frontier = next.select(col("node"))
      }
      visited.groupBy(col("dist"))
        .agg(count(lit(1)).as("n"), sum(col("node")).as("sum_node"))
        .repartition(1).sortWithinPartitions(col("dist"))
    }),

    "q201_kcore_peel" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
      var edges = d.select(col("doc_id").as("x"), (col("doc_id") % 97).as("y"))
        .unionByName(d.select(col("doc_id").as("x"), expr("doc_id div 2").as("y")))
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint()
      def stats(round: Int, e: DataFrame): DataFrame =
        e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
          .distinct().agg(count(lit(1)).as("n_nodes"))
          .crossJoin(e.agg(count(lit(1)).as("n_edges")))
          .select(lit(round.toLong).as("round"), col("n_nodes"), col("n_edges"))
      var out = stats(0, edges)
      for (r <- 1 to PeelRounds) {
        val keep = edges.select(col("a").as("v"))
          .unionByName(edges.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= CoreK).select(col("v"))
        edges = edges
          .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint()
        out = out.unionByName(stats(r, edges))
      }
      out.repartition(1).sortWithinPartitions(col("round"))
    }),

    // ---- q184: label propagation step (Raghavan et al. 2007) — the
    //      community-detection member of the graph family (q54 CC min-
    //      label, q111 PageRank, q151 triangles): one SYNCHRONOUS update
    //      where every node adopts the MODE of its neighbors' labels
    //      (ties to the smallest label — the deterministic variant).
    //      Seed labels are id mod LabelPropMod so the vote actually
    //      aggregates (all-distinct seeds would degenerate to q54's min
    //      rule). Graph = q111's synthetic edge set, undirected, self-
    //      loops dropped. Scale shape: edge synthesis + both-direction
    //      union are linear; the vote is a (node, label)-keyed
    //      partial+final agg; the argmax is a per-NODE rank window —
    //      cost tracks edges, never nodes x labels.
    "q184_label_prop" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
      val e0 = d.select(col("doc_id").as("src"), (col("doc_id") % 97).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"), expr("doc_id div 2").as("dst")))
        .distinct()
        .filter(col("src") =!= col("dst"))
      val und = e0.select(col("src").as("v"), col("dst").as("u"))
        .unionByName(e0.select(col("dst").as("v"), col("src").as("u")))
        .distinct()
      val votes = und.select(col("v"), (col("u") % LabelPropMod).as("nl"))
        .groupBy(col("v"), col("nl")).agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy(col("v")).orderBy(col("votes").desc, col("nl"))
      votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("v").as("node"), (col("v") % LabelPropMod).as("old_label"),
          col("nl").as("new_label"), col("votes"))
        .repartition(1).sortWithinPartitions(col("node"))
    }),

    // ---- q186: n-gram diversity report (the distinct-1/distinct-2
    //      metric of Li et al. NAACL 2016) — per source, the ratio of
    //      DISTINCT word n-grams to total n-grams for n = 1..3: the
    //      template-detection / mode-collapse surface a corpus owner
    //      reads next to q58's per-doc repetition (this is the corpus-
    //      level complement: a source of boilerplate shows a cratered
    //      distinct-2 ratio even when each doc looks fine). Scale shape:
    //      ONE corpus pass builds all three gram orders via per-doc lead
    //      windows (partitioned by doc — never global), then a (source,
    //      n)-keyed agg; the distinct count is Spark's expand-based
    //      multi-distinct, partial+final. Ratios are single IEEE
    //      divisions of exact counts.
    "q186_ngram_diversity" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), TextOps.words(col("text")).as("ws"))
        .selectExpr("doc_id", "source", "posexplode(ws) AS (pos, wd)")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      tok
        .withColumn("w2", lead(col("wd"), 1).over(w))
        .withColumn("w3", lead(col("wd"), 2).over(w))
        .select(col("source"), expr(
          "stack(3, CAST(1 AS BIGINT), wd, " +
            "CAST(2 AS BIGINT), concat(wd, ' ', w2), " +
            "CAST(3 AS BIGINT), concat(wd, ' ', w2, ' ', w3)) AS (n, gram)"))
        .filter(col("gram").isNotNull)
        .groupBy(col("source"), col("n"))
        .agg(count(lit(1)).as("total"), countDistinct(col("gram")).as("n_distinct"))
        .withColumn("ratio",
          col("n_distinct").cast("double") / col("total").cast("double"))
        .repartition(1).sortWithinPartitions(col("source"), col("n"))
    }),

    // ---- q185: fine-grained decontamination (span masking) — q57 flags
    //      WHOLE docs sharing any benchmark n-gram; the surgical form a
    //      modern pipeline actually ships (mask only the contaminated
    //      spans, keep the rest of the doc) needs the matched-span
    //      algebra: positional 40-gram hashes (q150's SubRemK rationale —
    //      the corpus's small vocabulary makes short grams collide
    //      corpus-wide by chance) of PROBE docs joined against the
    //      benchmark docs' hash set (q57's %50 split), seed intervals
    //      merged per doc by the q150 gaps-and-islands discipline, then a
    //      per-doc mask report. Scale shape: the kernel runs ONCE over
    //      the corpus (checkpointed compact arrays); the benchmark hash
    //      set is eval-suite-sized and broadcasts; islands merge in
    //      per-DOC windows only; the report is a doc-keyed agg + one
    //      left join — linear end to end, never doc x doc.
    "q185_decontam_spans" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val occ = docs.repartition(col("doc_id")) // spread CPU-heavy narrow work
        .select(col("doc_id"), posexplode(call_function("graft_gram_hashes",
          col("text"), lit(SubRemK), lit(31), lit(TextOps.HashMod))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
        .localCheckpoint() // kernel once; feeds the bench set AND the probe side
      val bench = occ.filter(col("doc_id") % 50 === 0).select(col("h")).distinct()
      val seeds = occ.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), Seq("h"))
        .select(col("doc_id"), col("p").as("s"), (col("p") + (SubRemK - 1)).as("e"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      val prevMax = max(col("e")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1))
      val spans = seeds
        .withColumn("newisl", when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
        .withColumn("isl", sum(col("newisl")).over(wDoc))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("ie") - col("is") + 1).cast("long").as("chars_masked"))
      docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), length(col("text")).cast("long").as("chars_total"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("chars_total"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("chars_masked"), lit(0L)).as("chars_masked"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q183: length-bucketed dynamic batching — the padding-waste
    //      report for fairseq/HF-style `group_by_length` training
    //      batches: docs bucket by token-count range (LenBucketWidth),
    //      batches of BatchDocs docs form within each bucket in
    //      (len desc, doc_id) order, and each batch reports its padded
    //      size (max_len x n_docs), real token count, and the waste the
    //      bucketing exists to bound. Scale shape: ONE exchange on the
    //      length bucket; the rank window partitions BY BUCKET (never a
    //      corpus-global row_number — the q56/q173 discipline), then a
    //      (bucket, batch)-keyed partial+final agg. Waste fractions are
    //      single IEEE divisions of exact integer products.
    "q183_length_batching" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), size(TextOps.words(col("text"))).cast("long").as("nw"))
        .withColumn("bucket", expr(s"nw div $LenBucketWidth"))
      val w = Window.partitionBy(col("bucket")).orderBy(col("nw").desc, col("doc_id"))
      d.withColumn("rn", row_number().over(w))
        .withColumn("batch", expr(s"cast((rn - 1) div $BatchDocs AS BIGINT)"))
        .groupBy(col("bucket"), col("batch"))
        .agg(count(lit(1)).as("n_docs"), max(col("nw")).as("max_len"),
          sum(col("nw")).cast("long").as("sum_len"))
        .withColumn("waste", col("max_len") * col("n_docs") - col("sum_len"))
        .withColumn("pad_frac", col("waste").cast("double") /
          (col("max_len") * col("n_docs")).cast("double"))
        .repartition(1).sortWithinPartitions(col("bucket"), col("batch"))
    }),

    // ---- q179: DSIR importance resampling (Xie et al. NeurIPS 2023) —
    //      select raw docs whose unigram distribution looks most like a
    //      target domain: per-word importance ratio r(w) =
    //      p_target(w)/p_raw(w) under Laplace smoothing, per-doc weight =
    //      the product of r over the doc's words, keep the top-K. The
    //      per-word ratio is computed as exact BIGINT cross-products with
    //      ONE double division ((ct+1)(Nr+V)) / ((cr+1)(Nt+V)), and the
    //      per-doc product is the index-ordered fold that is bit-identical
    //      cross-engine (the q164 lattice-score discipline) — no libm log,
    //      no order-dependent sum. Scale shape: both count frames are
    //      vocabulary-sized and broadcast back onto ONE corpus pass; the
    //      per-doc weight is a doc_id-keyed aggregate; top-K is
    //      TakeOrderedAndProject (each partition keeps K — never a global
    //      sort). The paper's production form hashes n-grams into a fixed
    //      feature space — same shape, the vocab frame becomes the hash
    //      bucket frame.
    "q179_dsir" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), TextOps.words(col("text")).as("ws"))
      val w = d.selectExpr("doc_id", "source", "posexplode(ws) AS (pos, wd)")
      val raw = w.groupBy(col("wd")).agg(count(lit(1)).as("cr"))
      val tgt = w.filter(col("source") === DsirTarget)
        .groupBy(col("wd")).agg(count(lit(1)).as("ct"))
      val tot = raw.agg(sum(col("cr")).as("nr"), count(lit(1)).as("v"))
        .crossJoin(tgt.agg(sum(col("ct")).as("nt")))
      val ratio = raw.join(tgt, Seq("wd"), "left")
        .na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(tot))
        .select(col("wd"),
          (((col("ct") + 1L) * (col("nr") + col("v"))).cast("double") /
            ((col("cr") + 1L) * (col("nt") + col("v"))).cast("double")).as("r"))
      w.join(broadcast(ratio), Seq("wd"))
        .groupBy(col("doc_id"))
        .agg(max(col("source")).as("source"), count(lit(1)).as("nw"),
          expr("aggregate(array_sort(collect_list(struct(pos, r))), " +
            "cast(1.0 AS double), (acc, x) -> acc * x.r)").as("weight"))
        .orderBy(col("weight").desc, col("doc_id")).limit(DsirK)
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q54: near-dup pairs (the q41 exact join) -> connected components
    //      -> (doc, canonical=min id in component, cluster size).
    "q54_dedup_clusters" -> ((s, dir) =>
      dedupClusters(s, dir).repartition(1).sortWithinPartitions(col("doc_id"))),

    // ---- q91: quality-based survivor selection — the retention policy a
    //      real dedup pipeline runs on top of q54's clusters: within each
    //      near-dup cluster keep the HIGHEST-quality member (q49's exact
    //      score; ties to the lowest doc_id), not the arbitrary minimum
    //      id. Cluster labels and quality are both already-gated operators
    //      (q54, q49) shared by construction; the composition is one
    //      doc_id equi-join + a per-cluster window over the near-dup
    //      FRACTION — never corpus-wide. Quality doubles are bit-identical
    //      cross-engine, so the survivor ranking is too.
    "q91_dedup_survivors" -> ((s, dir) => {
      val clusters = dedupClusters(s, dir)
      val quality = TextOps.qualityScore(t(s, dir, "documents"))
      val w = Window.partitionBy(col("canonical_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      clusters.join(quality, "doc_id")
        .withColumn("is_survivor",
          when(row_number().over(w) === 1, 1L).otherwise(0L))
        .select(col("doc_id"), col("canonical_id"), col("quality"), col("is_survivor"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q55: reproducible stratified sampling — per-language keep rates
    //      gated on a portable polynomial content hash (no RNG, no state;
    //      the same doc always lands on the same side of the gate). Pure
    //      narrow projection + filter: embarrassingly parallel at any scale.
    "q55_stratified_sample" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val rate = when(col("lang") === "en", 50L).when(col("lang") === "de", 30L)
        .when(col("lang") === "es", 20L).when(col("lang") === "zh", 10L).otherwise(25L)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (call_function("graft_polyhash", col("text"), lit(31), lit(TextOps.HashMod)) % 100)
            .as("bucket"),
          rate.as("rate"))
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q56: sequence packing — per-language running token count assigns
    //      each doc a 4096-token context-window bin and its offset in it.
    //      One window per language partition; integer arithmetic end-to-end.
    //      (At scale the partition key is (lang, day)-grained so no single
    //      window partition holds a whole language.)
    "q56_token_pack" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), wsTokenCount(col("text")).as("n_tokens"))
        .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr(s"start DIV $PackBudget").as("bin"),
          (col("start") % PackBudget).as("bin_offset"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q57: benchmark contamination — docs sharing any char-13-gram
    //      with the benchmark set (doc_id % 50 = 0 stands in for it).
    //      Shingle hashes are per-doc distinct (graft_shingle_hashes), the
    //      benchmark side is dictionary-sized by nature -> broadcast
    //      equi-join on the hash; counts equal the string-set counts up to
    //      a ~2^-47 per-pair xxh64 collision (same argument as q41).
    "q57_contamination" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // kernel ONCE: materialize the per-doc shingle arrays before the
      // explode — the bench side and the probe side are two independent
      // consumers and would otherwise each re-run the CPU-heavy kernel
      // over the full corpus (checkpointing the compact arrays, not the
      // exploded rows, keeps the materialization small)
      val hashed = t(s, dir, "documents")
        .repartition(col("doc_id")) // spread CPU-heavy narrow work
        .select(col("doc_id"),
          call_function("graft_shingle_hashes", col("text"), lit(13)).as("shh"))
        .localCheckpoint()
      val sh = hashed.select(col("doc_id"), explode(col("shh")).as("h"))
      val bench = sh.filter(col("doc_id") % 50 === 0).select(col("h")).distinct()
      sh.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q58: repetition signals — duplicate-word fraction and top-bigram
    //      fraction per doc, via the one-pass `graft_rep_stats` kernel
    //      ([n, n_distinct, top_bigram] in a single codegen'd scan; the
    //      interpreted HOF formulation it replaces — kept as
    //      [[repetitionHof]] for the CorpusSpec cross-check — scanned
    //      distinct-x-all twice per doc). The final divisions are exact
    //      single IEEE ops so the oracle matches bit-for-bit.
    "q58_repetition" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents")
        .repartition(col("doc_id")) // spread CPU-heavy narrow work
        .select(col("doc_id"), call_function("graft_rep_stats", col("text")).as("rs"))
        .select(col("doc_id"),
          element_at(col("rs"), 1).as("n"),
          (lit(1.0) - element_at(col("rs"), 2).cast("double")
            / element_at(col("rs"), 1).cast("double")).as("dup_word_frac"),
          when(element_at(col("rs"), 1) < 2, lit(0.0)).otherwise(
            element_at(col("rs"), 3).cast("double")
              / (element_at(col("rs"), 1) - 1).cast("double")).as("top_bigram_frac"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q59: TF-IDF top-3 terms per doc. Ratio idf (tf * N/df) instead
    //      of log-idf: rank-equivalent per doc and exactly reproducible
    //      across engines (one multiply + one divide, both correctly
    //      rounded IEEE ops — a libm log may differ in the last ulp).
    //      Plan: two hash aggregations + an equi-join on term (the natural
    //      shuffle key) + a per-doc window.
    "q59_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tf").desc, col("term").asc)
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * (col("n").cast("double") / col("df").cast("double")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
        .repartition(1).sortWithinPartitions(col("doc_id"), col("rank"))
    }),

    // ---- q65: domain-mixture sampling — admit docs per source in
    //      deterministic content-hash order while the exclusive running
    //      token count is under the source's budget (the doc that crosses
    //      the boundary is kept: its start is still inside). No RNG — the
    //      polyhash order IS the reproducible shuffle. One window per
    //      source partition, integer arithmetic end-to-end; at scale the
    //      partition key is (source, shard) with the budget split
    //      proportionally across shards, so no single window partition
    //      holds a whole domain (same note as q56).
    "q65_mixture_sample" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val w = Window.partitionBy(col("source")).orderBy(col("ohash"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), wsTokenCount(col("text")).as("n_tokens"),
          call_function("graft_polyhash", col("text"), lit(31), lit(TextOps.HashMod)).as("ohash"),
          mixBudget.as("budget"))
        .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .filter(col("start") < col("budget"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("start"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q67: incremental admission — the daily update of a living
    //      corpus. The "new crawl batch" (doc_id % 10 = 7 stands in for
    //      it) is near-dup-gated against the EXISTING corpus and
    //      first-wins-deduped within itself: a new doc is rejected when
    //      the q41 exact banded pair set (proven lossless) links it to any
    //      existing doc or to an earlier new doc, regardless of that
    //      doc's own fate (the standard static one-pass rule — a chained
    //      greedy admission would need q54's component view). Admission is
    //      one left-anti join; the candidate work is exactly q41's
    //      equi-join plans, never new-batch x corpus all-pairs.
    "q67_incremental_admit" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val pairs = NearDup.exactJaccardPairs(docs) // id_a < id_b, J >= 0.8
      def isNew(c: Column): Column = c % 10 === 7
      // each pair rejects at most ONE doc (id_b if new — a corpus doc or an
      // earlier new doc beat it; else id_a if new and id_b is corpus), so
      // the rejected set is a single projection over the expensive pair
      // plan, not a two-legged union scanning it twice
      val rejected = pairs
        .select(when(isNew(col("id_b")), col("id_b"))
          .when(isNew(col("id_a")), col("id_a")).as("doc_id"))
        .filter(col("doc_id").isNotNull)
        .distinct()
      docs.filter(isNew(col("doc_id")))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .join(rejected, Seq("doc_id"), "left_anti")
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q68: quality-filter audit — each doc is labeled by the FIRST
    //      failing rule of a priority chain (the C4/Gopher filtering
    //      idiom), then one tiny aggregate reports docs and tokens per
    //      bucket. Ratio thresholds are integer cross-multiplications
    //      (alpha/n < 0.81 becomes alpha*100 < n*81; dup-frac > 0.5
    //      becomes (nw-nd)*2 > nw) — exact in any engine, and the whole
    //      audit is one narrow kernel-bearing projection + a 4-row agg:
    //      linear, shuffle = 4 rows.
    "q68_quality_audit" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val labeled = t(s, dir, "documents")
        .repartition(col("doc_id")) // spread CPU-heavy narrow work
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n"),
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long").as("alpha"),
          call_function("graft_rep_stats", col("text")).as("rs"))
        .select(col("doc_id"), col("n"), col("alpha"),
          element_at(col("rs"), 1).as("nw"),
          element_at(col("rs"), 2).as("nd"))
        .withColumn("rule",
          when(col("n") < 150, "too_short")
            .when(col("alpha") * 100 < col("n") * 81, "low_alpha")
            .when((col("nw") - col("nd")) * 2 > col("nw"), "repetitive")
            .otherwise("pass"))
      labeled.groupBy(col("rule"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_tokens"))
        .repartition(1).sortWithinPartitions(col("rule"))
    }),

    // ---- q69: vocabulary build — top-K terms by corpus frequency with
    //      cumulative coverage (the tokenizer-training seed vocabulary).
    //      The full term-count aggregate is partial+final on the term key;
    //      top-K is TakeOrderedAndProject (each partition keeps K, never a
    //      global sort); only the K survivors enter the cumsum window,
    //      which is partitioned by a constant — bounded at K rows by
    //      construction, so no unbounded single-task window exists at any
    //      corpus size. Coverage is one exact division after integer sums.
    "q69_vocab_coverage" -> ((s, dir) => {
      // materialized once: the (term, cnt) frame is vocabulary-sized (tiny
      // relative to the corpus) but its lineage holds the full-corpus
      // explode + aggregation, and BOTH the total and the top-K consume it
      // — same discipline as NearDup's checkpointed shingle frames rather
      // than a bet on ReuseExchange
      val tf = t(s, dir, "documents")
        .select(explode(TextOps.words(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val total = tf.agg(sum(col("cnt")).as("total"))
      val top = tf.orderBy(col("cnt").desc, col("term")).limit(VocabK)
      // partition the K-row cumsum window by `total` — single-valued, so
      // still one group, but NOT constant-foldable (a lit() partition key
      // folds away and leaves the unpartitioned-window shape)
      val w = Window.partitionBy(col("total")).orderBy(col("cnt").desc, col("term"))
      val cw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("cnt")).over(cw))
        .withColumn("coverage", col("cum").cast("double") / col("total").cast("double"))
        .select(col("rank"), col("term"), col("cnt"), col("cum"), col("coverage"))
        .repartition(1).sortWithinPartitions(col("rank"))
    }),

    // ---- q70: substring-level duplication report — for every doc, how
    //      many of its distinct char-13-grams occur in at least one OTHER
    //      doc (the Lee-et-al-style "duplicated span" signal at shingle
    //      granularity; q41/q54 are doc-level, q57 gates against a small
    //      benchmark set — this is the corpus-vs-itself form). Plan: the
    //      kernel's distinct per-doc hashes explode once; document
    //      frequency is a partial+final hash aggregate on the hash key
    //      (map-side combine absorbs hot shingles), then ONE equi-join
    //      back on the hash — never doc x doc. The df side is
    //      corpus-vocabulary-sized so it is NOT broadcast; a hot shingle
    //      has many left rows but exactly one right row, the shape AQE's
    //      skew-join split handles. dup_frac is a single exact IEEE
    //      division.
    "q70_substring_dedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // kernel ONCE (same discipline as q57): both the df aggregate and
      // the join probe consume the exploded rows; checkpoint the compact
      // per-doc arrays, not the exploded rows
      val hashed = t(s, dir, "documents")
        .repartition(col("doc_id")) // spread CPU-heavy narrow work
        .select(col("doc_id"),
          call_function("graft_shingle_hashes", col("text"), lit(13)).as("shh"))
        .localCheckpoint()
      val sh = hashed.select(col("doc_id"), explode(col("shh")).as("h"))
      // (doc_id, h) pairs are distinct by kernel construction, so count(*)
      // per h IS the number of docs containing the shingle
      val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      sh.join(dfreq, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_frac",
          col("n_dup").cast("double") / col("n_shingles").cast("double"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q82: near-dup cluster-size histogram — how many clusters of
    //      each size the corpus holds (the shrinkage report a dedup run
    //      ships with: sum over sizes>1 of (size-1) is exactly the rows
    //      dedup removes). Pure composition: q54's component labels, then
    //      one two-level aggregate; count(DISTINCT canonical) per size is
    //      the standard two-shuffle distinct-agg, never a driver pass.
    "q82_cluster_histogram" -> ((s, dir) => {
      dedupClusters(s, dir) // NOT the q54 query: that tail repartition(1)
        // is the driver-compare presentation step, and aggregating behind
        // it would funnel the whole labeled corpus through one task
        .groupBy(col("cluster_size"))
        .agg(countDistinct(col("canonical_id")).as("n_clusters"))
        .repartition(1).sortWithinPartitions(col("cluster_size"))
    }),

    // ---- q81: decile histogram of document length per language. The
    //      naive form — ntile(10) over a per-language window — sorts a
    //      whole language through ONE task at scale; instead the nine
    //      decile BOUNDARIES come from the distributed sort-based
    //      exactQuantiles (q34's engine, no per-group buffer), broadcast
    //      back, and bucket assignment is a narrow branchless comparison
    //      sum. DuckDB mirrors with quantile_cont (bit-identical R-7
    //      interpolation, proven by q34) and the same CASE chain, so
    //      boundary ties bucket identically.
    "q81_decile_histogram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val specs = (1 to 9).map(i => s"d$i" -> i / 10.0)
      val bounds = graft.operators.Advanced.exactQuantiles(
        docs, "lang", "n_chars", specs)
      val decile = specs.map { case (name, _) =>
        when(col("n_chars").cast("double") > col(name), 1).otherwise(0)
      }.foldLeft(lit(1))(_ + _)
      docs.join(broadcast(bounds), "lang")
        .withColumn("decile", decile.cast("long"))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
        .repartition(1).sortWithinPartitions(col("lang"), col("decile"))
    }),

    // ---- q73: context-window chunking — each doc's word tokens sliced
    //      into ChunkSize-token windows advancing by ChunkStride (8-token
    //      overlap at the gate's 32/24 geometry), the slicing step every
    //      RAG/pre-training ingest runs after cleaning.
    //      Pure narrow work: tokenize, compute the chunk count with integer
    //      arithmetic, explode a per-doc index sequence, slice — no shuffle
    //      anywhere (the trailing repartition(1) is the driver-compare
    //      convention, not part of the operator). Chunk identity is the
    //      portable polyhash of the joined chunk text so the gate fails if
    //      slicing is off by one token anywhere.
    "q73_chunk_overlap" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      chunkOverlap(t(s, dir, "documents"))
        .select(col("doc_id"), col("ci"),
          size(col("chunk")).cast("long").as("chunk_tokens"),
          TextOps.polyHash(array_join(col("chunk"), " ")).as("chash"))
        .repartition(1).sortWithinPartitions(col("doc_id"), col("ci"))
    }),

    // ---- q164: unigram-LM tokenizer step (SentencePiece, Kudo 2018 —
    //      public) — the subword-tokenizer family's OTHER training
    //      algorithm beside BPE (q95/q99/q112): one hard-EM iteration
    //      over a seed vocabulary. Seed = every substring of length <=
    //      MaxPieceLen of the (length-capped) corpus words, counted with
    //      word-frequency x in-word multiplicity; seed probabilities
    //      c/total in LINEAR double space (one exact IEEE division each —
    //      the q113/q117 discipline, no log/exp whose libm rounding
    //      diverges across engines). E-step: Viterbi over each word's
    //      full segmentation lattice, enumerated EXPLICITLY as the
    //      2^(n-1) boundary masks (the length cap bounds the lattice, so
    //      a word costs <= 2^(MaxWordLen-1) rows REGARDLESS of corpus
    //      size); a segmentation's score is the piece-probability product
    //      folded in piece order — the same left-to-right IEEE multiply
    //      chain in both engines, so scores are bit-identical and the
    //      argmax (ties broken by fewer pieces, then the lexicographic
    //      segmentation string) agrees. M-step: piece counts over the
    //      winning segmentations (exact BIGINTs), re-normalized to the
    //      updated probabilities (again one division). Scale shape: ONE
    //      corpus pass (the word-frequency groupBy); everything after is
    //      VOCABULARY-sized — the lattice explode, the broadcast
    //      probability join, and the per-word argmax window all run over
    //      distinct words, so the E-step cost is corpus-size-independent.
    "q164_unigram_lm" -> ((s, dir) => unigramStep(t(s, dir, "documents"))),

    // ---- q173: concat-and-chunk SEQUENCE packing — the GPT-style
    //      pretraining layout q56's budget packing stops short of: all of
    //      a source's documents are concatenated in doc_id order (one EOS
    //      token after each doc) and the token stream is cut into fixed
    //      SeqLen blocks; a document can SPAN blocks and a block can hold
    //      many documents. Per block: how many documents intersect it,
    //      its token fill (SeqLen everywhere except each source's last
    //      block), and the first document — the provenance a data loader
    //      needs. Scale shape: the global offset is a per-SOURCE running
    //      sum (one exchange on source, the shard a packer actually works
    //      in — never a corpus-global single-partition window); the
    //      block-span explode is ceil(n/SeqLen) rows per doc; the final
    //      agg is partial+final on (source, block).
    "q173_sequence_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (wsTokenCount(col("text")) + lit(1L)).as("n")) // +1 = the EOS
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val spans = docs.withColumn("endc", sum(col("n")).over(w))
        .withColumn("strt", col("endc") - col("n"))
        .select(col("source"), col("doc_id"), col("strt"),
          (col("endc") - 1).as("e"),
          explode(expr(s"sequence(strt div $SeqLen, (endc - 1) div $SeqLen)"))
            .as("seq_id"))
      spans.groupBy(col("source"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("e"), (col("seq_id") + 1) * SeqLen - 1) -
            greatest(col("strt"), col("seq_id") * SeqLen) + 1).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .repartition(1).sortWithinPartitions(col("source"), col("seq_id"))
    }),

    // ---- q168: tokenize the corpus with the TRAINED unigram LM — the
    //      q112 complement (BPE learns merges, q112 applies them; q164
    //      learns piece probabilities, this applies the Viterbi
    //      segmentation). Same 100 TB shape as q112: each DISTINCT word
    //      is segmented ONCE (unigramSegment is vocabulary-sized), then
    //      one equi-join brings per-word token counts back to the
    //      exploded corpus. Words beyond the lattice length cap fall back
    //      to character tokens — a DETERMINISTIC rule both engines apply
    //      (the left join's null side), never a silent drop. Gate: per-doc
    //      word and unigram-token counts, oracle replaying the identical
    //      lattice + fallback.
    // TOKENIZER EVALUATION (q242): the metrics a tokenizer ships with —
    // per-language fertility (tokens/word), compression (chars/token) and
    // whole-word rate over the TRAINED unigram-LM segmentation (q164's
    // vocab, q168's encode — shared lattice, so the eval cannot drift from
    // the tokenizer it scores). Exact BIGINT sums with single final IEEE
    // divisions. 100 TB: one corpus pass for words, segmentation joined on
    // the (vocab-sized) distinct-word frame — q168's exact shape plus a
    // languages-sized aggregate.
    "q242_tokenizer_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = docs.select(col("lang"), explode(TextOps.words(col("text"))).as("w"))
      val seg = unigramSegment(docs)
        .select(col("w"), size(split(col("seg"), "\\|")).cast("long").as("n_pieces"))
      words.join(seg, Seq("w"), "left")
        .withColumn("n_tok", coalesce(col("n_pieces"), length(col("w")).cast("long")))
        .withColumn("wlen", length(col("w")).cast("long"))
        .withColumn("whole", when(col("n_pieces") === 1L, 1L).otherwise(0L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(col("n_tok")).cast("long").as("n_tokens"),
          sum(col("wlen")).cast("long").as("n_chars"),
          sum(col("whole")).cast("long").as("n_whole"))
        .withColumn("fertility",
          col("n_tokens").cast("double") / col("n_words").cast("double"))
        .withColumn("chars_per_token",
          col("n_chars").cast("double") / col("n_tokens").cast("double"))
        .withColumn("whole_word_rate",
          col("n_whole").cast("double") / col("n_words").cast("double"))
        .orderBy(col("lang"))
    }),

    "q168_unigram_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      val seg = unigramSegment(docs)
        .select(col("w"), size(split(col("seg"), "\\|")).cast("long").as("n_pieces"))
      words.join(seg, Seq("w"), "left")
        .withColumn("n_tok", coalesce(col("n_pieces"), length(col("w")).cast("long")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(col("n_tok")).cast("long").as("uni_tokens"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q95: ONE byte-pair-merge iteration (Sennrich et al. 2016,
    //      arXiv:1508.07909) — the tokenizer-training primitive the vocab
    //      surface (q69 top-K, q80 PMI) stops short of. The corpus pass is
    //      a single partial+final word-frequency aggregate; everything
    //      after runs on the VOCABULARY (tiny relative to the corpus):
    //      count adjacent symbol pairs weighted by word frequency, pick
    //      the argmax pair (deterministic tie-break), apply the merge to
    //      every word's symbol segmentation, and emit the NEXT iteration's
    //      pair counts — so the gate fails if the count weighting, the
    //      argmax, or the greedy merge application is off anywhere.
    //      The merge applies as a literal left-to-right non-overlapping
    //      replace of "a b"→"ab" over the space-joined segmentation —
    //      exactly BPE's greedy order ("aaa" under merge (a,a) → [aa, a]).
    "q95_bpe_merge_step" -> ((s, dir) => {
      // vocabulary-sized but carries the full-corpus explode in its
      // lineage; pass-1 pairs AND the merge both consume it (q69's
      // materialize-once discipline)
      val vocab = t(s, dir, "documents")
        .select(explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
        .filter(length(col("w")) >= 2) // single-symbol words have no pairs
        .localCheckpoint()
      val p1 = vocab
        .select(col("f"), explode(expr(
          "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
      val best = p1.orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(col("pair").as("bp"))
      vocab.crossJoin(broadcast(best))
        .withColumn("s", split(expr(
          "replace(trim(regexp_replace(w, '(.)', '$1 ')), " +
            "concat(substring(bp, 1, 1), ' ', substring(bp, 2, 1)), bp)"), " "))
        .filter(size(col("s")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(s)-1), " +
            "i -> concat(element_at(s, i), element_at(s, i+1)))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("f")).cast("long").as("cnt"))
        .repartition(1).sortWithinPartitions(col("cnt").desc, col("pair"))
    }),

    // ---- q96: host canonicalization + per-host token budgets — crawl
    //      curation's first step. The corpus has no URL column, so both
    //      engines synthesize the IDENTICAL deterministic messy URL
    //      (mixed-case scheme/host, optional www, default :443 port,
    //      query string) from doc_id/source; the OPERATOR under test is
    //      the canonicalization (authority extract → lowercase → strip
    //      default port → strip www) and the q65-style budget admission
    //      over the canonical host. Plan: narrow string ops, ONE shuffle
    //      on host for the cumulative-token window, and the final
    //      per-host aggregate reuses that partitioning (no second
    //      exchange).
    "q96_host_budget" -> ((s, dir) => {
      val url = concat(lit("HTTPS://"),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit("-"), (col("doc_id") % 7).cast("string"),
        lit(".Example.COM"),
        when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), col("doc_id").cast("string"),
        when(col("doc_id") % 5 === 0, lit("?ref=feed")).otherwise(lit("")))
      val host = regexp_replace(
        regexp_replace(
          lower(substring_index(substring_index(url, "://", -1), "/", 1)),
          ":(443|80)$", ""),
        "^www\\.", "")
      val w = Window.partitionBy(col("host")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), host.as("host"), wsTokenCount(col("text")).as("n_tokens"))
        .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("admit", col("start") < HostBudget)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tok_total"),
          sum(when(col("admit"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("admit"), col("n_tokens")).otherwise(0L)).as("tok_admitted"))
        .repartition(1).sortWithinPartitions(col("host"))
    }),

    // ---- q98: line-level boilerplate removal (RefinedWeb / C4) — the
    //      corpus has no newlines, so both engines synthesize the
    //      IDENTICAL line structure (q96's shared-synthesis discipline):
    //      a per-source header + footer line around LineWords-word content
    //      lines. The OPERATOR does not know which lines were injected: it
    //      finds boilerplate purely by document frequency (a source's
    //      header recurs in every one of its docs, so df >> BoilerDf,
    //      while 8-word content lines over this vocabulary are essentially
    //      unique — and any that DO recur across >= BoilerDf docs are
    //      legitimately boilerplate in both engines). The gate hashes the
    //      cleaned reassembled text per doc, so a wrong df, a dropped
    //      content line, or a misordered reassembly all break it.
    "q98_line_dedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val lw = LineWords
      val contentLines = when(size(col("ws")) === 0,
          expr("cast(array() as array<string>)"))
        .otherwise(expr(
          s"transform(sequence(1, cast((size(ws)+${lw - 1}) div $lw as int)), " +
            s"i -> array_join(slice(ws, cast((i-1)*$lw+1 as int), $lw), ' '))"))
      val lines = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), TextOps.words(col("text")).as("ws"))
        .select(col("doc_id"),
          posexplode(concat(
            array(concat(lit("hdr "), col("source"), lit(" subscribe now"))),
            contentLines,
            array(concat(lit("foot "), col("source"), lit(" all rights reserved"))))))
        .select(col("doc_id"), col("pos").cast("long").as("li"), col("col").as("line"))
      removeBoilerplateLines(lines)
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q109: INCREMENTAL connected components — the daily re-cluster
    //      of a living corpus (q67 admits the new docs; this folds their
    //      edges in). The existing clustering compresses to its STAR
    //      graph — one (id, label) edge per clustered node, |V| edges no
    //      matter how many pairs built it — and CC runs over star ∪ new
    //      edges: pair DISCOVERY touches only the delta (q67's banded
    //      join), the fold's edge count is |V_clustered| + |new| instead
    //      of the accumulated |E|, and the star side has diameter 2 so
    //      contraction converges in O(1) extra rounds. The gate is the
    //      compression theorem itself: the oracle computes CC(P ∪ N)
    //      from scratch; the incremental CC(star(CC(P)) ∪ N) must hash
    //      identical — any connectivity lost or invented by the
    //      compression breaks it.
    "q109_incremental_cc" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val oldPairs = NearDup.exactJaccardPairs(t(s, dir, "documents"))
      val labels = connectedComponents(oldPairs) // the EXISTING clustering
      val d = t(s, dir, "documents").select(col("doc_id"))
      // mirrors q109NewEdgesSql exactly
      val newEdges = d.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000L).as("id_b"))
        .unionByName(d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 37L).as("id_b")))
      val starEdges = labels.filter(col("id") =!= col("label"))
        .select(col("id").as("id_a"), col("label").as("id_b"))
      connectedComponents(starEdges.unionByName(newEdges))
        .select(col("id").as("doc_id"), col("label").as("canonical_id"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q111: PageRank step over a synthetic link graph — hub links
    //      (doc_id % 97: 97 hubs absorbing everything, heavy in-skew)
    //      plus tree links (doc_id div 2: a binary ancestry chain), the
    //      deterministic stand-in for a crawl's host graph (q96 extracts
    //      the real one; parquet has no link column to join them on).
    //      Uniform start, one step; the gate pins the full arithmetic —
    //      damping, per-edge contribution, dangling-mass redistribution —
    //      at DECIMAL(38,18) against the oracle's identical op tree.
    "q111_pagerank_step" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"), (col("doc_id") % 97L).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"), expr("doc_id DIV 2").as("dst")))
        .distinct()
        .filter(col("src") =!= col("dst"))
      // a real iteration reads MATERIALIZED edge/rank tables (each PageRank
      // sweep persists its output); checkpointing the feed mirrors that and
      // keeps PlanSpec's lock on the operator's own plan
      val edgesM = edges.localCheckpoint()
      val nodes = edgesM.select(col("src").as("id"))
        .unionByName(edgesM.select(col("dst").as("id"))).distinct()
      val r0 = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("n0"))))
        .select(col("id"), (lit(1.0) / col("n0")).as("rank"))
        .localCheckpoint()
      pageRankStep(edgesM, r0)
        .repartition(1).sortWithinPartitions(col("id"))
    }),

    // ---- q99: BPE TRAINING loop — BpeTrainIters full merge iterations
    //      (q95 gates ONE step; this gates the training trajectory: each
    //      rank's chosen pair, its weighted count, and the corpus token
    //      count after applying it — the compression curve tokenizer
    //      training monitors). Iterations 2+ merge MULTI-character
    //      symbols, where a naive substring replace would false-match
    //      across symbol boundaries (pair (b,c) inside segmentation
    //      [ab, c]); both engines therefore encode the segmentation with
    //      symbols double-space separated and single-space fenced
    //      (' a  b  c '), so the literal replace ' L  R ' -> ' LR ' is
    //      boundary-safe AND keeps BPE's greedy left-to-right
    //      non-overlapping order ('a a a a' merges to [aa, aa], 'a a a'
    //      to [aa, a] — Sennrich et al. 2016's reference semantics).
    //      Scale shape: ONE corpus pass builds the word-frequency vocab;
    //      every iteration runs on the VOCABULARY — pair counts as
    //      partial+final aggs, the argmax joined back as a one-row
    //      broadcast (never a collect), the vocab localCheckpointed per
    //      iteration so plan depth stays constant across ranks.
    "q99_bpe_train" -> ((s, dir) => {
      val vocab0 = t(s, dir, "documents")
        .select(explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
        .withColumn("s", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .select(col("f"), col("s"))
        .localCheckpoint()
      var vocab = vocab0
      val ranks = (1 to BpeTrainIters).map { i =>
        val (best, mergedRaw) = bpeStep(vocab)
        val merged = mergedRaw.localCheckpoint()
        vocab = merged
        val toks = merged
          .agg(sum(col("f") * size(col("s"))).cast("long").as("corpus_tokens"))
        best.select(lit(i.toLong).as("merge_rank"), col("pair"),
            col("cnt").cast("long").as("cnt"))
          .crossJoin(broadcast(toks))
      }
      ranks.reduce(_ union _)
        .repartition(1).sortWithinPartitions(col("merge_rank"))
    }),

    // ---- q112: tokenize the corpus with the TRAINED tokenizer (q99
    //      learns the merges; this applies them) — the step that actually
    //      runs over all 100 TB, so its shape matters most: merges are
    //      applied to the VOCABULARY (distinct words, carrying the word
    //      through the same fenced replace chain), then one equi-join
    //      brings per-word token counts back to the exploded corpus —
    //      encode each distinct word ONCE, never re-run the merge chain
    //      per token occurrence (the vocab is Zipf-small relative to the
    //      corpus but NOT broadcast-assumed). Gate: per-doc word and
    //      BPE-token counts under the learned merges, oracle replaying
    //      the identical training + application chain.
    "q112_bpe_encode" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      var vocab = words.groupBy(col("w")).agg(count(lit(1)).as("f"))
        .withColumn("s", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .select(col("w"), col("f"), col("s"))
        .localCheckpoint()
      (1 to BpeTrainIters).foreach { _ =>
        vocab = bpeStep(vocab)._2.localCheckpoint()
      }
      val encoded = vocab.select(col("w"), size(col("s")).cast("long").as("n_sym"))
      words.join(encoded, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(col("n_sym")).cast("long").as("bpe_tokens"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q141: paragraph-level exact dedup — the Dolma-granularity
    //      middle tier between q40 (whole-doc) and q70 (substring). The
    //      corpus has no newlines, so both engines synthesize the
    //      IDENTICAL paragraph structure (q98's shared-synthesis
    //      discipline): a per-source promo paragraph (recurring across
    //      every doc of its source — the shared-content case dedup must
    //      keep ONCE, where q98's df rule would drop it everywhere) +
    //      ParaWords-word content groups. The operator knows nothing of
    //      the synthesis: it keeps each distinct paragraph's first global
    //      occurrence purely by (doc_id, pi) order. The gate hashes each
    //      doc's reassembled text, so a wrong winner, a dropped unique
    //      paragraph, or misordered reassembly all break it.
    "q141_para_dedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      dedupParagraphs(paragraphs(s, dir))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q142: temperature-based domain mixture — per-source token
    //      targets ∝ sqrt(source tokens) (alpha = 0.5 sampling: flattens
    //      the source-size head, boosts the tail — the standard
    //      multi-domain re-balancing rule), then q65's deterministic
    //      start-below-budget admission in content-hash order against the
    //      COMPUTED target. q65 is the fixed-budget recipe; this derives
    //      the budgets from the corpus itself. One source-sized agg + one
    //      1-row broadcast + one admission window per source + a final
    //      source-sized agg; integer/IEEE arithmetic mirrored op-for-op.
    "q142_temp_mixture" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), wsTokenCount(col("text")).as("n_tokens"),
          call_function("graft_polyhash",
            col("text"), lit(31), lit(TextOps.HashMod)).as("ohash"))
      val targets = temperatureTargets(
        docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens")))
        .select(col("source"), col("target"))
      val w = Window.partitionBy(col("source")).orderBy(col("ohash"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(targets), Seq("source"))
        .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("admit", col("start") < col("target"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tok_total"),
          max(col("target")).as("target"),
          sum(when(col("admit"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("admit"), col("n_tokens")).otherwise(0L)).as("tok_admitted"))
        .repartition(1).sortWithinPartitions(col("source"))
    }),

    // ---- q146: epoched temperature mixture — q142 with the FULL corpus
    //      budget (div 1), which is the real recipe's shape: sources whose
    //      alpha-target exceeds their token count REPLICATE across epochs
    //      (sampling with replacement — the "seen ~N epochs" column of a
    //      pre-training data table), head sources downsample to an
    //      epoch-0 prefix. Deterministic: each doc's copies are (epoch,
    //      content-hash) ordered, admission is q65's start-below-budget
    //      rule over the replicated stream. Scale: the explode factor is
    //      per-source epochs (bounded by the mixture's flattening — a
    //      source is never replicated more than target/tokens ≈
    //      sqrt-rebalance times), the admission window is the one exchange.
    "q146_epoch_mixture" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), wsTokenCount(col("text")).as("n_tokens"),
          call_function("graft_polyhash",
            col("text"), lit(31), lit(TextOps.HashMod)).as("ohash"))
      val targets = temperatureTargets(
          docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens")),
          budgetDiv = 1L)
        .withColumn("epochs",
          // greatest(src_tokens, 1) in the divisor: a source whose docs
          // all tokenize to zero would otherwise divide by zero (error in
          // DuckDB, NULL here — a silent engine divergence); the clamp
          // keeps both engines on the same arithmetic (epochs = 1).
          greatest(expr("(target + src_tokens - 1) div greatest(src_tokens, 1L)"), lit(1L)))
        .select(col("source"), col("target"), col("epochs"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("epoch"), col("ohash"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(targets), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("ohash"),
          col("target"), explode(expr("sequence(0L, epochs - 1)")).as("epoch"))
        .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .filter(col("start") < col("target"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_tokens")).as("tok_admitted"),
          max(col("epoch")).as("max_epoch"))
        .repartition(1).sortWithinPartitions(col("source"))
    }),

    // ---- q151: triangle counting with degree orientation (Suri &
    //      Vassilvitskii WWW 2011) — the clustering-coefficient primitive
    //      of link-graph quality analysis, third member of the graph
    //      family (q54/q109 connectivity, q111 centrality). Each
    //      undirected edge orients from its lower-(degree, id) endpoint,
    //      so every triangle is counted exactly ONCE at its lowest vertex
    //      and — the scale point — wedge generation per vertex is bounded
    //      by the oriented OUT-degree, O(sqrt(m)) even at a hub whose raw
    //      degree is huge (the %97 hub edges plant exactly that skew; a
    //      naive wedge join would square it). Plan: two degree joins, one
    //      self-equi wedge join on the pivot, one closing equi-join
    //      against the canonical edge set; everything partial+final aggs.
    //      Oracle counts the same triangles by the naive three-way join.
    "q151_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id").as("d"))
      // synthetic link graph: a path (d, d+1), chords (d, d+2) on even d
      // (every even d closes a triangle), hub edges d -> d%97 for skew
      val raw = docs.select(col("d").as("a"), (col("d") + 1).as("b"))
        .unionByName(docs.filter(col("d") % 2 === 0)
          .select(col("d").as("a"), (col("d") + 2).as("b")))
        .unionByName(docs.filter(col("d") >= 97)
          .select((col("d") % 97).as("a"), col("d").as("b")))
      triangleCount(raw)
    }),

    // ---- q150: exact duplicated-substring REMOVAL (Lee et al. ACL 2022)
    //      — q70 detects repeated 13-char grams, this cuts every
    //      non-first occurrence's span out and splices the documents back
    //      together. The corpus' planted near-dups guarantee the removal
    //      path is heavily exercised; the gate hashes every spliced doc,
    //      so a wrong winner, a mis-merged island, or an off-by-one span
    //      boundary all break it.
    "q150_substring_removal" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      removeDuplicateSubstrings(
          t(s, dir, "documents").select(col("doc_id"), col("text")))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    })
  )

  // Exact all-pairs / list-comprehension oracles (fine at sf0.01; the Spark
  // side carries the scalable plan).

  /** q54's oracle, shared: q82's histogram gate wraps the SAME
    * independently-derived cluster labels as a subquery. */
  /** The q54/q109 oracles' shared CTE chain up to per-node labels:
    * exact-Jaccard pairs, optionally UNION ALL'd with `extraEdges` rows
    * (id_a, id_b), then min-label connected components. */
  private def ccLabCtes(extraEdges: String): String = s"""
      WITH RECURSIVE sh AS (
        SELECT doc_id, ${TextOps.shinglesSql("text", NearDup.ShingleK)} AS sh FROM documents),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= ${NearDup.JaccardT}),
      allp AS (SELECT id_a, id_b FROM pairs$extraEdges),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM allp
        UNION ALL SELECT id_b, id_a FROM allp),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      cc(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.id
        WHERE cc.label < e.dst),
      lab AS (SELECT id, min(label) AS canonical_id FROM cc GROUP BY id)"""

  private val q54OracleSql: String = s"""${ccLabCtes("")},
      siz AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1)
      SELECT l.id AS doc_id, l.canonical_id, s.cluster_size
      FROM lab l JOIN siz s USING (canonical_id)
      ORDER BY doc_id"""

  /** q109's synthetic "new day" edges, shared between the Spark feed and
    * the oracle: every %100 doc links a brand-new doc id (+1000000), and
    * every %97 doc gains an arbitrary bridge (+37) that can merge
    * existing clusters or mint new ones. */
  private val q109NewEdgesSql: String = """
        UNION ALL SELECT doc_id, doc_id + 1000000 FROM documents WHERE doc_id % 100 = 0
        UNION ALL SELECT doc_id, doc_id + 37 FROM documents WHERE doc_id % 97 = 0"""

  /** The q164/q168 shared oracle lattice: word frequencies → capped
    * substring seed → probabilities → boundary-mask segmentations →
    * left-to-right score fold → per-word `best` winner. One string, two
    * gates — the SQL twin of the shared [[unigramSegment]]. */
  private val uniLatticeCtes: String = s"""wf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
          FROM documents) x
        WHERE length(w) BETWEEN 1 AND $UniMaxWordLen GROUP BY w),
      st1 AS (SELECT w, f, unnest(range(1, length(w) + 1)) AS st FROM wf),
      seed AS (
        SELECT substr(w, CAST(st AS INT), CAST(ln AS INT)) AS piece,
          CAST(sum(f) AS BIGINT) AS c0
        FROM (SELECT w, f, st,
            unnest(range(1, least($UniMaxPieceLen, length(w) - st + 1) + 1)) AS ln
          FROM st1) z
        GROUP BY 1),
      tot0 AS (SELECT CAST(sum(c0) AS BIGINT) AS t0 FROM seed),
      probs AS (SELECT piece, c0::DOUBLE / t0::DOUBLE AS p FROM seed, tot0),
      masks AS (
        SELECT w, f, unnest(range(0, (1::BIGINT << (length(w) - 1)))) AS m
        FROM wf),
      bnd AS (
        SELECT w, f, m,
          list_concat(list_concat([0::BIGINT],
            list_filter(range(1, length(w)), bi -> ((m >> (bi - 1)) & 1) = 1)),
            [length(w)::BIGINT]) AS bounds
        FROM masks),
      seg AS (
        SELECT w, f, m,
          list_transform(range(1, len(bounds)), sk ->
            substr(w, CAST(bounds[CAST(sk AS INT)] + 1 AS INT),
              CAST(bounds[CAST(sk AS INT) + 1] - bounds[CAST(sk AS INT)] AS INT))) AS ps
        FROM bnd),
      valid AS (
        SELECT * FROM seg
        WHERE len(list_filter(ps, pp -> length(pp) > $UniMaxPieceLen)) = 0),
      expl AS (
        SELECT w, f, m, k, ps[CAST(k AS INT)] AS pc
        FROM (SELECT w, f, m, ps, unnest(range(1, len(ps) + 1)) AS k FROM valid) v),
      scored AS (
        SELECT e.w, e.f, e.m,
          list_reduce(list(p.p ORDER BY e.k), (a, b) -> a * b) AS score,
          CAST(count(*) AS BIGINT) AS np,
          string_agg(e.pc, '|' ORDER BY e.k) AS seg
        FROM expl e JOIN probs p ON p.piece = e.pc
        GROUP BY e.w, e.f, e.m),
      best AS (
        SELECT w, f, seg FROM (
          SELECT w, f, seg, row_number() OVER (
            PARTITION BY w ORDER BY score DESC, np ASC, seg ASC) AS rn
          FROM scored) b
        WHERE rn = 1)"""

  /** The q203/q221 shared oracle CTE chain — the SQL mirror of
    * [[pipelineStages]], ending in the `adm` admitted set (plus the d1-d4
    * stage frames and `tgt` the funnel gate reads). ONE text feeds both
    * oracles, so they cannot desynchronize. */
  private def pipelineSqlCtes: String = s"""gw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS W
                  FROM documents),
      gs AS MATERIALIZED (
        SELECT ws.doc_id FROM (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
            CAST(sum(len(wd)) AS BIGINT) AS sumlen,
            CAST(count(DISTINCT CASE WHEN wd IN
              (${GopherStops.map(x => s"'$x'").mkString(",")}) THEN wd END)
              AS BIGINT) AS n_stop
          FROM (SELECT doc_id, unnest(W) AS wd FROM gw) w GROUP BY doc_id) ws
        JOIN (
          SELECT doc_id, CAST(max(cnt * (len(w1) + len(w2))) AS BIGINT) AS cover
          FROM (SELECT doc_id, w1, w2, count(*) AS cnt FROM (
            SELECT doc_id, W[i] AS w1, W[i+1] AS w2
            FROM gw, unnest(range(1, len(W))) AS u(i)) bg GROUP BY 1, 2, 3) bc
          GROUP BY doc_id) cov USING (doc_id)
        WHERE ws.nw >= $GopherMinWords AND ws.nw <= $GopherMaxWords
          AND ws.sumlen::DOUBLE / ws.nw::DOUBLE >= $GopherMinWlen
          AND ws.sumlen::DOUBLE / ws.nw::DOUBLE <= $GopherMaxWlen
          AND ws.n_stop >= $GopherMinStop
          AND cov.cover::DOUBLE / ws.sumlen::DOUBLE < $Gopher2gCap),
      d1 AS MATERIALIZED (
        SELECT d.* FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM gs)),
      d2 AS MATERIALIZED (
        SELECT doc_id, text, lang, source, n_chars FROM (
          SELECT d1.*, ROW_NUMBER() OVER (PARTITION BY md5(text)
            ORDER BY doc_id) AS rn
          FROM d1) x WHERE rn = 1),
      sh AS MATERIALIZED (
        SELECT doc_id, ${TextOps.shinglesSql("text", NearDup.ShingleK)} AS sh
        FROM d2),
      rej AS MATERIALIZED (
        SELECT DISTINCT b.doc_id
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
          >= ${NearDup.JaccardT}),
      d3 AS MATERIALIZED (
        SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM rej)),
      q AS (${TextOps.qualitySql("d3")}),
      d4 AS MATERIALIZED (
        SELECT doc_id, source, text FROM (
          SELECT q.doc_id, d3.source, d3.text,
            percent_rank() OVER (PARTITION BY d3.source ORDER BY q.quality)
              AS pct
          FROM q JOIN d3 USING (doc_id)) x
        WHERE pct >= ${TextOps.CalibAdmit}),
      tok AS MATERIALIZED (
        SELECT doc_id, source, ${wsTokenCountSql("text")} AS n_tokens,
          ${TextOps.polyHashSql("text")} AS ohash
        FROM d4),
      st AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
             FROM tok GROUP BY source),
      tw AS (SELECT source, src_tokens, sqrt(src_tokens::DOUBLE) AS w FROM st),
      tot AS (SELECT ${graft.util.Sumd.SUMD("w")} AS sumw,
                CAST(sum(src_tokens) AS BIGINT) AS total_tokens FROM tw),
      tgt AS MATERIALIZED (
        SELECT source,
          CAST(floor((total_tokens // $TempBudgetDiv)::DOUBLE * w / sumw)
            AS BIGINT) AS target
        FROM tw, tot),
      adm AS (
        SELECT source, doc_id, n_tokens FROM (
          SELECT t.source, t.doc_id, t.n_tokens, g.target,
            sum(t.n_tokens) OVER (PARTITION BY t.source
              ORDER BY t.ohash, t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t.n_tokens
              AS strt
          FROM tok t JOIN tgt g USING (source)) x
        WHERE strt < target)"""

  val oracles: Map[String, String] = Map(
    // Same two doc-keyed aggregates; the bigram arm indexes the words
    // array laterally (W[i], W[i+1]) — identical adjacency to the Spark
    // side's shifted-slice zip.
    "q178_gopher_rules" -> s"""
      WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS W
                 FROM documents),
      w AS (SELECT doc_id, unnest(W) AS wd FROM d),
      ws AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
               CAST(sum(len(wd)) AS BIGINT) AS sumlen,
               CAST(count(DISTINCT CASE WHEN wd IN (${GopherStops.map(x => s"'$x'").mkString(",")})
                 THEN wd END) AS BIGINT) AS n_stop
             FROM w GROUP BY doc_id),
      bg AS (SELECT doc_id, W[i] AS w1, W[i+1] AS w2
             FROM d, unnest(range(1, len(W))) AS u(i)),
      bc AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2, 3),
      cov AS (SELECT doc_id, CAST(max(cnt * (len(w1) + len(w2))) AS BIGINT) AS cover
              FROM bc GROUP BY doc_id)
      SELECT ws.doc_id, ws.nw,
        ws.sumlen::DOUBLE / ws.nw::DOUBLE AS mean_wlen, ws.n_stop,
        cov.cover::DOUBLE / ws.sumlen::DOUBLE AS top2g_frac,
        (ws.nw >= $GopherMinWords AND ws.nw <= $GopherMaxWords) AS r_words,
        (ws.sumlen::DOUBLE / ws.nw::DOUBLE >= $GopherMinWlen
          AND ws.sumlen::DOUBLE / ws.nw::DOUBLE <= $GopherMaxWlen) AS r_wlen,
        (ws.n_stop >= $GopherMinStop) AS r_stop,
        (cov.cover::DOUBLE / ws.sumlen::DOUBLE < $Gopher2gCap) AS r_2gram,
        ((ws.nw >= $GopherMinWords AND ws.nw <= $GopherMaxWords)
          AND (ws.sumlen::DOUBLE / ws.nw::DOUBLE >= $GopherMinWlen
            AND ws.sumlen::DOUBLE / ws.nw::DOUBLE <= $GopherMaxWlen)
          AND ws.n_stop >= $GopherMinStop
          AND cov.cover::DOUBLE / ws.sumlen::DOUBLE < $Gopher2gCap) AS keep
      FROM ws JOIN cov USING (doc_id) ORDER BY ws.doc_id""",

    // The full five-stage replay: q178's keep rule, md5 election,
    // q67-style Jaccard pairs with the one-pass larger-id rejection,
    // q175's percent_rank admission, q142's temperature arithmetic and
    // q65's running-sum admission — then the per-source funnel report.
    // Stage CTEs MATERIALIZED (each feeds several consumers).
    "q203_pipeline_e2e" -> s"""
      WITH $pipelineSqlCtes
      SELECT base.source,
        base.n_raw,
        coalesce(c1.n, 0) AS n_gopher,
        coalesce(c2.n, 0) AS n_exact,
        coalesce(c3.n, 0) AS n_neardup,
        coalesce(c4.n, 0) AS n_cal,
        coalesce(c5.n, 0) AS n_final,
        coalesce(c5.tok, 0) AS tokens_final,
        coalesce(tgt.target, 0) AS target
      FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_raw
            FROM documents GROUP BY source) base
      LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d1
                 GROUP BY source) c1 USING (source)
      LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d2
                 GROUP BY source) c2 USING (source)
      LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d3
                 GROUP BY source) c3 USING (source)
      LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d4
                 GROUP BY source) c4 USING (source)
      LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_tokens) AS BIGINT) AS tok FROM adm
                 GROUP BY source) c5 USING (source)
      LEFT JOIN tgt USING (source)
      ORDER BY base.source""",

    // q221: the q203 chain CONTINUED through the release stages — the
    // shared CTE prefix guarantees the manifest describes exactly the
    // corpus q203 admitted; BPE trains on the admitted set (d5), pack/
    // shard/manifest/card all read the tokenized admitted frame d6.
    "q221_release_capstone" -> s"""
      WITH $pipelineSqlCtes,
      d5 AS MATERIALIZED (
        SELECT a.doc_id, a.source, d4.text, doc.lang, doc.n_chars
        FROM adm a JOIN d4 USING (doc_id)
        JOIN documents doc ON doc.doc_id = a.doc_id),
      ${bpeTrainCtes(carry = "w, ", from = "d5")},
      enc AS (SELECT w, CAST(len(s) AS BIGINT) AS n_sym FROM v$BpeTrainIters),
      dt AS MATERIALIZED (
        SELECT ws.doc_id, CAST(sum(e.n_sym) AS BIGINT) AS bpe
        FROM ws JOIN enc e USING (w) GROUP BY ws.doc_id),
      d6 AS MATERIALIZED (
        SELECT d5.doc_id, d5.source, d5.text, d5.lang, d5.n_chars, dt.bpe
        FROM d5 JOIN dt USING (doc_id)),
      pk AS (
        SELECT source,
          unnest(range(strt // $SeqLen, ((endc - 1) // $SeqLen) + 1)) AS seq_id
        FROM (
          SELECT source, doc_id,
            CAST(sum(bpe + 1) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS endc,
            CAST(sum(bpe + 1) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (bpe + 1)
              AS BIGINT) AS strt
          FROM d6) x),
      packs AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(bpe + 1) AS BIGINT) AS n_tokens
        FROM d6 GROUP BY source),
      pseq AS (
        SELECT source, CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs
        FROM pk GROUP BY source),
      ${Curation.shardAssignSqlCtes("d6", "bpe")},
      mani AS (
        SELECT s.shard, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
          bit_xor(${TextOps.polyHashSql("d6.text")}) AS digest
        FROM shards s JOIN d6 USING (doc_id)
        GROUP BY s.shard),
      card AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(bpe) AS BIGINT) AS n_tokens,
          CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM d6 GROUP BY source, lang)
      SELECT section, k_num, k1, n_docs, n_tokens, extra FROM (
        SELECT 'card' AS section, CAST(0 AS BIGINT) AS k_num,
          source || '/' || lang AS k1, n_docs, n_tokens, n_chars AS extra
        FROM card
        UNION ALL
        SELECT 'pack', 0, p.source, p.n_docs, p.n_tokens, q.n_seqs
        FROM packs p JOIN pseq q ON p.source = q.source
        UNION ALL
        SELECT 'shard', shard, '', n_docs, n_tokens, digest FROM mani) u
      ORDER BY section, k_num, k1""",


    // The identical peel rounds unrolled as CTEs (e0..eN), trajectory
    // stats per round UNION'd.
    "q201_kcore_peel" -> {
      // MATERIALIZED: each round references its predecessor three times —
      // default CTE inlining would expand the chain exponentially
      val head = s"""
      WITH e0 AS MATERIALIZED (
        SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM (
          SELECT doc_id AS x, doc_id % 97 AS y FROM documents
          UNION
          SELECT doc_id, doc_id // 2 FROM documents) z
        WHERE least(x, y) <> greatest(x, y))"""
      val rounds = (1 to PeelRounds).map { i =>
        s""",
      k$i AS MATERIALIZED (
        SELECT v FROM (
          SELECT v, count(*) AS c FROM (
            SELECT a AS v FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) u
          GROUP BY v) d WHERE c >= $CoreK),
      e$i AS MATERIALIZED (
        SELECT a, b FROM e${i - 1}
        WHERE a IN (SELECT v FROM k$i) AND b IN (SELECT v FROM k$i))"""
      }.mkString
      val arms = (0 to PeelRounds).map { i =>
        s"""
      SELECT CAST($i AS BIGINT) AS round,
        (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
          (SELECT a AS v FROM e$i UNION ALL SELECT b FROM e$i) u$i) AS n_nodes,
        (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS n_edges"""
      }.mkString(" UNION ALL ")
      head + rounds + arms + " ORDER BY round"
    },

    // Same edge synthesis/undirection (UNION set semantics both sides),
    // same mod-seeded labels, same (votes desc, label) argmax.
    "q184_label_prop" -> s"""
      WITH e0 AS (
        SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
        UNION
        SELECT doc_id, doc_id // 2 FROM documents),
      e1 AS (SELECT src, dst FROM e0 WHERE src <> dst),
      und AS (
        SELECT src AS v, dst AS u FROM e1
        UNION
        SELECT dst AS v, src AS u FROM e1),
      votes AS (
        SELECT v, u % $LabelPropMod AS nl, CAST(count(*) AS BIGINT) AS votes
        FROM und GROUP BY 1, 2),
      pick AS (
        SELECT v, nl, votes,
          ROW_NUMBER() OVER (PARTITION BY v ORDER BY votes DESC, nl) AS rn
        FROM votes)
      SELECT v AS node, v % $LabelPropMod AS old_label, nl AS new_label, votes
      FROM pick WHERE rn = 1 ORDER BY node""",

    // Same lead-window gram synthesis (null-propagating concat ≡ the
    // IS NOT NULL guards) and the same exact-count ratio.
    "q186_ngram_diversity" -> s"""
      WITH d AS (SELECT doc_id, source,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS W
                 FROM documents),
      tok AS (SELECT doc_id, source, u.i AS pos, W[u.i] AS wd
              FROM d, unnest(range(1, len(W) + 1)) AS u(i)),
      g AS (
        SELECT doc_id, source, wd,
          lead(wd, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
          lead(wd, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
        FROM tok),
      grams AS (
        SELECT source, CAST(1 AS BIGINT) AS n, wd AS gram FROM g
        UNION ALL
        SELECT source, CAST(2 AS BIGINT), wd || ' ' || w2 FROM g
        WHERE w2 IS NOT NULL
        UNION ALL
        SELECT source, CAST(3 AS BIGINT), wd || ' ' || w2 || ' ' || w3 FROM g
        WHERE w3 IS NOT NULL)
      SELECT source, n, CAST(count(*) AS BIGINT) AS total,
        CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
        count(DISTINCT gram)::DOUBLE / count(*)::DOUBLE AS ratio
      FROM grams GROUP BY source, n ORDER BY source, n""",

    // q150's positional-gram + gaps-and-islands SQL with the seed rule
    // swapped: seeds are probe grams present in the benchmark docs' hash
    // set, and the output is the per-doc mask report.
    "q185_decontam_spans" -> s"""
      WITH occ AS (
        SELECT doc_id, CAST(gi AS BIGINT) AS p,
          ${TextOps.polyHashSql(s"substring(text, CAST(gi AS INT), $SubRemK)")} AS h
        FROM documents,
          unnest(range(1, greatest(length(text) - ${SubRemK - 2}, 1))) AS u(gi)),
      bench AS (SELECT DISTINCT h FROM occ WHERE doc_id % 50 = 0),
      seeds AS (
        SELECT o.doc_id, o.p AS s, o.p + ${SubRemK - 1} AS e
        FROM occ o JOIN bench b USING (h)
        WHERE o.doc_id % 50 <> 0),
      isl0 AS (
        SELECT doc_id, s, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        FROM seeds),
      isl1 AS (
        SELECT doc_id, s, e,
          CASE WHEN prevmax IS NULL OR s > prevmax THEN 1 ELSE 0 END AS newisl
        FROM isl0),
      isl2 AS (
        SELECT doc_id, s, e,
          sum(newisl) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM isl1),
      islands AS (
        SELECT doc_id, isl, min(s) AS i_s, max(e) AS i_e
        FROM isl2 GROUP BY 1, 2),
      spans AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
          CAST(sum(i_e - i_s + 1) AS BIGINT) AS chars_masked
        FROM islands GROUP BY doc_id)
      SELECT d.doc_id, length(d.text)::BIGINT AS chars_total,
        coalesce(s.n_spans, 0) AS n_spans,
        coalesce(s.chars_masked, 0) AS chars_masked
      FROM documents d LEFT JOIN spans s USING (doc_id)
      WHERE d.doc_id % 50 <> 0
      ORDER BY d.doc_id""",

    // Same bucket/rank/batch assignment; integer floor-div via // and the
    // identical (len desc, doc_id) rank order.
    "q183_length_batching" -> s"""
      WITH d AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS nw
        FROM documents),
      b AS (SELECT doc_id, nw, nw // $LenBucketWidth AS bucket FROM d),
      r AS (SELECT doc_id, nw, bucket,
              ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY nw DESC, doc_id) AS rn
            FROM b),
      g AS (SELECT bucket, CAST((rn - 1) // $BatchDocs AS BIGINT) AS batch,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(max(nw) AS BIGINT) AS max_len,
              CAST(sum(nw) AS BIGINT) AS sum_len
            FROM r GROUP BY 1, 2)
      SELECT bucket, batch, n_docs, max_len, sum_len,
        max_len * n_docs - sum_len AS waste,
        (max_len * n_docs - sum_len)::DOUBLE / (max_len * n_docs)::DOUBLE AS pad_frac
      FROM g ORDER BY bucket, batch""",

    // Same smoothed cross-product ratio and the index-ordered product fold
    // (list_prepend(1.0) ≡ the Spark fold's 1.0 init — 1.0*x == x in IEEE).
    "q179_dsir" -> s"""
      WITH d AS (SELECT doc_id, source,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS W
                 FROM documents),
      w AS (SELECT doc_id, source, u.i AS pos, W[u.i] AS wd
            FROM d, unnest(range(1, len(W) + 1)) AS u(i)),
      raw AS (SELECT wd, CAST(count(*) AS BIGINT) AS cr FROM w GROUP BY wd),
      tgt AS (SELECT wd, CAST(count(*) AS BIGINT) AS ct FROM w
              WHERE source = '$DsirTarget' GROUP BY wd),
      tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
                CAST(count(*) AS BIGINT) AS v FROM raw),
      tt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tgt),
      ratio AS (
        SELECT r.wd,
          ((coalesce(t.ct, 0) + 1) * (tot.nr + tot.v))::DOUBLE /
            ((r.cr + 1) * (tt.nt + tot.v))::DOUBLE AS rr
        FROM raw r LEFT JOIN tgt t USING (wd), tot, tt)
      SELECT w.doc_id, max(w.source) AS source,
        CAST(count(*) AS BIGINT) AS nw,
        list_reduce(list_prepend(1.0::DOUBLE, list(rr ORDER BY pos)),
          (a, b) -> a * b) AS weight
      FROM w JOIN ratio USING (wd)
      GROUP BY w.doc_id
      ORDER BY weight DESC, w.doc_id LIMIT $DsirK""",

    "q54_dedup_clusters" -> q54OracleSql,

    // CC(P ∪ N) from scratch — what the star-compressed incremental fold
    // must reproduce exactly.
    // The identical op tree to pageRankStep: same edge synthesis, same
    // uniform start, same left-assoc (1-d)/N + d·in + d·dangling/N, sums
    // at DECIMAL(38,18).
    // q229: recursive-CTE walk of the same undirected graph from the same
    // min-id seed; min(dist) per node = the BFS layer.
    "q229_bfs_layers" -> s"""
      WITH RECURSIVE edges AS (
        SELECT src, dst FROM (
          SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
          UNION
          SELECT doc_id AS src, doc_id // 2 AS dst FROM documents) e
        WHERE src <> dst),
      und AS (
        SELECT src AS v, dst AS u FROM edges
        UNION
        SELECT dst AS v, src AS u FROM edges),
      walk AS (
        SELECT (SELECT min(doc_id) FROM documents) AS node, CAST(0 AS BIGINT) AS dist
        UNION
        SELECT u.u AS node, w.dist + 1 AS dist
        FROM walk w JOIN und u ON u.v = w.node
        WHERE w.dist < $BfsHops),
      layer AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
      SELECT dist, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(node) AS BIGINT) AS sum_node
      FROM layer GROUP BY dist ORDER BY dist""",

    "q111_pagerank_step" -> s"""
      WITH edges AS (
        SELECT src, dst FROM (
          SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
          UNION
          SELECT doc_id AS src, doc_id // 2 AS dst FROM documents) e
        WHERE src <> dst),
      nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM nodes),
      r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n0 FROM nn) AS rank FROM nodes),
      deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
      wd AS (SELECT r0.id, r0.rank, deg.outdeg FROM r0 LEFT JOIN deg ON r0.id = deg.src),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     ${graft.util.Sumd.SUMDHI(
                       "CASE WHEN outdeg IS NULL THEN rank ELSE CAST(0.0 AS DOUBLE) END")} AS dangling
              FROM wd),
      rate AS (SELECT id AS src_id, rank / outdeg AS c FROM wd WHERE outdeg IS NOT NULL),
      insum AS (SELECT e.dst, ${graft.util.Sumd.SUMDHI("c")} AS in_sum
                FROM edges e JOIN rate r ON e.src = r.src_id GROUP BY e.dst)
      SELECT n.id,
        (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / t.n
          + CAST(0.85 AS DOUBLE) * COALESCE(i.in_sum, CAST(0.0 AS DOUBLE))
          + CAST(0.85 AS DOUBLE) * t.dangling / t.n AS rank
      FROM nodes n LEFT JOIN insum i ON n.id = i.dst CROSS JOIN tot t
      ORDER BY n.id""",

    "q109_incremental_cc" -> s"""${ccLabCtes(q109NewEdgesSql)}
      SELECT id AS doc_id, canonical_id FROM lab ORDER BY doc_id""",

    // q54's independently-derived labels (recursive CTE) joined with q49's
    // exact quality definition; survivor = per-cluster argmax.
    "q91_dedup_survivors" -> s"""
      WITH lab AS (SELECT doc_id, canonical_id FROM ($q54OracleSql) x),
      q AS (${TextOps.qualitySql("documents")}),
      joined AS (
        SELECT lab.doc_id, lab.canonical_id, q.quality
        FROM lab JOIN q USING (doc_id)),
      r AS (
        SELECT joined.*, ROW_NUMBER() OVER (PARTITION BY canonical_id
          ORDER BY quality DESC, doc_id) AS rn
        FROM joined)
      SELECT doc_id, canonical_id, quality,
        CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_survivor
      FROM r ORDER BY doc_id""",

    "q55_stratified_sample" -> s"""
      SELECT doc_id, lang, bucket FROM (
        SELECT doc_id, lang,
          (${TextOps.polyHashSql("text")}) % 100 AS bucket,
          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 WHEN 'es' THEN 20
                    WHEN 'zh' THEN 10 ELSE 25 END AS rate
        FROM documents)
      WHERE bucket < rate
      ORDER BY doc_id""",

    "q56_token_pack" -> s"""
      SELECT doc_id, lang, n_tokens,
        start // $PackBudget AS bin,
        start % $PackBudget AS bin_offset
      FROM (
        SELECT doc_id, lang, n_tokens,
          CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
        FROM (
          SELECT doc_id, lang,
            ${wsTokenCountSql("text")} AS n_tokens
          FROM documents))
      ORDER BY doc_id""",

    "q57_contamination" -> s"""
      WITH sh AS (
        SELECT doc_id, unnest(${TextOps.shinglesSql("text", 13)}) AS g FROM documents),
      bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0)
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      FROM sh s JOIN bench USING (g)
      WHERE s.doc_id % 50 <> 0
      GROUP BY s.doc_id
      ORDER BY s.doc_id""",

    "q58_repetition" -> """
      SELECT doc_id, n,
        1.0 - len(list_distinct(ws))::DOUBLE / n::DOUBLE AS dup_word_frac,
        CASE WHEN n < 2 THEN 0.0 ELSE
          list_max(list_transform(list_distinct(bg),
            b -> len(list_filter(bg, x -> x = b))))::DOUBLE / (n - 1)::DOUBLE
        END AS top_bigram_frac
      FROM (
        SELECT doc_id, ws, len(ws)::BIGINT AS n,
          CASE WHEN len(ws) >= 2 THEN
            list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
          ELSE [] END AS bg
        FROM (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
          FROM documents))
      ORDER BY doc_id""",

    "q59_tfidf" -> """
      WITH w AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
      SELECT doc_id, rank, term, tf, df, score FROM (
        SELECT t.doc_id, t.term, t.tf, d.df,
          t.tf::DOUBLE * (n.n::DOUBLE / d.df::DOUBLE) AS score,
          row_number() OVER (PARTITION BY t.doc_id
            ORDER BY t.tf::DOUBLE * (n.n::DOUBLE / d.df::DOUBLE) DESC,
                     t.tf DESC, t.term ASC) AS rank
        FROM tf t JOIN df d USING (term) CROSS JOIN n)
      WHERE rank <= 3
      ORDER BY doc_id, rank""",

    "q65_mixture_sample" -> s"""
      SELECT doc_id, source, n_tokens, start FROM (
        SELECT doc_id, source, n_tokens, budget,
          CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ohash, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
        FROM (
          SELECT doc_id, source,
            ${wsTokenCountSql("text")} AS n_tokens,
            ${TextOps.polyHashSql("text")} AS ohash,
            $mixBudgetSql AS budget
          FROM documents))
      WHERE start < budget
      ORDER BY doc_id""",

    "q67_incremental_admit" -> s"""
      WITH sh AS (
        SELECT doc_id, ${TextOps.shinglesSql("text", NearDup.ShingleK)} AS sh FROM documents),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= ${NearDup.JaccardT}),
      rejected AS (
        SELECT id_b AS doc_id FROM pairs WHERE id_b % 10 = 7
        UNION
        SELECT id_a FROM pairs WHERE id_a % 10 = 7 AND id_b % 10 <> 7)
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id % 10 = 7 AND doc_id NOT IN (SELECT doc_id FROM rejected)
      ORDER BY doc_id""",

    "q68_quality_audit" -> """
      WITH s AS (
        SELECT doc_id, length(text)::BIGINT AS n,
          length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS alpha,
          len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS nw,
          len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT AS nd
        FROM documents),
      labeled AS (
        SELECT CASE WHEN n < 150 THEN 'too_short'
                    WHEN alpha * 100 < n * 81 THEN 'low_alpha'
                    WHEN (nw - nd) * 2 > nw THEN 'repetitive'
                    ELSE 'pass' END AS rule, nw
        FROM s)
      SELECT rule, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nw) AS BIGINT) AS n_tokens
      FROM labeled GROUP BY rule
      ORDER BY rule""",

    "q69_vocab_coverage" -> s"""
      WITH w AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
      tf AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf),
      top AS (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT $VocabK)
      SELECT rank, term, cnt, cum, cum::DOUBLE / total::DOUBLE AS coverage FROM (
        SELECT term, cnt, total,
          ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank,
          CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM top CROSS JOIN tot) x
      ORDER BY rank""",

    // q54's oracle re-used verbatim as a subquery: the histogram gate must
    // stand on the same independently-derived cluster labels
    "q82_cluster_histogram" -> s"""
      SELECT cluster_size,
        CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_clusters
      FROM ($q54OracleSql) base
      GROUP BY cluster_size
      ORDER BY cluster_size""",

    "q81_decile_histogram" -> {
      val bounds = (1 to 9)
        .map(i => s"quantile_cont(n_chars, ${i / 10.0}) AS d$i").mkString(", ")
      val chain = (1 to 9)
        .map(i => s"(CASE WHEN d.n_chars::DOUBLE > b.d$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH b AS (
        SELECT lang, $bounds FROM documents GROUP BY lang)
      SELECT d.lang, CAST(1 + $chain AS BIGINT) AS decile,
        CAST(count(*) AS BIGINT) AS n,
        CAST(min(d.n_chars) AS BIGINT) AS lo,
        CAST(max(d.n_chars) AS BIGINT) AS hi
      FROM documents d JOIN b USING (lang)
      GROUP BY 1, 2
      ORDER BY d.lang, decile"""
    },

    "q70_substring_dedup" -> s"""
      WITH sh AS (
        SELECT doc_id, unnest(${TextOps.shinglesSql("text", 13)}) AS g FROM documents),
      dfreq AS (SELECT g, count(*) AS df FROM sh GROUP BY g)
      SELECT s.doc_id,
        CAST(count(*) AS BIGINT) AS n_shingles,
        CAST(count(*) FILTER (WHERE dfreq.df >= 2) AS BIGINT) AS n_dup,
        count(*) FILTER (WHERE dfreq.df >= 2)::DOUBLE / count(*)::DOUBLE AS dup_frac
      FROM sh s JOIN dfreq USING (g)
      GROUP BY s.doc_id
      ORDER BY s.doc_id""",

    "q73_chunk_overlap" -> {
      val (cs, st) = (ChunkSize, ChunkStride)
      s"""
      WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
          len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n
        FROM documents),
      c AS (
        SELECT doc_id, ws, n,
          unnest(range(0, CASE WHEN n <= $cs THEN 1
                               ELSE 1 + (n - $cs + $st - 1) // $st END)) AS ci
        FROM d WHERE n > 0),
      sliced AS (
        SELECT doc_id, ci, ws[ci*$st+1 : ci*$st+$cs] AS chunk FROM c)
      SELECT doc_id, ci,
        len(chunk)::BIGINT AS chunk_tokens,
        ${TextOps.polyHashSql("array_to_string(chunk, ' ')")} AS chash
      FROM sliced
      ORDER BY doc_id, ci"""
    },

    // Replays the full iteration: weighted pair counts, argmax with the
    // same tie-break, the same greedy left-to-right merge application
    // (string replace shares that order), next-iteration pair counts.
    "q95_bpe_merge_step" -> """
      WITH ws AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents),
      vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS f FROM ws
        WHERE length(w) >= 2 GROUP BY w),
      p1 AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, sum(f) AS cnt FROM (
          SELECT w, f, unnest(range(1, CAST(length(w) AS BIGINT))) AS i
          FROM vocab) x
        GROUP BY 1),
      best AS (SELECT pair AS bp FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      seg AS (
        SELECT f, string_split(
          replace(trim(regexp_replace(w, '(.)', '\1 ', 'g')),
            substr(bp, 1, 1) || ' ' || substr(bp, 2, 1), bp), ' ') AS s
        FROM vocab, best),
      p2 AS (
        SELECT s[CAST(i AS INT)] || s[CAST(i AS INT) + 1] AS pair,
          CAST(sum(f) AS BIGINT) AS cnt FROM (
          SELECT s, f, unnest(range(1, CAST(len(s) AS BIGINT))) AS i
          FROM seg) y
        GROUP BY 1)
      SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair""",

    // q173: the same per-source running sum, block-span explode, and
    // overlap arithmetic, replayed declaratively.
    "q173_sequence_pack" -> s"""
      WITH d AS (
        SELECT doc_id, source, ${wsTokenCountSql("text")} + 1 AS n
        FROM documents),
      s AS (
        SELECT doc_id, source, n,
          sum(n) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS endc
        FROM d),
      sp AS (
        SELECT source, doc_id, CAST(endc - n AS BIGINT) AS strt,
          CAST(endc - 1 AS BIGINT) AS e,
          unnest(range(CAST((endc - n) // $SeqLen AS BIGINT),
            CAST((endc - 1) // $SeqLen + 1 AS BIGINT))) AS seq_id
        FROM s)
      SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(least(e, (seq_id + 1) * $SeqLen - 1)
          - greatest(strt, seq_id * $SeqLen) + 1) AS BIGINT) AS n_tokens,
        CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM sp GROUP BY source, seq_id
      ORDER BY source, seq_id""",

    // Declarative replay of q164's hard-EM step: same seed substrings,
    // same explicit boundary-mask lattice, same left-to-right probability
    // fold (list_reduce over the k-ordered list == Spark's aggregate fold:
    // both multiply left-to-right from the first piece, and 1.0*p == p in
    // IEEE, so scores are bit-identical), same (score DESC, np ASC, seg
    // ASC) argmax, same renormalization. The chain through `best` is ONE
    // string shared with q168's oracle (uniLatticeCtes), mirroring the
    // shared unigramSegment on the Spark side.
    "q164_unigram_lm" -> s"""
      WITH $uniLatticeCtes,
      cnts AS (
        SELECT piece, CAST(sum(f) AS BIGINT) AS cnt FROM (
          SELECT f, unnest(string_split(seg, '|')) AS piece FROM best) c
        GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cnts)
      SELECT piece, cnt, cnt::DOUBLE / t::DOUBLE AS prob
      FROM cnts, tot ORDER BY piece""",

    // q168 = the shared lattice's winners applied to the corpus: one
    // per-word join, char-count fallback past the length cap.
    // q242: the same lattice, aggregated per language with exact sums.
    "q242_tokenizer_eval" -> s"""
      WITH $uniLatticeCtes,
      wd AS (
        SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents),
      j AS (
        SELECT lang,
          coalesce(len(string_split(b.seg, '|')), length(wd.w)) AS n_tok,
          length(wd.w) AS wlen,
          CASE WHEN len(string_split(b.seg, '|')) = 1 THEN 1 ELSE 0 END AS whole
        FROM wd LEFT JOIN best b ON b.w = wd.w)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        CAST(sum(wlen) AS BIGINT) AS n_chars,
        CAST(sum(whole) AS BIGINT) AS n_whole,
        CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS fertility,
        CAST(sum(wlen) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) AS chars_per_token,
        CAST(sum(whole) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS whole_word_rate
      FROM j GROUP BY lang ORDER BY lang""",

    "q168_unigram_encode" -> s"""
      WITH $uniLatticeCtes,
      wd AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(coalesce(len(string_split(b.seg, '|')), length(wd.w))) AS BIGINT)
          AS uni_tokens
      FROM wd LEFT JOIN best b ON b.w = wd.w
      GROUP BY doc_id ORDER BY doc_id""",


    // The identical URL synthesis, then the canonicalization and the
    // budget window replayed declaratively.
    "q96_host_budget" -> s"""
      WITH u AS (
        SELECT doc_id,
          'HTTPS://' || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
          source || '-' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' ||
          CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END ||
          '/p/' || CAST(doc_id AS VARCHAR) ||
          CASE WHEN doc_id % 5 = 0 THEN '?ref=feed' ELSE '' END AS url,
          ${wsTokenCountSql("text")} AS n_tokens
        FROM documents),
      h AS (
        SELECT doc_id, n_tokens,
          regexp_replace(regexp_replace(
            lower(split_part(split_part(url, '://', 2), '/', 1)),
            ':(443|80)$$', ''), '^www\\.', '') AS host
        FROM u),
      adm AS (
        SELECT host, n_tokens,
          sum(n_tokens) OVER (PARTITION BY host ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS strt
        FROM h)
      SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        CAST(count(*) FILTER (WHERE strt < $HostBudget) AS BIGINT) AS n_admitted,
        CAST(coalesce(sum(n_tokens) FILTER (WHERE strt < $HostBudget), 0) AS BIGINT)
          AS tok_admitted
      FROM adm GROUP BY host ORDER BY host""",

    // Replays the shared line synthesis (header + LineWords-word groups +
    // footer), the per-line document frequency, the >= BoilerDf cut, and
    // the in-order reassembly hash.
    "q98_line_dedup" -> s"""
      WITH d AS (
        SELECT doc_id, source,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
          len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n
        FROM documents),
      c AS (
        SELECT doc_id, ws,
          unnest(range(0, CASE WHEN n = 0 THEN 0
                               ELSE (n + ${LineWords - 1}) // $LineWords END)) AS ci
        FROM d),
      content AS (
        SELECT doc_id, ci + 1 AS li,
          array_to_string(ws[ci*$LineWords+1 : ci*$LineWords+$LineWords], ' ') AS line
        FROM c),
      hdr AS (SELECT doc_id, 0 AS li, 'hdr ' || source || ' subscribe now' AS line FROM d),
      foot AS (SELECT doc_id, 1000000 AS li,
        'foot ' || source || ' all rights reserved' AS line FROM d),
      lines AS (
        SELECT * FROM hdr UNION ALL SELECT * FROM content UNION ALL SELECT * FROM foot),
      boiler AS (
        SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= $BoilerDf),
      f AS (
        SELECT l.doc_id, l.li, l.line, (b.line IS NOT NULL) AS is_boiler
        FROM lines l LEFT JOIN boiler b USING (line))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS lines_total,
        CAST(count(*) FILTER (WHERE NOT is_boiler) AS BIGINT) AS lines_kept,
        ${TextOps.polyHashSql(
          "coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END, ' | ' ORDER BY li), '')")}
          AS clean_hash
      FROM f GROUP BY doc_id ORDER BY doc_id""",

    // Replays every training iteration: weighted pair counts over the
    // double-space segmentation, the argmax with the same tie-break, the
    // boundary-safe merge, and the post-merge corpus token count. The
    // iteration blocks are generated by the same loop bound the Spark
    // side runs, so the two sides can never disagree on length.
    "q99_bpe_train" -> {
      val trajectoryBlocks = (1 to BpeTrainIters).map { i =>
        s""",
      t$i AS (
        SELECT CAST($i AS BIGINT) AS merge_rank, b.pair, b.cnt,
          (SELECT CAST(sum(f * len(s)) AS BIGINT) FROM v$i) AS corpus_tokens
        FROM b$i b)"""
      }.mkString
      val unions = (1 to BpeTrainIters)
        .map(i => s"SELECT merge_rank, pair, cnt, corpus_tokens FROM t$i")
        .mkString(" UNION ALL ")
      s"""
      WITH ${bpeTrainCtes(carry = "")}$trajectoryBlocks
      $unions ORDER BY merge_rank"""
    },

    // The same training chain carrying the word, then per-word token
    // counts joined back to the exploded corpus — replays q112 exactly.
    "q112_bpe_encode" -> s"""
      WITH ${bpeTrainCtes(carry = "w, ")},
      enc AS (SELECT w, CAST(len(s) AS BIGINT) AS n_sym FROM v$BpeTrainIters)
      SELECT ws.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(e.n_sym) AS BIGINT) AS bpe_tokens
      FROM ws JOIN enc e ON ws.w = e.w
      GROUP BY ws.doc_id
      ORDER BY ws.doc_id""",

    // Replays the shared paragraph synthesis (promo + ParaWords-word
    // groups), the first-global-occurrence election by (doc_id, pi), and
    // the in-order reassembly hash.
    "q141_para_dedup" -> s"""
      WITH d AS (
        SELECT doc_id, source,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
          len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n
        FROM documents),
      c AS (
        SELECT doc_id, ws,
          unnest(range(0, CASE WHEN n = 0 THEN 0
                               ELSE (n + ${ParaWords - 1}) // $ParaWords END)) AS ci
        FROM d),
      content AS (
        SELECT doc_id, ci + 1 AS pi,
          array_to_string(ws[ci*$ParaWords+1 : ci*$ParaWords+$ParaWords], ' ') AS para
        FROM c),
      promo AS (SELECT doc_id, 0 AS pi,
        'promo ' || source || ' visit our network today' AS para FROM d),
      paras AS (
        SELECT * FROM promo UNION ALL SELECT * FROM content),
      r AS (
        SELECT doc_id, pi, para,
          row_number() OVER (PARTITION BY para ORDER BY doc_id, pi) AS rn
        FROM paras)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS paras_total,
        CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS paras_kept,
        ${TextOps.polyHashSql(
          "coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' | ' ORDER BY pi), '')")}
          AS clean_hash
      FROM r GROUP BY doc_id ORDER BY doc_id""",

    // Replays the alpha=0.5 weights (sqrt — correctly-rounded IEEE in both
    // engines), the decimal-exact weight normalizer, the floor'd targets,
    // and the content-hash-order admission, op-for-op.
    "q142_temp_mixture" -> s"""
      WITH d AS (
        SELECT doc_id, source, ${wsTokenCountSql("text")} AS n_tokens,
          ${TextOps.polyHashSql("text")} AS ohash
        FROM documents),
      s AS (
        SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM d GROUP BY source),
      w AS (SELECT source, src_tokens, sqrt(src_tokens::DOUBLE) AS w FROM s),
      tot AS (
        SELECT ${graft.util.Sumd.SUMD("w")} AS sumw,
          CAST(sum(src_tokens) AS BIGINT) AS total_tokens
        FROM w),
      tgt AS (
        SELECT source,
          CAST(floor((total_tokens // $TempBudgetDiv)::DOUBLE * w / sumw) AS BIGINT)
            AS target
        FROM w, tot),
      adm AS (
        SELECT d.doc_id, d.source, d.n_tokens, t.target,
          sum(d.n_tokens) OVER (PARTITION BY d.source ORDER BY d.ohash, d.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - d.n_tokens AS strt
        FROM d JOIN tgt t USING (source))
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        max(target) AS target,
        CAST(count(*) FILTER (WHERE strt < target) AS BIGINT) AS n_admitted,
        CAST(coalesce(sum(n_tokens) FILTER (WHERE strt < target), 0) AS BIGINT)
          AS tok_admitted
      FROM adm GROUP BY source ORDER BY source""",

    // q142's arithmetic at full budget, plus the epoch replication and the
    // admission over the (epoch, ohash, doc_id)-ordered replicated stream.
    "q146_epoch_mixture" -> s"""
      WITH d AS (
        SELECT doc_id, source, ${wsTokenCountSql("text")} AS n_tokens,
          ${TextOps.polyHashSql("text")} AS ohash
        FROM documents),
      s AS (
        SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM d GROUP BY source),
      w AS (SELECT source, src_tokens, sqrt(src_tokens::DOUBLE) AS w FROM s),
      tot AS (
        SELECT ${graft.util.Sumd.SUMD("w")} AS sumw,
          CAST(sum(src_tokens) AS BIGINT) AS total_tokens
        FROM w),
      tgt AS (
        SELECT source, src_tokens,
          CAST(floor((total_tokens // 1)::DOUBLE * w / sumw) AS BIGINT) AS target
        FROM w, tot),
      e AS (
        SELECT source, target,
          greatest((target + src_tokens - 1) // greatest(src_tokens, 1), 1) AS epochs
        FROM tgt),
      x AS (
        SELECT d.doc_id, d.source, d.n_tokens, d.ohash, e.target,
          unnest(range(0, e.epochs)) AS epoch
        FROM d JOIN e USING (source)),
      adm AS (
        SELECT *,
          sum(n_tokens) OVER (PARTITION BY source ORDER BY epoch, ohash, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS strt
        FROM x)
      SELECT source, CAST(count(*) AS BIGINT) AS n_copies,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tok_admitted,
        CAST(max(epoch) AS BIGINT) AS max_epoch
      FROM adm WHERE strt < target
      GROUP BY source ORDER BY source""",

    // Ground truth by the naive three-way join over the shared synthetic
    // edge list — the degree-oriented plan must count the same triangles.
    "q151_triangles" -> """
      WITH d AS (SELECT doc_id AS dd FROM documents),
      raw AS (
        SELECT dd AS a, dd + 1 AS b FROM d
        UNION ALL SELECT dd, dd + 2 FROM d WHERE dd % 2 = 0
        UNION ALL SELECT dd % 97, dd FROM d WHERE dd >= 97),
      e AS (
        SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        FROM raw WHERE least(a, b) <> greatest(a, b)),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM
        (SELECT a AS id FROM e UNION SELECT b FROM e)),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
      SELECT n_nodes, n_edges, n_triangles FROM n, m, t""",

    // Replays the full surgery: positional gram hashes (lateral unnest —
    // no lambda, so no variable-capture hazard with the polyhash fold),
    // first-occurrence election, seed intervals, strict island merge,
    // complement segments, ordered splice, hash.
    "q150_substring_removal" -> s"""
      WITH occ AS (
        SELECT doc_id, CAST(gi AS BIGINT) AS p,
          ${TextOps.polyHashSql(s"substring(text, CAST(gi AS INT), $SubRemK)")} AS h
        FROM documents,
          unnest(range(1, greatest(length(text) - ${SubRemK - 2}, 1))) AS u(gi)),
      r AS (
        SELECT doc_id, p,
          row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn,
          count(*) OVER (PARTITION BY h) AS cnt
        FROM occ),
      seeds AS (
        SELECT doc_id, p AS s, p + ${SubRemK - 1} AS e
        FROM r WHERE cnt >= 2 AND rn > 1),
      isl0 AS (
        SELECT doc_id, s, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        FROM seeds),
      isl1 AS (
        SELECT doc_id, s, e,
          CASE WHEN prevmax IS NULL OR s > prevmax THEN 1 ELSE 0 END AS newisl
        FROM isl0),
      isl2 AS (
        SELECT doc_id, s, e,
          sum(newisl) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM isl1),
      islands AS (
        SELECT doc_id, isl, min(s) AS i_s, max(e) AS i_e
        FROM isl2 GROUP BY 1, 2),
      before_ AS (
        SELECT doc_id,
          coalesce(lag(i_e) OVER (PARTITION BY doc_id ORDER BY i_s) + 1, 1) AS f,
          i_s - 1 AS t
        FROM islands),
      tails AS (
        SELECT i.doc_id, max(i.i_e) + 1 AS f, length(any_value(d.text))::BIGINT AS t,
          CAST(sum(i.i_e - i.i_s + 1) AS BIGINT) AS removed
        FROM islands i JOIN documents d USING (doc_id)
        GROUP BY i.doc_id),
      segs AS (
        SELECT doc_id, f, t FROM before_ WHERE f <= t
        UNION ALL SELECT doc_id, f, t FROM tails WHERE f <= t)
      SELECT d.doc_id, length(d.text)::BIGINT AS chars_total,
        CAST(coalesce(any_value(tl.removed), 0) AS BIGINT) AS chars_removed,
        ${TextOps.polyHashSql(
          """CASE WHEN any_value(tl.removed) IS NULL THEN d.text
               ELSE coalesce(string_agg(substring(d.text, CAST(s.f AS INT),
                 CAST(s.t - s.f + 1 AS INT)), '' ORDER BY s.f), '') END""")}
          AS clean_hash
      FROM documents d
      LEFT JOIN segs s USING (doc_id)
      LEFT JOIN tails tl USING (doc_id)
      GROUP BY d.doc_id, d.text
      ORDER BY d.doc_id"""
  )

  /** The q99/q112 shared oracle chain: word split → frequency vocab →
    * char segmentation → [[BpeTrainIters]] (pair-count, argmax, fenced
    * merge) rounds. `carry` prefixes extra vocab columns ("w, " keeps the
    * word through the chain for q112's per-word application). */
  private def bpeTrainCtes(carry: String, from: String = "documents"): String = {
    val iterBlocks = (1 to BpeTrainIters).map { i =>
      s""",
      p$i AS (
        SELECT s[CAST(j AS INT)] || ' ' || s[CAST(j AS INT) + 1] AS pair,
          CAST(sum(f) AS BIGINT) AS cnt
        FROM (SELECT s, f, unnest(range(1, CAST(len(s) AS BIGINT))) AS j
              FROM v${i - 1} WHERE len(s) >= 2) x$i
        GROUP BY 1),
      b$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
      v$i AS (
        SELECT ${carry}f, string_split(trim(replace(
            ' ' || array_to_string(s, '  ') || ' ',
            ' ' || replace(b.pair, ' ', '  ') || ' ',
            ' ' || replace(b.pair, ' ', '') || ' ')), '  ') AS s
        FROM v${i - 1}, b$i b)"""
    }.mkString
    s"""ws AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM $from),
      vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS f FROM ws GROUP BY w),
      v0 AS (
        SELECT ${carry}f, list_transform(range(1, length(w) + 1),
          i -> substring(w, CAST(i AS INT), 1)) AS s
        FROM vocab)$iterBlocks"""
  }
}
