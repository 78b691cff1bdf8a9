package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * exact dedup, token counting, quality stats, language ID, document
  * fingerprinting, JSON extraction.
  *
  * The reference (chenm11/mysql-hbase-replicator) has no text operators —
  * these extend the engine per the rebuild's north star. All are pure
  * DataFrame transforms: narrow per-row work (codegen'd higher-order
  * functions, no UDFs) followed by a single hash aggregation, so every query
  * scales linearly with the document count and shuffles only the (small)
  * aggregate.
  *
  * Cross-engine determinism: every hash used here is either a standard
  * digest (sha2/md5, identical hex in DuckDB) or [[TextOps.polyHash]], a
  * 31-base polynomial rolling hash mod 1e9+7 — both expressible in DuckDB
  * SQL so the oracles match bit-for-bit.
  */
object TextOps {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private def sumd(c: Column): Column = graft.util.Sumd.sumd(c)
  private def SUMD(e: String): String = graft.util.Sumd.SUMD(e)

  val HashMod = 1000000007L

  /** Portable polynomial rolling hash: fold over characters,
    * `acc = (acc*31 + code) mod 1e9+7`. Bounded at ~2^36 intermediate, so no
    * overflow in either engine's signed 64-bit arithmetic. Backed by the
    * native codegen expression [[graft.functions.PolyHash]] (the session
    * must have it registered — query entry points call
    * `PolyHash.register`). */
  def polyHash(s: Column): Column = polyHash(s, 31)

  /** [[polyHash]] with an explicit multiplier — the q127 count-min rows use
    * distinct prime bases as their pairwise-independent-ish hash family. */
  def polyHash(s: Column, base: Int): Column =
    call_function("graft_polyhash", s, lit(base), lit(HashMod))

  /** Same fold, as a DuckDB SQL fragment over string expression `e`. */
  def polyHashSql(e: String): String = polyHashSql(e, 31)

  def polyHashSql(e: String, base: Int): String =
    s"""list_reduce(
          list_prepend(0::BIGINT,
            list_transform(range(1, length($e)+1), i -> ord(substring($e, i, 1))::BIGINT)),
          (acc, c) -> (acc*$base + c) % ${HashMod})"""

  /** Poor-man's let-binding: evaluate `value` once per row, reference it many
    * times in `body`. Higher-order-function lambda variables are bound by
    * value, so this stops Catalyst's projection collapse from inlining (and
    * re-evaluating) an expensive subexpression at every reference — HOFs run
    * interpreted, where duplicated subtrees are real repeated work. */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Character k-shingles (distinct); empty array for text shorter than k
    * (an unguarded `sequence(1, len-k+1)` would run DESCENDING when the
    * stop is below 1 and emit garbage shingles). */
  def shingles(s: Column, k: Int): Column =
    when(length(s) >= k,
      array_distinct(transform(sequence(lit(1), length(s) - (k - 1)), i => s.substr(i, lit(k)))))
      .otherwise(typedLit(Seq.empty[String]))

  def shinglesSql(e: String, k: Int): String =
    s"list_distinct(list_transform(range(1, length($e)-${k - 2}), i -> substring($e, i, $k)))"

  /** Lowercase word tokens — regexp-based so empty-token semantics can't
    * diverge between engines. */
  def words(s: Column): Column = regexp_extract_all(lower(s), lit("[a-z0-9]+"), lit(0))
  private def wordsSql(e: String): String = s"regexp_extract_all(lower($e), '[a-z0-9]+')"

  // Deterministic per-language marker vocabularies for the lang-ID heuristic
  // (chosen from the corpus vocabulary so scores actually vary per doc).
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("query", "window", "merge", "batch"),
    "es" -> Seq("data", "row", "value", "line"),
    "zh" -> Seq("spark", "table", "key", "hash"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** q239's decoration: DECOMPOSED accents (e + U+0301, a + U+0300) and
    * doubled whitespace — the ONE Scala constant interpolates into both
    * the Spark plan and the DuckDB oracle text, so both engines normalize
    * byte-identical input. */
  private[graft] val NormPrefix = "Café  du  Marché à gogo — "

  /** q175 admission cut: a doc survives when its within-source quality
    * percent_rank is at or above this (every source contributes its best
    * 30%). Shared by the Spark plan and the oracle. */
  val CalibAdmit = 0.7

  /** Per-document quality score (q49's blend), factored so pipeline
    * compositions (q91's quality-based survivor selection) provably rank
    * by the SAME score the quality gate exports. Returns (doc_id,
    * quality); narrow projection, embarrassingly parallel. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val d = docs
      .repartition(col("doc_id")) // spread CPU-heavy narrow work
      .withColumn("ws", words(col("text")))
      .withColumn("n_words", size(col("ws")).cast("double"))
      .withColumn("n_distinct", size(array_distinct(col("ws"))).cast("double"))
      .withColumn("n_stop",
        size(filter(col("ws"), w => array_contains(array(stopwords.map(lit): _*), w)))
          .cast("double"))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double"))
    d.select(col("doc_id"),
      (least(col("n_words") / 100.0, lit(1.0)) * 0.25
        + (lit(1.0) - least(col("n_punct") / length(col("text")) * 5.0, lit(1.0))) * 0.25
        + least(col("n_stop") / col("n_words") * 10.0, lit(1.0)) * 0.25
        + (col("n_distinct") / col("n_words")) * 0.25).as("quality"))
  }

  /** The oracle-side mirror of [[qualityScore]] — one definition feeding
    * both the q49 gate and q91's survivor ranking. */
  def qualitySql(rel: String): String = s"""
      SELECT doc_id,
        least(n_words / 100.0, 1.0) * 0.25
          + (1.0 - least(n_punct / length(text) * 5.0, 1.0)) * 0.25
          + least(n_stop / n_words * 10.0, 1.0) * 0.25
          + (n_distinct / n_words) * 0.25 AS quality
      FROM (
        SELECT doc_id, text,
          len(regexp_extract_all(lower(text), '[a-z0-9]+'))::DOUBLE AS n_words,
          len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))::DOUBLE AS n_distinct,
          len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              w -> list_contains(['the','a','of','and','to','in'], w)))::DOUBLE AS n_stop,
          length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE AS n_punct
        FROM $rel)"""

  // ---- q90 PII scrubbing: patterns shared between the Spark plan and the
  //      oracle (simple enough that Java regex and DuckDB's RE2 agree).
  //      The corpus is synthetic word soup, so PII is PLANTED
  //      deterministically (every 3rd doc gains an email + phone suffix
  //      derived from doc_id) — the gate then checks real redactions, real
  //      counts, and ZERO false positives on the untouched docs.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** Redact emails / phone numbers / IPv4s from `text` (narrow, no
    * shuffle): columns (doc_id, n_emails, n_phones, n_ips, scrub_len,
    * scrub_sha). */
  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")
    docs
      .repartition(col("doc_id")) // spread CPU-heavy narrow work
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all(col("text"), lit(IpRe), lit(0))).cast("long").as("n_ips"),
        length(scrubbed).cast("long").as("scrub_len"),
        substring(sha2(scrubbed, 256), 1, 16).as("scrub_sha"))
  }

  /** Bigram-LM quality scoring — the CCNet-style language-model quality
    * filter (Wenzek et al. 2020, public recipe: score every document with
    * an n-gram LM trained on a trusted corpus, then bucket the corpus into
    * head/middle/tail by score terciles). `train` fits an add-one-smoothed
    * bigram model; `score` documents get the arithmetic mean of their
    * token-level smoothed bigram probabilities
    * P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V), computed uniformly for seen AND
    * unseen grams (an OOV pair degrades to 1/(c(w1)+V), an OOV context to
    * 1/V — add-one's own backoff, no special-casing). The canonical
    * presentation is geometric (perplexity = exp of the mean NEGATIVE log
    * prob); the arithmetic mean is used here because it needs no
    * transcendental (log/exp) whose last-ulp rounding is not guaranteed
    * identical across engines — the ranking signal (high = fluent
    * in-domain text, low = OOV-heavy/disfluent) is the same direction, and
    * every op used (integer-count double division, decimal-exact sum) is
    * bit-reproducible cross-engine, so the gate can hash-compare.
    *
    * The per-term sum runs at the engine-wide DECIMAL(18,6) convention
    * ([[graft.util.Sumd.sumd]]), NOT sumdHi's scale 18: DuckDB evaluates
    * both double<->decimal casts through double arithmetic (round(p*10^s)
    * on the way in, int128/10^s on the way out), so cast agreement with
    * Spark's string-based path needs the scaled integers to stay well
    * inside double's 2^53 exactness — true at scale 6 for probability
    * sums, violated at scale 18 (observed: +-1-ulp score drift on 24% of
    * docs). Scale 6 keeps ~5 significant digits of a ~0.03-magnitude
    * score — far beyond what a corpus-bucketing signal needs.
    *
    * Scale shape: the model is VOCABULARY-scale (bigram/context types, not
    * corpus tokens), built as partial+final aggs; scoring is TWO left
    * equi-joins of corpus bigram occurrences against the type tables
    * (AQE-broadcastable when the vocab is small; plain shuffle joins
    * otherwise — never all-pairs), V rides in one broadcast row, and the
    * per-doc reduce is a partial+final agg. Columns:
    * (doc_id, n_bigrams, lm_score) — lm_score NULL for sub-2-token docs. */
  def lmScore(train: DataFrame, score: DataFrame): DataFrame = {
    def bigrams(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tbg = bigrams(train)
    val c2 = tbg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = tbg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vv = train
      .select(explode(words(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val p = (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")
    val perDoc = bigrams(score)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vv))
      .select(col("doc_id"), p.as("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sumd(col("p")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sp") / col("n_bigrams").cast("double")).as("lm_score"))
    score.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("lm_score"))
  }

  /** Supervised two-class token-likelihood classifier — the TRAINABLE
    * quality/domain filter beside the hard-coded heuristics (q44's marker
    * vocab, q49's rules): Laplace-smoothed per-class unigram likelihoods
    * (the Naive Bayes model family; McCallum & Nigam 1998) trained on a
    * labeled split, scored by LINEAR POOLING (each class's prior times the
    * doc's MEAN smoothed token probability) rather than the log-sum — the
    * arithmetic stays inside the engine-wide decimal-exact sum convention
    * ([[graft.util.Sumd]]): a libm `ln` may differ in the last ulp across
    * engines (q59's scaladoc), while per-term division, decimal sum, and
    * the final two multiplies are all correctly-rounded IEEE ops both
    * engines reproduce bit-identically.
    *
    * Scale shape: the MODEL is vocab-sized (per-class token counts via
    * partial+final aggs); scoring is one explode + two left equi-joins on
    * the token (AQE-broadcastable for bounded vocabs, plain shuffle joins
    * otherwise — never all-pairs) + a per-doc partial+final agg; priors,
    * totals and V ride in one broadcast row. Docs with no tokens score
    * NULL (consistently absent evidence, not a silent class). */
  def tokenClassifier(train: DataFrame, test: DataFrame,
      labelCol: Column): DataFrame = {
    val tokTrain = train
      .select(col("doc_id"), labelCol.as("cls"), explode(words(col("text"))).as("w"))
    val counts = tokTrain.groupBy(col("w"), col("cls")).agg(count(lit(1)).as("c"))
    val cPos = counts.filter(col("cls")).select(col("w"), col("c").as("c_pos"))
    val cNeg = counts.filter(!col("cls")).select(col("w"), col("c").as("c_neg"))
    val consts = tokTrain.agg(
        count(when(col("cls"), 1)).as("n_pos"),
        count(when(!col("cls"), 1)).as("n_neg"),
        countDistinct(col("w")).as("v"))
      .crossJoin(train.agg(
        count(when(labelCol, 1)).as("d_pos"), count(lit(1)).as("nd")))
    val perTok = test
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .join(cPos, Seq("w"), "left")
      .join(cNeg, Seq("w"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        ((coalesce(col("c_pos"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_pos") + col("v")).cast("double")).as("p_pos"),
        ((coalesce(col("c_neg"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_neg") + col("v")).cast("double")).as("p_neg"))
    val perDoc = perTok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sumd(col("p_pos")).as("sp_pos"), sumd(col("p_neg")).as("sp_neg"))
    test.select(col("doc_id"), labelCol.as("is_pos"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts.select(col("d_pos"), col("nd"))))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (col("d_pos").cast("double") / col("nd").cast("double") *
          (col("sp_pos") / col("n_tokens").cast("double"))).as("score_pos"),
        ((col("nd") - col("d_pos")).cast("double") / col("nd").cast("double") *
          (col("sp_neg") / col("n_tokens").cast("double"))).as("score_neg"),
        col("is_pos"))
      .withColumn("pred_pos", col("score_pos") > col("score_neg"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- JSON extraction over the events.props JSON column (the reference
    //      stores its entire catalog as JSON; Spark-side: get_json_object).
    "q23_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          count(when($"k" > 50, 1)).as("n_big"))
        .orderBy($"event_type")
    }),

    // ---- Exact dedup by content hash. Input simulates a re-crawl (every doc
    //      delivered twice under a different id); dedup keeps the lowest id
    //      per sha256(text) group. One shuffle on the digest.
    "q40_exact_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val recrawl = docs.select(($"doc_id" + 10000).as("doc_id"), $"text")
      docs.union(recrawl)
        .groupBy(sha2($"text", 256).as("content_sha"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies", substring($"content_sha", 1, 16).as("sha_prefix"))
        .orderBy($"keep_id")
    }),

    // ---- Corpus quality stats per language: doc/char/word counts, stopword
    //      and punctuation ratios. Per-row narrow work + one small agg.
    // UNICODE NORMALIZATION (q239): the pipeline step every byte-level
    // operator here depends on — the same visible string has multiple
    // encodings (composed vs decomposed accents), and shingle hashes /
    // dedup digests see them as different documents unless normalized
    // first. graft_normalize is a native codegen Expression (Spark ships
    // no Unicode normalizer); the form resolves at plan time to one JVM
    // intrinsic call per row. The gate decorates each doc with a
    // DECOMPOSED-accent prefix (shared constant, same bytes both engines):
    // NFC must compose it (shorter), the NFD+strip-marks+NFC chain must
    // equal DuckDB's strip_accents, whitespace collapse is the regexp leg.
    // 100 TB: one narrow projection, no shuffle, whole-stage codegen.
    "q239_normalize" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      def norm(c: Column, f: String): Column =
        call_function("graft_normalize", c, lit(f))
      t(s, dir, "documents")
        .repartition($"doc_id")
        .withColumn("s", concat(lit(NormPrefix), $"text"))
        .select($"doc_id",
          norm($"s", "NFC").as("nfc"),
          length($"s").as("raw_len"),
          length(norm($"s", "NFC")).as("nfc_len"),
          norm(regexp_replace(norm($"s", "NFD"), "\\p{Mn}", ""), "NFC").as("stripped"),
          regexp_replace($"s", "\\s+", " ").as("ws_norm"))
        .orderBy($"doc_id")
    }),

    "q43_text_stats" -> ((s, dir) => {
      import s.implicits._
      val stops = array(stopwords.map(lit): _*)
      val enriched = t(s, dir, "documents")
        .repartition($"doc_id") // spread CPU-heavy narrow work (1-row-group input)
        .withColumn("ws", words($"text"))
        .withColumn("n_words", size($"ws").cast("long"))
        .withColumn("n_stop", size(filter($"ws", w => array_contains(stops, w))).cast("long"))
        .withColumn("n_punct", length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long"))
      enriched.groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          (sumd($"n_chars") / count(lit(1))).as("avg_chars"),
          (sumd($"n_words") / count(lit(1))).as("avg_words"),
          (sumd($"n_stop") / sumd($"n_words")).as("stop_ratio"),
          (sumd($"n_punct") / sumd($"n_chars")).as("punct_ratio"))
        .orderBy($"lang")
    }),

    // ---- Language-ID heuristic: token hits against per-language marker
    //      vocabularies, argmax with fixed tie-break order (en,de,es,zh).
    "q44_lang_id" -> ((s, dir) => {
      import s.implicits._
      val scored = langMarkers.foldLeft(
        t(s, dir, "documents")
          .repartition($"doc_id") // spread CPU-heavy narrow work
          .withColumn("ws", words($"text"))) {
        case (df, (lang, markers)) =>
          val m = array(markers.map(lit): _*)
          df.withColumn(s"s_$lang",
            size(filter($"ws", w => array_contains(m, w))).cast("long"))
      }
      val Seq(en, de, es, zh) = langMarkers.map { case (l, _) => col(s"s_$l") }
      scored
        .withColumn("pred_lang",
          when(en >= de && en >= es && en >= zh, "en")
            .when(de >= es && de >= zh, "de")
            .when(es >= zh, "es")
            .otherwise("zh"))
        .select($"doc_id", $"pred_lang", $"s_en", $"s_de", $"s_es", $"s_zh",
          ($"pred_lang" === $"lang").as("hit"))
        .repartition(1).sortWithinPartitions($"doc_id")
    }),

    // ---- Token counting: whitespace tokens vs a BPE-ish regex segmentation
    //      (letter runs / digit runs / single non-alnum marks).
    "q45_token_count" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .repartition($"doc_id") // spread CPU-heavy narrow work
        .select(
          $"doc_id",
          size(regexp_extract_all($"text", lit("[^ ]+"), lit(0))).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          length($"text").cast("long").as("n_chars_actual"))
        .repartition(1).sortWithinPartitions($"doc_id")
    }),

    // ---- Per-document quality score: bounded blend of length, punctuation
    //      cleanliness, stopword naturalness, and type-token ratio — the
    //      pre-training corpus-filtering heuristic. Pure double arithmetic
    //      in a fixed operation order, so the oracle matches bit-for-bit.
    "q49_quality_score" -> ((s, dir) =>
      qualityScore(t(s, dir, "documents"))
        .repartition(1).sortWithinPartitions(col("doc_id"))),

    // ---- q175: cross-domain score CALIBRATION — raw quality scores are
    //      not comparable across sources (each domain has its own score
    //      distribution; a global threshold would starve hard domains and
    //      flood easy ones), so production filters rank-normalize per
    //      source first: percent_rank of the SHARED q49 quality score
    //      within each source, then one global admission cut — every
    //      domain contributes its best (1 - CalibAdmit) fraction
    //      regardless of absolute score level (the CCNet/quality-filter
    //      bucketing discipline, q113's tercile cousin with a continuous
    //      rank). Scale: one exchange on source, the rank window runs
    //      per-source partition, admission is a per-row compare;
    //      percent_rank's (rank-1)/(n-1) is the same exact division in
    //      both engines (ties share a rank on both sides).
    "q175_score_calibration" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val q = qualityScore(docs).join(docs.select($"doc_id", $"source"), "doc_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"quality")
      q.withColumn("pct", percent_rank().over(w))
        .withColumn("admitted", $"pct" >= lit(CalibAdmit))
        .select($"doc_id", $"source", $"quality", $"pct", $"admitted")
        .repartition(1).sortWithinPartitions($"doc_id")
    }),

    // ---- q90 PII scrubbing: redact emails / phones / IPv4s before a
    //      corpus ships to training — the compliance step of the pipeline.
    //      PII is PLANTED deterministically (the word-soup corpus has
    //      none), so the gate checks real redactions and real counts;
    //      untouched docs double as the false-positive control. Narrow
    //      projection end-to-end: no shuffle at any corpus size.
    "q90_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      val planted = t(s, dir, "documents").select($"doc_id",
        when($"doc_id" % 3 === 0, concat($"text",
            lit(" contact user"), $"doc_id".cast("string"),
            lit("@example.com or 555-"),
            lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
            lit(" from 10.0."), ($"doc_id" % 256).cast("string"), lit(".7")))
          .otherwise($"text").as("text"))
      piiScrub(planted).repartition(1).sortWithinPartitions($"doc_id")
    }),

    // ---- Document fingerprint: min polynomial hash over character
    //      5-shingles (a 1-permutation MinHash — the winnowing primitive).
    "q46_fingerprint" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents")
        .repartition($"doc_id") // spread CPU-heavy narrow work
        .select($"doc_id",
          // fused kernel: min polyhash over char 5-shingles in one codegen'd
          // loop (the transform(shingles) HOF ran interpreted and allocated
          // a substring per window)
          call_function("graft_fingerprint",
            $"text", lit(5), lit(31), lit(HashMod)).as("fingerprint"))
        .repartition(1).sortWithinPartitions($"doc_id")
    }),

    // ---- q113: CCNet-style LM quality filter — self-scored bigram model
    //      (the bootstrap form: when no trusted LM exists yet, the corpus
    //      scores itself and the tails are pruned), bucketed head/middle/
    //      tail at the score TERCILES. The tercile boundaries come from
    //      the distributed sort-based exactQuantiles (q34/q81's engine —
    //      never a global one-task window), broadcast back as one row;
    //      DuckDB mirrors with quantile_cont (bit-identical R-7
    //      interpolation, proven by q34) and the same strict-> CASE chain
    //      so boundary ties bucket identically.
    "q113_lm_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = lmScore(docs, docs)
      val bounds = graft.operators.Advanced.exactQuantiles(
        scored.withColumn("_all", lit(1)), "_all", "lm_score",
        Seq("b1" -> 1.0 / 3, "b2" -> 2.0 / 3))
      scored.crossJoin(broadcast(bounds.drop("_all")))
        .select(col("doc_id"), col("n_bigrams"), col("lm_score"),
          when(col("lm_score").isNull, lit(null).cast("string"))
            .when(col("lm_score") > col("b2"), lit("head"))
            .when(col("lm_score") > col("b1"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q117: TRAINED quality/domain classifier (tokenClassifier): NB
    //      family, Laplace-smoothed per-class unigram likelihoods learned
    //      on the even-doc_id half (a contamination-safe train/test
    //      split), linear-pooled scores on the odd half. The oracle
    //      retrains the identical model in SQL — wrong counts, smoothing,
    //      priors, split, or pooling all break the hash.
    "q117_token_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      tokenClassifier(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("lang") === "en")
        .repartition(1).sortWithinPartitions(col("doc_id"))
    })
  )

  private val markersSql: Map[String, String] =
    langMarkers.map { case (l, ms) => l -> ms.map(m => s"'$m'").mkString("[", ",", "]") }.toMap

  val oracles: Map[String, String] = Map(
    "q23_json_extract" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_big
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    "q40_exact_dedup" -> """
      SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        SUBSTRING(sha256(text), 1, 16) AS sha_prefix
      FROM (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 10000, text FROM documents)
      GROUP BY sha256(text)
      ORDER BY keep_id""",

    // q239: DuckDB's nfc_normalize / strip_accents / regexp_replace over
    // the SAME decorated bytes (NormPrefix interpolates verbatim).
    "q239_normalize" -> s"""
      WITH dec AS (
        SELECT doc_id, '$NormPrefix' || text AS s FROM documents)
      SELECT doc_id,
        nfc_normalize(s) AS nfc,
        CAST(length(s) AS INT) AS raw_len,
        CAST(length(nfc_normalize(s)) AS INT) AS nfc_len,
        strip_accents(nfc_normalize(s)) AS stripped,
        regexp_replace(s, '\\s+', ' ', 'g') AS ws_norm
      FROM dec ORDER BY doc_id""",

    "q43_text_stats" -> s"""
      WITH d AS (
        SELECT lang, n_chars,
          len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
          len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              w -> list_contains(['the','a','of','and','to','in'], w))) AS n_stop,
          length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        ${SUMD("n_chars")} / COUNT(*) AS avg_chars,
        ${SUMD("n_words")} / COUNT(*) AS avg_words,
        ${SUMD("n_stop")} / ${SUMD("n_words")} AS stop_ratio,
        ${SUMD("n_punct")} / ${SUMD("n_chars")} AS punct_ratio
      FROM d
      GROUP BY lang
      ORDER BY lang""",

    "q44_lang_id" -> s"""
      WITH scored AS (
        SELECT doc_id, lang,
          len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              w -> list_contains(${markersSql("en")}, w))) AS s_en,
          len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              w -> list_contains(${markersSql("de")}, w))) AS s_de,
          len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              w -> list_contains(${markersSql("es")}, w))) AS s_es,
          len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              w -> list_contains(${markersSql("zh")}, w))) AS s_zh
        FROM documents)
      SELECT doc_id,
        CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_es >= s_zh THEN 'es'
             ELSE 'zh' END AS pred_lang,
        s_en, s_de, s_es, s_zh,
        (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_zh THEN 'en'
              WHEN s_de >= s_es AND s_de >= s_zh THEN 'de'
              WHEN s_es >= s_zh THEN 'es'
              ELSE 'zh' END) = lang AS hit
      FROM scored
      ORDER BY doc_id""",

    "q45_token_count" -> """
      SELECT doc_id,
        len(regexp_extract_all(text, '[^ ]+')) AS n_ws_tokens,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
        length(text) AS n_chars_actual
      FROM documents
      ORDER BY doc_id""",

    "q49_quality_score" -> s"""
      SELECT doc_id, quality FROM (${qualitySql("documents")})
      ORDER BY doc_id""",

    "q175_score_calibration" -> s"""
      WITH q AS (${qualitySql("documents")}),
      j AS (
        SELECT q.doc_id, d.source, q.quality
        FROM q JOIN documents d ON d.doc_id = q.doc_id),
      r AS (
        SELECT doc_id, source, quality,
          percent_rank() OVER (PARTITION BY source ORDER BY quality) AS pct
        FROM j)
      SELECT doc_id, source, quality, pct,
        pct >= $CalibAdmit::DOUBLE AS admitted
      FROM r ORDER BY doc_id""",

    "q90_pii_scrub" -> s"""
      WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN
            text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
          ELSE text END AS text
        FROM documents),
      scrubbed AS (
        SELECT doc_id, text,
          regexp_replace(regexp_replace(regexp_replace(text,
            '$EmailRe', '<EMAIL>', 'g'),
            '$PhoneRe', '<PHONE>', 'g'),
            '$IpRe', '<IP>', 'g') AS clean
        FROM planted)
      SELECT doc_id,
        len(regexp_extract_all(text, '$EmailRe'))::BIGINT AS n_emails,
        len(regexp_extract_all(text, '$PhoneRe'))::BIGINT AS n_phones,
        len(regexp_extract_all(text, '$IpRe'))::BIGINT AS n_ips,
        length(clean)::BIGINT AS scrub_len,
        substring(sha256(clean), 1, 16) AS scrub_sha
      FROM scrubbed
      ORDER BY doc_id""",

    "q46_fingerprint" -> s"""
      SELECT doc_id,
        list_min(list_transform(${shinglesSql("text", 5)}, sh -> ${polyHashSql("sh")})) AS fingerprint
      FROM documents
      ORDER BY doc_id""",

    // The identical op tree to lmScore + the tercile CASE: integer type
    // counts, (c2+1)/(c1+V) as double division, DECIMAL(18,6) sum (see
    // lmScore's scaladoc for why NOT scale 18), score terciles via
    // quantile_cont (R-7, bit-identical to exactQuantiles — proven by
    // q34), strict-> bucketing.
    "q113_lm_quality" -> s"""
      WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM d WHERE len(ws) >= 2)),
      c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
      vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
             FROM (SELECT unnest(ws) AS w FROM d)),
      scored AS (
        SELECT bg.doc_id,
          (COALESCE(c2.c2, 0) + 1)::DOUBLE / (COALESCE(c1.c1, 0) + vv.v)::DOUBLE AS p
        FROM bg
        LEFT JOIN c2 USING (w1, w2)
        LEFT JOIN c1 USING (w1)
        CROSS JOIN vv),
      per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          ${SUMD("p")} AS sp
        FROM scored GROUP BY doc_id),
      sc AS (
        SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
          per.sp / CAST(per.n_bigrams AS DOUBLE) AS lm_score
        FROM d LEFT JOIN per USING (doc_id)),
      b AS (SELECT quantile_cont(lm_score, ${1.0 / 3}) AS b1,
                   quantile_cont(lm_score, ${2.0 / 3}) AS b2 FROM sc)
      SELECT sc.doc_id, sc.n_bigrams, sc.lm_score,
        CASE WHEN sc.lm_score IS NULL THEN NULL
             WHEN sc.lm_score > b.b2 THEN 'head'
             WHEN sc.lm_score > b.b1 THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM sc CROSS JOIN b
      ORDER BY sc.doc_id""",

    // q117: the oracle RETRAINS the classifier — same split, same Laplace
    // smoothing, same decimal-exact linear pooling, same priors.
    "q117_token_classifier" -> s"""
      WITH train AS (
        SELECT doc_id, (lang = 'en') AS cls, text FROM documents WHERE doc_id % 2 = 0),
      test AS (
        SELECT doc_id, (lang = 'en') AS is_pos, text FROM documents WHERE doc_id % 2 = 1),
      tok_train AS (
        SELECT cls, unnest(${wordsSql("text")}) AS w FROM train),
      counts AS (SELECT w, cls, COUNT(*) AS c FROM tok_train GROUP BY w, cls),
      consts AS (
        SELECT
          (SELECT COUNT(*) FROM tok_train WHERE cls) AS n_pos,
          (SELECT COUNT(*) FROM tok_train WHERE NOT cls) AS n_neg,
          (SELECT COUNT(DISTINCT w) FROM tok_train) AS v,
          (SELECT COUNT(*) FROM train WHERE cls) AS d_pos,
          (SELECT COUNT(*) FROM train) AS nd),
      tok_test AS (
        SELECT doc_id, unnest(${wordsSql("text")}) AS w FROM test),
      per_tok AS (
        SELECT tt.doc_id,
          CAST(COALESCE(cp.c, 0) + 1 AS DOUBLE) / CAST(k.n_pos + k.v AS DOUBLE) AS p_pos,
          CAST(COALESCE(cn.c, 0) + 1 AS DOUBLE) / CAST(k.n_neg + k.v AS DOUBLE) AS p_neg
        FROM tok_test tt
        CROSS JOIN consts k
        LEFT JOIN counts cp ON cp.w = tt.w AND cp.cls
        LEFT JOIN counts cn ON cn.w = tt.w AND NOT cn.cls),
      per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          ${SUMD("p_pos")} AS sp_pos, ${SUMD("p_neg")} AS sp_neg
        FROM per_tok GROUP BY doc_id)
      SELECT t.doc_id,
        COALESCE(d.n_tokens, 0) AS n_tokens,
        CAST(k.d_pos AS DOUBLE) / CAST(k.nd AS DOUBLE) *
          (d.sp_pos / CAST(d.n_tokens AS DOUBLE)) AS score_pos,
        CAST(k.nd - k.d_pos AS DOUBLE) / CAST(k.nd AS DOUBLE) *
          (d.sp_neg / CAST(d.n_tokens AS DOUBLE)) AS score_neg,
        t.is_pos,
        (CAST(k.d_pos AS DOUBLE) / CAST(k.nd AS DOUBLE) *
          (d.sp_pos / CAST(d.n_tokens AS DOUBLE))) >
        (CAST(k.nd - k.d_pos AS DOUBLE) / CAST(k.nd AS DOUBLE) *
          (d.sp_neg / CAST(d.n_tokens AS DOUBLE))) AS pred_pos
      FROM test t CROSS JOIN consts k LEFT JOIN per_doc d USING (doc_id)
      ORDER BY t.doc_id"""
  )
}
