package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding
  * float[64], label) — the ANN block of the training-data-pipeline
  * extension:
  *
  *  - q50 brute-force exact cosine top-k for a fixed query set: the
  *    baseline every ANN variant is measured against. Scales as
  *    O(queries x corpus) with the corpus side streamed — the right shape
  *    when the query set is small and broadcast.
  *  - q51 sign-LSH (random-hyperplane) bucketed top-k with multi-probe:
  *    each vector gets a 12-bit sign code; a query probes its own bucket
  *    plus all Hamming-1 buckets (13 of 4096), exact-reranks candidates.
  *    This is the 100 TB shape: candidate generation is a hash-bucket
  *    equi-join touching ~0.3% of the corpus per query, never all-pairs.
  *  - q52 embedding near-dup pairs: a self-union with deterministically
  *    rescaled copies plants cos~1.0 duplicates; 2 independent 12-bit
  *    sign-LSH tables generate candidates (P(miss | cos~1) ~ 1e-6,
  *    P(collide | background cos~0.1) ~ 1e-3), then exact cosine >= 0.99
  *    verification. The oracle is the exact all-pairs answer.
  *
  * Cross-engine float discipline: every cosine that appears in an output
  * column is computed as an index-order left fold over doubles — the same
  * IEEE operation sequence DuckDB's oracle fold runs, so values (and
  * therefore ranks) are bit-identical. Internal-only filters (q52) may use
  * any cosine implementation since the planted/background margin
  * (0.99 vs 0.55) dwarfs engine rounding.
  */
object Similarity {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val TopK = 5
  val NumQueries = 10 // query set = vec_id < 10

  /** q172 matryoshka geometry: truncate embeddings to their first
    * [[MrlDims]] components and renormalize (Kusupati et al. NeurIPS
    * 2022's MRL inference trick — serve a cheap prefix, escalate to full
    * dims only when needed); report the top-[[MrlTopK]] under the
    * TRUNCATED metric with their full-dim cosines and full-top-k
    * membership, the fidelity surface an MRL deployment monitors. */
  val MrlDims = 16
  val MrlTopK = 20
  /** q180 MMR geometry: candidate pool per query, greedy picks, and the
    * relevance/diversity mix (lam + mu = 1; BOTH are explicit constants —
    * `1 - 0.7` in IEEE is 0.30000000000000004, NOT the 0.3 a SQL literal
    * parses to, so deriving mu would silently desynchronize the engines). */
  val MmrPool = 16
  val MmrK = 5
  val MmrLam = 0.7
  val MmrMu = 0.3

  val LshBits = 12
  val DedupCos = 0.99
  val SemCos = 0.9 // q118 semantic-dup threshold (scaled copies sit at ~1.0)
  val DedupTables = 2
  val IvfCells = 16 // coarse-quantizer cells (q53); also the PQ codebook size (q125)
  val PqM = 8       // product-quantization subspaces (q125)
  val PqSub = 8     // dims per subspace (64 / PqM)
  val IvfProbes = 4 // cells probed per query
  /** q190's tuning sweep: nprobe values whose recall/cost curve the gate
    * reports (IvfProbes = 4 sits inside it — the sweep is how that knob
    * gets picked in the first place). */
  val IvfSweep = Seq(1, 2, 4, 8)

  /** Index-order double dot product — bit-identical to the oracle's fold;
    * backed by the native codegen kernel [[graft.functions.DotProduct]]
    * (query entry points register it). */
  private[graft] def dotd(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  private[graft] def cosd(a: Column, na: Column, b: Column, nb: Column): Column =
    dotd(a, b) / (na * nb)

  /** DuckDB fragment: same fold. */
  private[graft] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
        (acc, v) -> acc + v)"""

  // -- ColBERT-style MaxSim pieces (q243 brute pass, q249 two-stage
  //    re-rank): the fixed 4x16 segment decomposition, per-segment norms,
  //    and the ((g0+g1)+g2)+g3 fold — ONE definition for every gate that
  //    scores MaxSim, so the brute baseline and the candidate re-rank
  //    cannot drift (Khattab & Zaharia, SIGIR 2020).
  private[graft] val MaxSimSegs = 4
  private[graft] val MaxSimDim = 16

  private[graft] def maxSimSub(c: Column, i: Int): Column =
    slice(c, i * MaxSimDim + 1, MaxSimDim)

  /** Adds per-segment norms `<p>n0..n3` of the embedding column `<p>e`. */
  private[graft] def withSubNorms(df: DataFrame, p: String): DataFrame =
    (0 until MaxSimSegs).foldLeft(df)((d, i) =>
      d.withColumn(s"${p}n$i",
        sqrt(dotd(maxSimSub(col(s"${p}e"), i), maxSimSub(col(s"${p}e"), i)))))

  /** The whole MaxSim as ONE codegen'd projection over columns
    * (qe, qn0..3, te, tn0..3): 16 fixed graft_dot kernel calls,
    * greatest() per query segment, additions in a FIXED fold order so the
    * double sum is bit-identical cross-engine — no explode, no
    * per-sub-vector shuffle. */
  private[graft] def maxSimCol: Column = {
    def cosij(i: Int, j: Int): Column = {
      val den = col(s"qn$i") * col(s"tn$j")
      when(den === 0.0, lit(0.0))
        .otherwise(dotd(maxSimSub(col("qe"), i), maxSimSub(col("te"), j)) / den)
    }
    def gi(i: Int): Column =
      greatest((0 until MaxSimSegs).map(j => cosij(i, j)): _*)
    (1 until MaxSimSegs).foldLeft(gi(0))((acc, i) => acc + gi(i))
  }

  /** DuckDB twin of the MaxSim pieces: the `sub`/`subn` CTE bodies (over
    * the embeddings relation) and the scored expression between aliases
    * `q` and `t` — identical slices, norms, and fold order. */
  private[graft] val maxSimSubnCtesSql: String = {
    def sl(e: String, i: Int) =
      s"list_slice($e, ${i * MaxSimDim + 1}, ${i * MaxSimDim + MaxSimDim})"
    s"""sub AS (
        SELECT vec_id,
          ${(0 until MaxSimSegs).map(i => s"${sl("embedding", i)} AS s$i").mkString(", ")}
        FROM embeddings),
      subn AS (
        SELECT vec_id, ${(0 until MaxSimSegs).map(i => s"s$i").mkString(", ")},
          ${(0 until MaxSimSegs).map(i => s"sqrt(${dotSql(s"s$i", s"s$i")}) AS n$i").mkString(", ")}
        FROM sub)"""
  }

  private[graft] val maxSimScoreSql: String = {
    def cos(i: Int, j: Int) =
      s"""CASE WHEN q.n$i * t.n$j = 0 THEN 0.0
          ELSE ${dotSql(s"q.s$i", s"t.s$j")} / (q.n$i * t.n$j) END"""
    def g(i: Int) =
      s"greatest(${(0 until MaxSimSegs).map(j => cos(i, j)).mkString(", ")})"
    s"((${g(0)} + ${g(1)}) + ${g(2)}) + ${g(3)}"
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1). The same
    * literal values are baked into the Spark plan and the oracle SQL. */
  private def planeVal(plane: Int, j: Int): Double = {
    val h = (2654435761L * (plane.toLong * 64 + j + 1) + 12345L) % 1000003L
    h.toDouble / 500001.5 - 1.0
  }
  private def plane(p: Int): Seq[Double] = (0 until 64).map(j => planeVal(p, j))
  private def planeSql(p: Int): String = plane(p).mkString("[", ",", "]")

  /** q107 power-iteration start vector: plane(0) normalized DRIVER-side,
    * so the identical 64 double literals bake into both the Spark plan and
    * the oracle SQL (shortest-round-trip printing parses back to the same
    * double in DuckDB — the planeSql discipline). */
  private val pcaV0: Seq[Double] = {
    val r = plane(0)
    val n = math.sqrt(r.map(x => x * x).sum)
    r.map(_ / n)
  }
  private def pcaV0Sql: String = pcaV0.mkString("[", ",", "]")

  /** Sign code over `bits` hyperplanes starting at plane index `base`. */
  private def signCode(v: Column, base: Int, bits: Int): Column =
    (0 until bits).map { b =>
      when(dotd(v, typedLit(plane(base + b))) > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  /** IVF coarse quantizer: 16 deterministic seed centroids (the embeddings
    * of vec_id 10..25, normalized driver-side — a K x 64 literal, the same
    * driver-sized decision as q41's bitmap width; production would k-means,
    * and q62 below IS the k-means update step). Normalization uses the SAME
    * index-order fold the oracle uses. */
  private def ivfCentroids(e: DataFrame): Seq[(Int, Seq[Double])] = e
    .filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + IvfCells)
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map { r =>
      val v = r.getSeq[Float](1)
      val nrm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (r.getLong(0).toInt - NumQueries, v.map(_.toDouble / nrm).toSeq)
    }.sortBy(_._1).toSeq

  /** The q125/q126 PQ codebook: the IVF seed rows' RAW values (no
    * normalization — PQ quantizes L2 space), driver-bounded by construction
    * (= [[IvfCells]] rows). The oracle re-reads the same rows. */
  private def pqCodebook(emb: DataFrame): Seq[Seq[Double]] = emb
    .filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + IvfCells)
    .select(col("vec_id"), col("embedding")).collect()
    .sortBy(_.getLong(0))
    .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq

  /** Subvector-m L2 distance to a codebook row: left IEEE fold over the
    * [[PqSub]] squared differences — the oracle replays the identical op
    * order, so the doubles are bit-identical cross-engine. */
  private def subD2(v: Column, m: Int, c: Seq[Double]): Column =
    aggregate(
      zip_with(slice(v, m * PqSub + 1, PqSub),
        typedLit(c.slice(m * PqSub, (m + 1) * PqSub)),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Argmin subspace centroid as a lexicographic least() over
    * (d2, code) structs: min distance, ties to the lowest code. */
  private def pqBest(v: Column, m: Int, seeds: Seq[Seq[Double]]): Column =
    least((0 until IvfCells).map { k =>
      struct(subD2(v, m, seeds(k)).as("d"), lit(k).as("k"))
    }: _*)

  /** Argmax-cosine cell as a flat PURE-PROJECTION expression (the graft_dot
    * kernel x K, no join, no shuffle): greatest() over (dot, -cid) structs
    * is a lexicographic max -> max dot, ties to the lowest cid (ties cannot
    * diverge cross-engine anyway: both sides fold in the same IEEE order,
    * so the dot values are bit-identical). */
  private def cellOf(v: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    greatest(centroids.map { case (cid, c) =>
      struct(dotd(v, typedLit(c)).as("d"), lit(-cid).as("nc"))
    }: _*).getField("nc") * -1

  /** Recall@k lower bounds for the self-validating ANN gates (q29's
    * in-query-error-bound idiom): the gated query FAILS via raise_error if
    * recall vs the exact float-cosine top-k drops below the bound, so
    * approximation QUALITY is graded in-query, not just plan determinism.
    *
    * Calibration honesty: the synthetic embeddings are ISOTROPIC — the
    * exact top-5 of a query is barely above noise, so no sublinear method
    * can beat "recall ≈ corpus fraction touched" by much (measured means:
    * q51 0.02-0.06 vs 13/4096 = 0.3% touched; q53 0.30-0.48 vs 4/16 = 25%
    * probed). The MEAN-recall bounds below are therefore anchored at
    * multiples of the touch fraction: they catch the real bug class — a
    * probe/code mismatch between query and corpus side collapses recall to
    * the touch fraction itself (pure chance) — while staying truthful
    * about what isotropic data permits. Clustered production embeddings
    * score far higher with the same plans; `recall_k` is exported
    * per-query for observability either way. Quantized brute force (q66)
    * is rank-preserving by design, so it gets a strict PER-QUERY bound. */
  val LshRecallBound = 0.01  // mean bound: >= 3x the 0.3% chance level
  val IvfRecallBound = 0.2   // mean bound: below observed 0.30-0.48, above worst-case chance
  val QuantRecallBound = 0.8 // per-query bound: int8 keeps ranks nearly intact

  /** The exact float-cosine top-k membership set (q50's relation) — the
    * baseline every ANN variant's recall is measured against. */
  private def bruteTopKSet(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("bq0"), col("embedding").as("qe0"), col("nrm").as("qn0"))
    val w = Window.partitionBy(col("bq0")).orderBy(col("bcos").desc, col("vec_id"))
    e.filter(col("vec_id") >= NumQueries)
      .crossJoin(broadcast(q))
      .withColumn("bcos", cosd(col("qe0"), col("qn0"), col("embedding"), col("nrm")))
      .withColumn("brank", row_number().over(w))
      .filter(col("brank") <= TopK)
      .select(col("bq0").as("bq"), col("vec_id").as("bn"))
  }

  /** Attach a per-query `recall_k` column (|approx ∩ exact| / k vs
    * [[bruteTopKSet]]) and fail the query in-flight if recall falls below
    * `thr` — per-query when `perQuery`, else on the mean across the query
    * set (the right unit on isotropic data, where single-query recall is
    * legitimately 0 sometimes). The exact baseline costs one q50-shaped
    * pass — the price of a self-validating gate (a production pipeline
    * would audit a query SAMPLE with the same plan). */
  private def withRecall(topk: DataFrame, e: DataFrame, thr: Double,
      perQuery: Boolean = false): DataFrame = {
    val rec0 = topk.select(col("query_id"), col("neighbor_id"))
      .join(bruteTopKSet(e),
        col("query_id") === col("bq") && col("neighbor_id") === col("bn"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("bq")) / lit(TopK.toDouble)).as("recall_k"))
    val audited = if (perQuery) col("recall_k")
      else avg(col("recall_k")).over(Window.partitionBy())
    val rec = rec0
      .withColumn("recall_k", when(audited < thr, raise_error(concat(
          lit(s"ANN ${if (perQuery) "per-query" else "mean"} recall@$TopK " +
            s"out of bound (< $thr) at query "),
          col("query_id").cast("string"))))
        .otherwise(col("recall_k")))
    topk.join(broadcast(rec), "query_id")
  }

  /** One q180 greedy round: among candidates not yet selected, pick the
    * per-query argmax of lam*rel - mu*max_sim-to-selected. Anti-join
    * excludes prior picks, a (qid, va)-keyed max-agg computes the penalty,
    * and the rank window partitions by qid — every frame pool-sized.
    * (PlanSpec locks this round's shape; the query loop checkpoints the
    * accumulated picks, so the returned frame's own plan is a scan.) */
  private[graft] def mmrRound(cand: DataFrame, sims: DataFrame,
      selected: DataFrame, step: Int): DataFrame = {
    val wSel = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val msim = sims
      .join(selected.select(col("qid"), col("vec_id").as("vb")), Seq("qid", "vb"))
      .groupBy(col("qid"), col("va")).agg(max(col("sim")).as("msim"))
      .withColumnRenamed("va", "vec_id")
    cand
      .join(selected.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"), "left_anti")
      .join(msim, Seq("qid", "vec_id"), "left")
      .withColumn("score",
        lit(MmrLam) * col("rel") - lit(MmrMu) * coalesce(col("msim"), lit(0.0)))
      .withColumn("rn", row_number().over(wSel)).filter(col("rn") === 1)
      .select(col("qid"), lit(step.toLong).as("step"), col("vec_id"), col("score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q180: MMR diversity re-ranking (Carbonell & Goldstein SIGIR
    //      1998) — the retrieval-time answer to redundant top-k lists:
    //      per query, greedily pick MmrK results maximizing
    //      lam*rel(d) - mu*max_{s in selected} sim(d, s) (first pick's
    //      penalty term is 0). Scale shape: the candidate pool is the
    //      q50 brute top-MmrPool per query (broadcast-queries x corpus +
    //      rank window — the 100 TB path swaps in q53's IVF candidates);
    //      everything AFTER pooling is pool-sized: the pairwise sim
    //      frame is a qid equi-join of pool x pool rows, and each of the
    //      MmrK greedy rounds is an anti-join + max-agg + rank window
    //      over <= pool rows per query — never corpus-sized, fully
    //      distributed (no driver-side selection loop). Scores are
    //      engine-exact: rel/sim ride the q50 fold, lam/mu are shared
    //      shortest-round-trip literals, coalesce(msim, 0.0) unifies the
    //      first round.
    "q180_mmr_diversity" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id")) // spread the fold work (single-file input)
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val wRel = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("vec_id"))
      val cand = e.filter(col("vec_id") >= NumQueries)
        .crossJoin(broadcast(q))
        .withColumn("rel", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("rk", row_number().over(wRel))
        .filter(col("rk") <= MmrPool)
        .select(col("qid"), col("vec_id"), col("rel"), col("embedding"), col("nrm"))
        .localCheckpoint() // pool-sized; feeds the sim matrix and every round
      val sims = cand.select(col("qid"), col("vec_id").as("va"),
          col("embedding").as("ea"), col("nrm").as("na"))
        .join(cand.select(col("qid"), col("vec_id").as("vb"),
          col("embedding").as("eb"), col("nrm").as("nb")), Seq("qid"))
        .filter(col("va") =!= col("vb"))
        .select(col("qid"), col("va"), col("vb"),
          cosd(col("ea"), col("na"), col("eb"), col("nb")).as("sim"))
        .localCheckpoint()
      var selected = cand.select(col("qid"), lit(0L).as("step"),
        col("vec_id"), lit(0.0).as("score")).filter(lit(false))
      for (step <- 1 to MmrK)
        selected = selected.unionByName(mmrRound(cand, sims, selected, step))
          .localCheckpoint()
      selected.select(col("qid").as("query_id"), col("step"),
          col("vec_id").as("neighbor_id"), col("score"))
        .repartition(1).sortWithinPartitions(col("query_id"), col("step"))
    }),

    // ---- exact brute-force cosine top-k: 10 broadcast queries x corpus.
    // ---- q172: matryoshka (MRL) truncation fidelity — truncate every
    //      embedding to its MrlDims-prefix, renormalize, and rank against
    //      the truncated query; report the truncated top-k with each
    //      hit's FULL-dim cosine and whether it also makes the full-dim
    //      top-k (the overlap an MRL serving tier monitors before
    //      trusting the cheap prefix). Scale shape: the truncation is a
    //      narrow slice + one extra fold per row (no shuffle); both
    //      pools are TakeOrderedAndProject (never a global rank window
    //      over the corpus); the rank window runs on the POOLED <=
    //      MrlTopK rows; membership is one broadcast semi-ish left join
    //      of two k-row frames. Every float op (dot folds, sqrt,
    //      divisions) is the q50 engine-exact arithmetic.
    "q172_matryoshka" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
        .withColumn("tr", slice(col("embedding"), 1, MrlDims))
        .withColumn("tnrm", sqrt(dotd(col("tr"), col("tr"))))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("nrm").as("qn"),
          col("tr").as("qt"), col("tnrm").as("qtn"))
      val scored = e.filter(col("vec_id") > 0).crossJoin(broadcast(q))
        .withColumn("cos_full", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("cos_trunc", dotd(col("qt"), col("tr")) / (col("qtn") * col("tnrm")))
        .select(col("vec_id"), col("cos_trunc"), col("cos_full"))
      val tpool = scored.orderBy(col("cos_trunc").desc, col("vec_id")).limit(MrlTopK)
        .withColumn("rank_trunc", row_number().over(
          Window.orderBy(col("cos_trunc").desc, col("vec_id"))).cast("long"))
      val fpool = scored.orderBy(col("cos_full").desc, col("vec_id")).limit(MrlTopK)
        .select(col("vec_id"), lit(true).as("in_full"))
      tpool.join(fpool, Seq("vec_id"), "left")
        .withColumn("in_full_topk", coalesce(col("in_full"), lit(false)))
        .select(col("vec_id"), col("rank_trunc"), col("cos_trunc"),
          col("cos_full"), col("in_full_topk"))
        .repartition(1).sortWithinPartitions(col("rank_trunc"))
    }),

    // LATE-INTERACTION retrieval (q243): ColBERT-style MaxSim (Khattab &
    // Zaharia, SIGIR 2020) — a document scores as the SUM over query
    // sub-vectors of the MAX cosine against any document sub-vector,
    // here over the 4x16 segment decomposition of the 64-dim embeddings
    // (q172's matryoshka splits). The whole MaxSim is ONE codegen'd
    // projection per (query, doc) pair — 16 fixed graft_dot kernel calls,
    // greatest() per row, additions in a FIXED fold order so the double
    // sum is bit-identical cross-engine — no explode, no per-sub-vector
    // shuffle. 100 TB: the brute pass is the exactness baseline (q50's
    // class, query set broadcast); the candidate-generation scale path is
    // the same IVF/LSH bucketing with MaxSim as the re-rank, which this
    // gate's arithmetic locks.
    "q243_late_interaction" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").repartition(col("vec_id"))
      val q = withSubNorms(e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe")), "q")
      val tgt = withSubNorms(e.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id").as("tid"), col("embedding").as("te")), "t")
      val w = Window.partitionBy(col("qid")).orderBy(col("maxsim").desc, col("tid"))
      tgt.crossJoin(broadcast(q))
        .withColumn("maxsim", maxSimCol)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"),
          col("tid").as("neighbor_id"), col("maxsim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q50_ann_brute" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id")) // spread the fold work (single-file input)
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val tgt = e.filter(col("vec_id") >= NumQueries)
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      tgt.crossJoin(broadcast(q))
        .withColumn("cos", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- q152: hard-negative mining — the contrastive-training data
    //      prep (per query: top-k SAME-label neighbors as positives,
    //      top-k DIFFERENT-label as hard negatives; the "hard" is
    //      highest-cosine-wrong-label, the examples a contrastive loss
    //      learns most from). Same broadcast-queries x corpus shape as
    //      q50 with a (query, polarity) rank window; the 100 TB path
    //      swaps the exact scan for q53's IVF candidate generation with
    //      the identical polarity split (composition, not new machinery).
    "q152_hard_negatives" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id")) // spread the fold work (single-file input)
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("label").as("qlab"))
      val w = Window.partitionBy(col("qid"), col("polarity"))
        .orderBy(col("cos").desc, col("vec_id"))
      e.filter(col("vec_id") >= NumQueries)
        .crossJoin(broadcast(q))
        .withColumn("cos", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("polarity",
          when(col("label") === col("qlab"), "pos").otherwise("neg"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("polarity"), col("rank"),
          col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("polarity"), col("rank"))
    }),

    // ---- q158: hard-negative mining on the IVF scale path — q152's
    //      polarity split run over q53's coarse-quantized candidate
    //      generation instead of the exact scan: projection-only cell
    //      assignment, top-nprobe cells per query, ONE broadcast cell
    //      equi-join, then the (query, polarity) rank window. This is the
    //      billion-vector form of the contrastive-pairs prep (candidates
    //      cost nprobe/K of the corpus). Gate: the EXACT DuckDB replay of
    //      cells/probes/polarity/ranks (q126's isotropic-data honesty —
    //      a recall floor vs q152 would measure noise, the decision
    //      procedure is what must match).
    "q158_hard_negatives_ivf" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val centroids = ivfCentroids(e)
      val tgt = e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centroids))
      val qcells = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("label").as("qlab"),
          explode(array(centroids.map { case (cid, c) =>
            struct(lit(cid).as("cell"), dotd(col("embedding"), typedLit(c)).as("d"))
          }: _*)).as("cc"))
        .select(col("qid"), col("qe"), col("qn"), col("qlab"),
          col("cc.cell").as("cell"), col("cc.d").as("d"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cell"))
      val probes = qcells.withColumn("prank", row_number().over(pw))
        .filter(col("prank") <= IvfProbes)
      val w = Window.partitionBy(col("qid"), col("polarity"))
        .orderBy(col("cos").desc, col("vec_id"))
      tgt.join(broadcast(probes), "cell")
        .withColumn("cos", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("polarity",
          when(col("label") === col("qlab"), "pos").otherwise("neg"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("polarity"), col("rank"),
          col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("polarity"), col("rank"))
    }),

    // ---- sign-LSH bucketed ANN with Hamming-1 multi-probe + exact rerank.
    "q51_ann_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
        .withColumn("code", signCode(col("embedding"), 0, LshBits))
      val probeArr = array(
        (col("code") +: (0 until LshBits).map(b => col("code").bitwiseXOR(lit(1L << b)))): _*)
      val probes = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
          explode(probeArr).as("probe"))
      val tgt = e.filter(col("vec_id") >= NumQueries)
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val topk = tgt.join(probes, col("probe") === col("code"))
        .withColumn("cos", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
      withRecall(topk, e, LshRecallBound).orderBy(col("query_id"), col("rank"))
    }),

    // ---- IVF (inverted-file) ANN: the cell-partitioned scale path beside
    //      q51's hash-bucketed one. Coarse quantizer = 16 deterministic seed
    //      centroids (the embeddings of vec_id 10..25, normalized driver-
    //      side — a K x 64 literal, the same driver-sized decision as q41's
    //      bitmap width; production would k-means, the Spark plumbing is
    //      identical). Every corpus vector is assigned to its argmax-cosine
    //      cell in a PURE PROJECTION over the centroid literals (the
    //      graft_dot kernel x 16, no join, no shuffle — embarrassingly
    //      parallel at any scale); each query probes its 4 nearest cells and
    //      exact-reranks candidates through a (cell) equi-join that touches
    //      ~nprobe/K of the corpus, never all of it. The oracle mirrors the
    //      full IVF decision procedure — same centroids, same index-order
    //      double folds, so assignments and ranks are bit-identical.
    "q53_ann_ivf" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      // Driver-sized centroid literal + projection-only cell assignment
      // (see ivfCentroids / cellOf).
      val centroids = ivfCentroids(e)
      val tgt = e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centroids))
      // query side: top-nprobe cells by the same (dot desc, cid) order
      val qcells = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
          explode(array(centroids.map { case (cid, c) =>
            struct(lit(cid).as("cell"), dotd(col("embedding"), typedLit(c)).as("d"))
          }: _*)).as("cc"))
        .select(col("qid"), col("qe"), col("qn"),
          col("cc.cell").as("cell"), col("cc.d").as("d"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cell"))
      val probes = qcells.withColumn("prank", row_number().over(pw))
        .filter(col("prank") <= IvfProbes)
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val topk = tgt.join(broadcast(probes), "cell")
        .withColumn("cos", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
      withRecall(topk, e, IvfRecallBound).orderBy(col("query_id"), col("rank"))
    }),

    // ---- q190: IVF nprobe recall/cost sweep — the tuning curve behind
    //      q53's fixed IvfProbes knob: per (nprobe in IvfSweep, query),
    //      recall@k against the exact baseline AND the candidate count
    //      actually scanned — the two axes a deployment trades when it
    //      picks nprobe. Scale shape: cell assignment, probe ranking, and
    //      the candidate join run ONCE at max(nprobe) (checkpointed);
    //      each sweep arm is a filter on the probe rank — never a
    //      re-scan, never a re-join; rank windows partition by
    //      (nprobe, query). The exact baseline is the one q50-shaped
    //      pass every self-validating recall gate already pays.
    "q190_ivf_recall_sweep" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val centroids = ivfCentroids(e)
      val tgt = e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centroids))
      val qcells = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
          explode(array(centroids.map { case (cid, c) =>
            struct(lit(cid).as("cell"), dotd(col("embedding"), typedLit(c)).as("d"))
          }: _*)).as("cc"))
        .select(col("qid"), col("qe"), col("qn"),
          col("cc.cell").as("cell"), col("cc.d").as("d"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cell"))
      val probes = qcells.withColumn("prank", row_number().over(pw))
        .filter(col("prank") <= IvfSweep.max)
      val cands = tgt.join(broadcast(probes), "cell")
        .withColumn("cos", cosd(col("qe"), col("qn"), col("embedding"), col("nrm")))
        .select(col("qid"), col("prank"), col("vec_id"), col("cos"))
        .localCheckpoint() // one candidate join feeds every sweep arm
      val swept = cands
        .withColumn("nprobe", explode(typedLit(IvfSweep)))
        .filter(col("prank") <= col("nprobe"))
      val w = Window.partitionBy(col("nprobe"), col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      val ncand = swept.groupBy(col("nprobe"), col("qid"))
        .agg(count(lit(1)).as("n_cand"))
      val topk = swept.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("nprobe"), col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      topk
        .join(bruteTopKSet(e),
          col("query_id") === col("bq") && col("neighbor_id") === col("bn"), "left")
        .groupBy(col("nprobe"), col("query_id"))
        .agg((count(col("bq")) / lit(TopK.toDouble)).as("recall_k"))
        .join(ncand.withColumnRenamed("qid", "query_id"), Seq("nprobe", "query_id"))
        .select(col("nprobe").cast("long").as("nprobe"), col("query_id"),
          col("recall_k"), col("n_cand"))
        .repartition(1).sortWithinPartitions(col("nprobe"), col("query_id"))
    }),

    // ---- k-means Lloyd UPDATE step over the IVF cells: assign every
    //      corpus vector to its argmax-cosine cell (the same projection-only
    //      assignment as q53 — no join, no shuffle), then the new centroid
    //      is the per-(cell, dimension) mean. posexplode turns the 64-dim
    //      mean into a long-form aggregation on (cell, pos) — one shuffle,
    //      1024 output rows, decimal-exact sums (the SUMD convention) so
    //      the oracle matches bit-for-bit. Iterating this step IS
    //      distributed k-means; one step is the oracle-gateable unit.
    "q62_kmeans_step" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import graft.util.Sumd.sumd
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id")) // spread the fold work (single-file input)
      val centroids = ivfCentroids(e)
      e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centroids))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos").cast("long").as("pos"))
        .agg(
          count(lit(1)).as("n"),
          (sumd(col("x").cast("double")) / count(lit(1))).as("c_new"))
        .repartition(1).sortWithinPartitions(col("cell"), col("pos"))
    }),

    // ---- q252: TRAIN-AND-PERSIST THE IVF CODEBOOK — the "model
    //      artifacts are tables" lifecycle that removes the engine's last
    //      hard-coded model surface: the IVF centroids stop being driver
    //      literals and become a TRAINED, STORED, RE-SERVED artifact.
    //      Training = q62's Lloyd step ITERATED (spherical k-means:
    //      assignment is the same projection-only argmax-cosine cellOf —
    //      no join, no shuffle — means are the same decimal-exact SUMD
    //      aggregation, then each round's centroids renormalize with the
    //      shared index-order fold). Each round's K x D centroid matrix is
    //      collected driver-side — bounded by construction (16 x 64), the
    //      same class as the seed literals it replaces. After R rounds the
    //      codebook PERSISTS as a graft table (PK (cell, pos), the
    //      applier's own lifecycle — model artifacts get CDC semantics for
    //      free), and the serve leg reads it BACK from the store and
    //      assigns the corpus under the store-served centroids. Output
    //      pins all three surfaces bit-exactly: the per-round trajectory
    //      (q99's per-iteration discipline), the STORED coordinates (a
    //      single ulp lost in the round-trip breaks the hash), and the
    //      served assignment counts. 100 TB: per round ONE corpus pass
    //      (projection + 1024-row agg); serving reads a 16-row table.
    //      Oracle: the identical R rounds unrolled declaratively.
    "q252_trained_codebook" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import graft.cdc.{CdcApplier, ChangeFeed}
      import graft.util.Sumd.sumd
      val e = t(s, dir, "embeddings").repartition(col("vec_id"))
      val Rounds = 3
      var cent: Seq[(Int, Seq[Double])] = ivfCentroids(e)
      val traj = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Int, Long, Long, Double)]
      for (r <- 1 to Rounds) {
        val means = e.filter(col("vec_id") >= NumQueries)
          .withColumn("cell", cellOf(col("embedding"), cent))
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg(count(lit(1)).as("n"),
            (sumd(col("x").cast("double")) / count(lit(1))).as("m"))
          .collect() // K x D artifact rows — driver-bounded by construction
          .map(row => (row.getInt(0), row.getInt(1), row.getLong(2), row.getDouble(3)))
        cent = means.groupBy(_._1).toSeq.sortBy(_._1).map { case (cell, rows) =>
          val vec = rows.sortBy(_._2).map(_._4).toSeq
          val nrm = math.sqrt(vec.foldLeft(0.0)((a, x) => a + x * x))
          (cell, vec.map(_ / nrm))
        }
        val cellN = means.map(x => x._1 -> x._3).toMap
        cent.foreach { case (cell, vec) =>
          vec.zipWithIndex.foreach { case (c, p) =>
            traj += (("train", r.toLong, cell, p.toLong, cellN(cell), c))
          }
        }
      }
      // persist the trained codebook as a graft table, then SERVE FROM THE
      // STORE — the round-trip is part of what the oracle pins
      val store = java.nio.file.Files.createTempDirectory("graft_codebook")
        .toString + "/ivf_codebook"
      val cbDf = s.createDataFrame(cent.flatMap { case (cell, vec) =>
        vec.zipWithIndex.map { case (c, p) => (cell, p.toLong, c) }
      }).toDF("cell", "pos", "c")
      CdcApplier.applyBatch(s, ChangeFeed.inserts(cbDf, lit(1L)), store,
        CdcApplier.Options(Seq("cell", "pos"), numBuckets = 4))
      val stored = CdcApplier.snapshot(s, store)
        .select(col("cell"), col("pos"), col("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      val centStore = stored.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (cell, rows) => (cell, rows.sortBy(_._2).map(_._3).toSeq)
      }
      val counts = e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centStore))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val out = traj.toSeq ++
        stored.map { case (cell, p, c) => ("stored", Rounds.toLong, cell, p, 0L, c) } ++
        counts.map { case (cell, n) => ("serve", (Rounds + 1).toLong, cell, -1L, n, 0.0) }
      s.createDataFrame(out).toDF("leg", "round", "cell", "pos", "n", "c")
        .orderBy(col("leg"), col("round"), col("cell"), col("pos"))
    }),

    // ---- q260: DRIFT-TRIGGERED CODEBOOK REFRESH — the q252 artifact's
    //      OPERATING lifecycle: production embeddings drift, and a stored
    //      quantizer must notice and retrain WITHOUT restarting from
    //      scratch (public design point: IVF re-training / index refresh in
    //      FAISS-style serving stacks; k-means++ warm starts). The codebook
    //      lives in a MERGE-ON-READ graft table, so MODEL VERSIONS get the
    //      store's own time travel: v1 publishes at position 100, the
    //      refresh SUPERSEDES the same (cell,pos) keys at position 200, and
    //      `snapshotAsOf(100)` keeps serving the old model — rollback and
    //      A/B reads are storage features, not ML-ops machinery.
    //      Staleness is MEASURED, not assumed: fit = SUMD-exact mean of
    //      each vector's best cosine against the stored centroids (one
    //      projection pass, no join); the shifted distribution (the same
    //      corpus with components REVERSED — deterministic and
    //      DuckDB-replayable) must fit WORSE than the training data
    //      (in-gate require), and ONE Lloyd round seeded FROM THE STORE
    //      over old+new must improve it (in-gate require) — both audits
    //      also emitted as rows the oracle reproduces bit-exactly.
    //      100 TB: detection is one narrow pass over the NEW slice; the
    //      refresh round is one corpus pass (the q62/q252 cost), serving
    //      stays a 16-row store read at either version.
    "q260_codebook_refresh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import graft.cdc.{CdcApplier, ChangeFeed}
      import graft.util.Sumd.sumd
      val eAll = t(s, dir, "embeddings").repartition(col("vec_id"))
      val base = eAll.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id"), col("embedding"))
      // the drifted distribution: same vectors, components reversed
      val fresh = base.select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))

      def lloydRound(corpus: DataFrame, c: Seq[(Int, Seq[Double])])
          : Seq[(Int, Seq[Double])] = {
        val means = corpus
          .withColumn("cell", cellOf(col("embedding"), c))
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg((sumd(col("x").cast("double")) / count(lit(1))).as("m"))
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        means.groupBy(_._1).toSeq.sortBy(_._1).map { case (cell, rows) =>
          val vec = rows.sortBy(_._2).map(_._3).toSeq
          val nrm = math.sqrt(vec.foldLeft(0.0)((a, x) => a + x * x))
          (cell, vec.map(_ / nrm))
        }
      }
      // v1: two warm-up rounds on the BASE distribution (q252's training)
      var cent: Seq[(Int, Seq[Double])] = ivfCentroids(eAll)
      for (_ <- 1 to 2) cent = lloydRound(base, cent)
      val store = java.nio.file.Files.createTempDirectory("graft_codebook")
        .toString + "/ivf_codebook"
      def cbDf(c: Seq[(Int, Seq[Double])]) = s.createDataFrame(
        c.flatMap { case (cell, vec) =>
          vec.zipWithIndex.map { case (x, p) => (cell, p.toLong, x) }
        }).toDF("cell", "pos", "c")
      val cbOpts = CdcApplier.Options(Seq("cell", "pos"), numBuckets = 4)
      CdcApplier.applyBatchMor(s, ChangeFeed.inserts(cbDf(cent), lit(100L)),
        store, cbOpts)
      def readCodebook(df: DataFrame): Seq[(Int, Seq[Double])] = df
        .select(col("cell"), col("pos"), col("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (cell, rows) => (cell, rows.sortBy(_._2).map(_._3).toSeq) }
      val v1 = readCodebook(CdcApplier.snapshot(s, store))
      // staleness audit: SUMD-exact mean best-cosine under the STORED model
      def fit(dfv: DataFrame, c: Seq[(Int, Seq[Double])]): Double = dfv
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
        .withColumn("mc",
          greatest(c.map { case (_, cv) => dotd(col("embedding"), typedLit(cv)) }: _*)
            / col("nrm"))
        .agg((sumd(col("mc")) / count(lit(1))).as("f")).head().getDouble(0)
      val fitBase = fit(base, v1)
      val fitNewOld = fit(fresh, v1)
      require(fitNewOld < fitBase,
        f"the drifted slice must look stale under the stored codebook " +
          f"($fitNewOld%.6f vs $fitBase%.6f)")
      // refresh: ONE Lloyd round seeded FROM THE STORE, over old+new —
      // published as a superseding MOR batch (same keys, newer position)
      val v2 = lloydRound(base.unionByName(fresh), v1)
      CdcApplier.applyBatchMor(s, ChangeFeed.inserts(cbDf(v2), lit(200L)),
        store, cbOpts)
      val v2Stored = readCodebook(CdcApplier.snapshot(s, store))
      val fitNewRef = fit(fresh, v2Stored)
      require(fitNewRef > fitNewOld,
        f"the seeded refresh must improve the drifted slice's fit " +
          f"($fitNewRef%.6f vs $fitNewOld%.6f)")
      // versioned serving: the store still answers the OLD model at 100
      val v1AsOf = readCodebook(CdcApplier.snapshotAsOf(s, store, 100L))
      val all = base.unionByName(fresh)
      def counts(c: Seq[(Int, Seq[Double])]) = all
        .withColumn("cell", cellOf(col("embedding"), c))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val out =
        v1AsOf.flatMap { case (cell, vec) => vec.zipWithIndex.map {
          case (x, p) => ("cb_v1", cell, p.toLong, 0L, x) } } ++
        v2Stored.flatMap { case (cell, vec) => vec.zipWithIndex.map {
          case (x, p) => ("cb_v2", cell, p.toLong, 0L, x) } } ++
        Seq(("fit", -1, 0L, 0L, fitBase), ("fit", -1, 1L, 0L, fitNewOld),
          ("fit", -1, 2L, 0L, fitNewRef)) ++
        counts(v1AsOf).map { case (cell, n) => ("serve_v1", cell, -1L, n, 0.0) } ++
        counts(v2Stored).map { case (cell, n) => ("serve_v2", cell, -1L, n, 0.0) }
      s.createDataFrame(out).toDF("leg", "cell", "pos", "n", "c")
        .orderBy(col("leg"), col("cell"), col("pos"))
    }),

    // ---- q66: int8-quantized ANN — the memory-compression scale path.
    //      Every vector is symmetric-int8 quantized ONCE (graft_i8quant:
    //      codes packed one signed byte per component — genuinely 4x
    //      smaller than float32, the representation a 100 TB vector store
    //      keeps resident; the scale factor maxabs/127 rides along as one
    //      double). Scoring is the pure-INTEGER code dot (graft_qdot —
    //      exact in any engine, no float fold-order concerns at all)
    //      dequantized by the two scales only at the end; the three
    //      dequantization ops are single IEEE multiplies/divides, so the
    //      oracle reproduces scores (and hence ranks) bit-identically.
    //      Shape matches q50 (broadcast query set x streamed corpus);
    //      the quantized corpus composes with q51/q53's candidate
    //      generation unchanged.
    "q66_ann_quantized" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id")) // spread the kernel work (single-file input)
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
        .withColumn("maxabs", call_function("graft_maxabs", col("embedding")))
        .withColumn("codes", call_function("graft_i8quant", col("embedding")))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("codes").as("qc"), col("maxabs").as("qm"))
      val tgt = e.filter(col("vec_id") >= NumQueries)
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val topk = tgt.crossJoin(broadcast(q))
        .withColumn("qdot", call_function("graft_qdot", col("qc"), col("codes")))
        .withColumn("score",
          col("qdot").cast("double") * (col("qm") * col("maxabs")) / lit(16129.0))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("qdot"), col("score"))
      withRecall(topk, e, QuantRecallBound, perQuery = true)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- embedding near-dup: self-union with rescaled copies, LSH-bucketed
    //      candidates, exact cosine verify.
    "q52_embed_neardup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").repartition(col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val feed = e.union(e.select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.05f)).as("embedding")))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val banded = feed.select(col("vec_id"), col("embedding"), col("nrm"),
          explode(array((0 until DedupTables).map(tb =>
            struct(lit(tb).as("tbl"),
              signCode(col("embedding"), 100 + tb * LshBits, LshBits).as("code"))): _*)).as("bk"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("bk.tbl").as("tbl"), col("bk.code").as("code"))
      banded.as("a").join(banded.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          col("a.embedding").as("ea"), col("a.nrm").as("na"),
          col("b.embedding").as("eb"), col("b.nrm").as("nb"))
        .distinct()
        .filter(cosd(col("ea"), col("na"), col("eb"), col("nb")) >= DedupCos)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- q118: SemDeDup (Abbas et al. 2023) — SEMANTIC dedup by
    //      cluster-scoped exact cosine: every vector (and its synthetic
    //      re-crawl copy, q52's duplicate model — positive scaling is
    //      cosine-invariant and preserves the cell argmax) is assigned to
    //      its IVF cell with the projection-only cellOf (no join, no
    //      shuffle), candidate pairs are generated ONLY within a cell (one
    //      self-equi-join on cell: O(sum nc^2) work instead of the O(n^2)
    //      all-pairs — at 100 TB the cell count scales with the corpus so
    //      cells stay bounded), and retention is the deterministic
    //      lowest-id-wins policy: drop any member with a >=SemCos edge to
    //      a lower id (one distinct + one anti-join). Output is the
    //      surviving corpus (vec_id, cell) — the dedupped dataset, not
    //      just the pair list.
    "q118_semantic_dedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").repartition(col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val centroids = ivfCentroids(e)
      val base = e.filter(col("vec_id") >= NumQueries)
      val feed = base.union(base.select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.05f)).as("embedding")))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
        .withColumn("cell", cellOf(col("embedding"), centroids))
      val dominated = feed.as("a").join(feed.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .filter(cosd(col("a.embedding"), col("a.nrm"),
          col("b.embedding"), col("b.nrm")) >= SemCos)
        .select(col("b.vec_id").as("vec_id")).distinct()
      feed.join(dominated, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("cell"))
        .repartition(1).sortWithinPartitions(col("vec_id"))
    }),

    // ---- q125: product-quantization encode (Jégou et al. 2011) — the
    //      compression step that makes billion-vector ANN feasible: the
    //      64-dim embedding splits into PqM=8 subvectors, each assigned to
    //      its nearest of PqK=16 per-subspace centroids, so a vector
    //      becomes 8 nibbles (4 bytes) instead of 256. Codebook = the q53
    //      IVF seed vectors' own slices (deterministic, data-derived, no
    //      RNG — the oracle re-reads the same rows). Assignment is a PURE
    //      PROJECTION: 8x16 fused subvector-L2 kernels + lexicographic
    //      least() per subspace (min d2, ties to the lowest code), then one
    //      explode to (vec_id, sub, code, d2) rows — no join, no shuffle;
    //      at 100 TB this is one bandwidth-bound corpus pass, the codebook
    //      rides in the closure. d2 folds left in IEEE order on both
    //      engines, so even ties cannot diverge.
    "q125_pq_encode" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").repartition(col("vec_id"))
        .filter(col("vec_id") >= NumQueries)
        .select(col("vec_id"), col("embedding"))
      val seeds = pqCodebook(t(s, dir, "embeddings"))
      val codes = (0 until PqM).map { m =>
        val best = pqBest(col("embedding"), m, seeds)
        struct(lit(m.toLong).as("sub"), best.getField("k").cast("long").as("code"),
          best.getField("d").as("d2"))
      }
      e.select(col("vec_id"), explode(array(codes: _*)).as("pq"))
        .select(col("vec_id"), col("pq.sub").as("sub"),
          col("pq.code").as("code"), col("pq.d2").as("d2"))
        .repartition(1).sortWithinPartitions(col("vec_id"), col("sub"))
    }),

    // ---- q126: IVFPQ search — the production billion-vector ANN layout
    //      (Faiss IndexIVFPQ with by_residual=false): the coarse IVF
    //      quantizer prunes to the probed cells (q53's machinery) and
    //      candidates are ranked by ASYMMETRIC DISTANCE (ADC, Jégou et al.
    //      2011): each query precomputes its 8x16 subspace-distance table
    //      (projection-only, rides through the probe explode), and a
    //      candidate's distance is 8 table lookups by its PQ codes + an
    //      in-row left fold — the corpus side touches only (cell, codes):
    //      4 BYTES per vector instead of 256, which is the entire point at
    //      100 TB (the full-precision vectors never leave the scan that
    //      encodes them). One cell equi-join against the broadcast probe
    //      set, per-query top-k window. Quality on these ISOTROPIC
    //      synthetic embeddings is chance-dominated (see the recall-bound
    //      honesty note above), so the gate is the EXACT DuckDB replay of
    //      the full decision procedure — cells, codes, ADC folds, ranks —
    //      rather than a recall floor that would only measure noise.
    "q126_ivfpq_search" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").repartition(col("vec_id"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
      val centroids = ivfCentroids(e)
      val seeds = pqCodebook(t(s, dir, "embeddings"))
      val tgt = e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centroids))
        .withColumn("codes", array((0 until PqM).map(m =>
          pqBest(col("embedding"), m, seeds).getField("k")): _*))
        .select(col("vec_id"), col("cell"), col("codes"))
      // query side: ADC table (8x16 doubles) + top-nprobe cells, q53's order
      val adc = array((0 until PqM).map(m =>
        array((0 until IvfCells).map(k => subD2(col("embedding"), m, seeds(k))): _*)): _*)
      val qcells = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), adc.as("adc"),
          explode(array(centroids.map { case (cid, c) =>
            struct(lit(cid).as("cell"), dotd(col("embedding"), typedLit(c)).as("d"))
          }: _*)).as("cc"))
        .select(col("qid"), col("adc"), col("cc.cell").as("cell"), col("cc.d").as("d"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cell"))
      val probes = qcells.withColumn("prank", row_number().over(pw))
        .filter(col("prank") <= IvfProbes)
        .select(col("qid"), col("adc"), col("cell"))
      // ADC: left fold over the 8 subspace lookups, in subspace order
      val adist = (0 until PqM).map(m =>
        element_at(element_at(col("adc"), m + 1), element_at(col("codes"), m + 1) + 1))
        .reduce(_ + _)
      val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
      tgt.join(broadcast(probes), "cell")
        .withColumn("adist", adist)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"),
          col("vec_id").as("neighbor_id"), col("adist"))
        .repartition(1).sortWithinPartitions(col("query_id"), col("rank"))
    }),

    // ---- q268: IVFPQ with RESIDUAL ENCODING (by_residual=true — FAISS
    //      IndexIVFPQ's DEFAULT, Jégou et al. 2011 §III): q126 ranks PQ
    //      codes of the RAW vectors; the production form encodes each
    //      vector's RESIDUAL against its coarse centroid (r = v - c_cell),
    //      with the PQ codebook itself TRAINED in residual space — seeded
    //      from the 16 seed rows' own-cell residuals, then ONE Lloyd
    //      refinement over the corpus residuals (decimal-exact means, so
    //      the whole construction stays deterministic and the oracle
    //      replays it bit-for-bit; FAISS trains its PQ on residuals for
    //      exactly this reason). Queries
    //      probe the same top-nprobe cells, but the ADC table is PER
    //      PROBED CELL (the query's residual differs per cell) — exactly
    //      FAISS's per-list distance tables. By_residual's advantage IS
    //      cluster structure (residual norm shrinks only when vectors sit
    //      near their centroid; on the raw ISOTROPIC synthetic slice the
    //      residual is provably no smaller than the vector, and recall
    //      comparisons measure noise — the q126 calibration-honesty note),
    //      so the gate runs both pipelines on a DETERMINISTIC CLUSTERED
    //      OVERLAY of the corpus (w = cent_(id mod K) + 0.25 v — the
    //      q118/q260 synthetic-construction discipline, DuckDB-replayable
    //      bit-for-bit). SELF-AUDITS: (1) the trained residual codebook
    //      must reconstruct strictly better than q126's raw codes
    //      (decimal-exact mean encode error — the mechanism); (2) both
    //      pipelines' top-5 are scored against the exact float-cosine
    //      top-5 and by_residual must beat or tie raw-code recall in
    //      aggregate (the metric, now meaningful because the data has the
    //      structure the method exists for). 100 TB: identical cost shape
    //      to q126 — corpus side touches (cell, 4 bytes of codes); the
    //      residual subtraction rides the same one-pass projection that
    //      encodes; queries pay nprobe ADC tables instead of one (K x M x
    //      16 doubles — driver-free, broadcast-joined). Oracle: the full
    //      decision procedure — overlay, seed cells, Lloyd-trained
    //      residual codebook, codes, per-cell ADC folds, ranks, both
    //      audits — replayed declaratively.
    "q268_residual_ivfpq" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val eRaw = t(s, dir, "embeddings").repartition(col("vec_id"))
      val centroids = ivfCentroids(eRaw)
      val seeds = pqCodebook(t(s, dir, "embeddings"))
      // the clustered overlay: every vector moves to its (id mod K) cell's
      // centroid plus a quarter of itself — float-rounded, so both engines
      // hold the identical corpus
      val overlay = coalesce(centroids.map { case (cid, cv) =>
        when(pmod(col("vec_id"), lit(IvfCells)) === cid,
          zip_with(col("embedding"), typedLit(cv),
            (x, y) => (y + x.cast("double") * 0.25).cast("float")))
      }: _*)
      val e = eRaw.select(col("vec_id"), overlay.as("embedding"))
        .withColumn("nrm", sqrt(dotd(col("embedding"), col("embedding"))))
        .localCheckpoint()
      // residual codebook: each seed minus ITS OWN cell's centroid —
      // driver arithmetic over the K x D literals, with the shared
      // index-order fold so the oracle's argmax agrees bit-for-bit
      def dotSeq(a: Seq[Double], b: Seq[Double]): Double =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val seedsRes: Seq[Seq[Double]] = seeds.map { sd =>
        val cid = centroids.maxBy { case (c, cv) => (dotSeq(sd, cv), -c) }._1
        val cv = centroids.find(_._1 == cid).get._2
        sd.zip(cv).map { case (x, y) => x - y }
      }
      // residual of `v` against its assigned cell: one 16-branch CASE over
      // a zip_with subtraction — projection-only, rides the encode pass
      def residCol(cellCol: Column, v: Column): Column = coalesce(centroids.map {
        case (cid, cv) => when(cellCol === cid,
          zip_with(v, typedLit(cv), (x, y) => x.cast("double") - y))
      }: _*)
      val tcells = e.filter(col("vec_id") >= NumQueries)
        .withColumn("cell", cellOf(col("embedding"), centroids))
      val tResid = tcells
        .withColumn("resid", residCol(col("cell"), col("embedding")))
        .localCheckpoint() // feeds the training agg AND the encode pass once
      // ONE Lloyd refinement of the residual codebook over the corpus —
      // FAISS trains its PQ on residuals, and it is exactly this training
      // that makes by_residual pay: assign each subvector under the seed
      // residuals, then replace each (sub, code) centroid by the
      // decimal-exact mean of its assignees (empty cluster keeps its
      // seed — the warm start). K x M x 8 = 1024 doubles, the q252
      // driver-bounded artifact class; at scale, one corpus pass + one
      // 128-group aggregate.
      import graft.util.Sumd.sumd
      val meansRows = (0 until PqM).map { m =>
        tResid
          .withColumn("code", pqBest(col("resid"), m, seedsRes).getField("k"))
          .select(lit(m).as("sub"), col("code"),
            posexplode(slice(col("resid"), m * PqSub + 1, PqSub)).as(Seq("pos", "x")))
      }.reduce(_ unionByName _)
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg((sumd(col("x")) / count(lit(1))).as("m"))
        .collect()
      val meanOf: Map[(Int, Int, Int), Double] = meansRows.map(r =>
        (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      val seedsRes1: Seq[Seq[Double]] = (0 until IvfCells).map { k =>
        (0 until MaxSimSegs * MaxSimDim).map { i =>
          meanOf.getOrElse((i / PqSub, k, i % PqSub), seedsRes(k)(i))
        }
      }
      val tgtRes = tResid
        .withColumn("codes", array((0 until PqM).map(m =>
          pqBest(col("resid"), m, seedsRes1).getField("k")): _*))
        .select(col("vec_id"), col("cell"), col("codes"))
      val tgtRaw = tcells
        .withColumn("codes", array((0 until PqM).map(m =>
          pqBest(col("embedding"), m, seeds).getField("k")): _*))
        .select(col("vec_id"), col("cell"), col("codes"))
      val qcells = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(array(centroids.map { case (cid, c) =>
            struct(lit(cid).as("cell"), dotd(col("embedding"), typedLit(c)).as("d"))
          }: _*)).as("cc"))
        .select(col("qid"), col("qe"), col("cc.cell").as("cell"), col("cc.d").as("d"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cell"))
      val probed = qcells.withColumn("prank", row_number().over(pw))
        .filter(col("prank") <= IvfProbes)
      val probesRes = probed
        .withColumn("qresid", residCol(col("cell"), col("qe")))
        .withColumn("adc", array((0 until PqM).map(m =>
          array((0 until IvfCells).map(k => subD2(col("qresid"), m, seedsRes1(k))): _*)): _*))
        .select(col("qid"), col("cell"), col("adc"))
      val probesRaw = probed
        .withColumn("adc", array((0 until PqM).map(m =>
          array((0 until IvfCells).map(k => subD2(col("qe"), m, seeds(k))): _*)): _*))
        .select(col("qid"), col("cell"), col("adc"))
      val adist = (0 until PqM).map(m =>
        element_at(element_at(col("adc"), m + 1), element_at(col("codes"), m + 1) + 1))
        .reduce(_ + _)
      val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
      def topk(tgt: DataFrame, probes: DataFrame) = tgt.join(broadcast(probes), "cell")
        .withColumn("adist", adist)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid").as("query_id"), col("rank"),
          col("vec_id").as("neighbor_id"), col("adist"))
      val resTopk = topk(tgtRes, probesRes).localCheckpoint()
      val rawTopk = topk(tgtRaw, probesRaw)
      // SELF-AUDIT 1 (the require): quantization FIDELITY — mean encode
      // error (the chosen code's own subspace distance, summed over
      // subspaces, decimal-exact mean) must be strictly better under the
      // trained residual codebook than under q126's raw codes. This is the
      // mechanism by_residual exists for, and unlike recall it is not
      // chance-dominated here: these synthetic embeddings are ISOTROPIC,
      // so top-5-recall comparisons between two sublinear methods measure
      // noise (the q126 calibration-honesty note above) — recall is
      // therefore REPORTED and hash-pinned per query (audit 2) rather than
      // order-required.
      def encodeErr(df: DataFrame, v: String, cb: Seq[Seq[Double]]): Double = df
        .select((0 until PqM).map(m => pqBest(col(v), m, cb).getField("d"))
          .reduce(_ + _).as("err"))
        .agg((sumd(col("err")) / count(lit(1))).as("e")).head().getDouble(0)
      val resErr = encodeErr(tResid, "resid", seedsRes1)
      val rawErr = encodeErr(tcells, "embedding", seeds)
      require(resErr < rawErr,
        f"trained by_residual must reconstruct strictly better than raw " +
          f"codes: $resErr%.6f vs $rawErr%.6f")
      // SELF-AUDIT 2: per-query matched counts vs the exact top-5, both
      // pipelines, emitted as hash-pinned rows
      val brute = bruteTopKSet(e)
      def matched(tk: DataFrame, as: String) =
        tk.select(col("query_id"), col("neighbor_id"))
          .join(brute, col("query_id") === col("bq") &&
            col("neighbor_id") === col("bn"), "left")
          .groupBy(col("query_id")).agg(count(col("bq")).as(as))
      val audit = matched(resTopk, "res_matches")
        .join(matched(rawTopk, "raw_matches"), Seq("query_id"), "full_outer")
        .na.fill(0L, Seq("res_matches", "raw_matches"))
        .localCheckpoint()
      val sums = audit.agg(sum(col("res_matches")), sum(col("raw_matches"))).head()
      require(sums.getLong(0) >= sums.getLong(1),
        s"on clustered data by_residual must beat or tie raw-code recall: " +
          s"res=${sums.getLong(0)} raw=${sums.getLong(1)} of ${NumQueries * TopK}")
      resTopk.join(broadcast(audit), "query_id")
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("adist"),
          col("res_matches"), col("raw_matches"))
        .repartition(1).sortWithinPartitions(col("query_id"), col("rank"))
    }),

    // ---- q107: ONE PCA power-iteration step over the corpus embeddings —
    //      the spectral sibling of q62's k-means step (top principal
    //      direction = the axis embedding-space analyses whiten/project
    //      against). v1 = normalize(X^T X v0) computed WITHOUT forming the
    //      64x64 Gram matrix: per row one fused dot d = x.v0 (the q50
    //      codegen kernel), then x*d accumulated per DIMENSION as a
    //      partial+final SUMD aggregate (order-independent decimal, so
    //      Spark's partial-agg order cannot drift from the oracle's);
    //      the 64-row result normalizes via the same SUMD of squares.
    //      One corpus pass, one 64-group shuffle, 64-row broadcasts —
    //      at 100 TB the pass is bandwidth-bound and the driver never
    //      sees a vector. lambda (the Rayleigh estimate ||X^T X v0||)
    //      rides along for convergence monitoring.
    "q107_pca_step" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import graft.util.Sumd.sumd
      val e = t(s, dir, "embeddings")
        .repartition(col("vec_id")) // spread the kernel work (single-file input)
        .filter(col("vec_id") >= NumQueries)
        .withColumn("d", dotd(col("embedding"), typedLit(pcaV0)))
      val sums = e
        .select(col("d"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("pos").cast("long").as("pos"))
        .agg(sumd(col("x").cast("double") * col("d")).as("s"))
        .localCheckpoint() // feeds BOTH the norm aggregate and the projection
      val nrm = sums.agg(sqrt(sumd(col("s") * col("s"))).as("lambda"))
      sums.crossJoin(broadcast(nrm))
        .select(col("pos"), (col("s") / col("lambda")).as("loading"), col("lambda"))
        .repartition(1).sortWithinPartitions(col("pos"))
    })
  )

  /** [[subD2]]'s DuckDB mirror over a sub-index EXPRESSION (column or
    * literal): identical per-element ops and fold order, so the doubles are
    * bit-identical. `v`/`c` are float-list expressions, `sub` 0-based. */
  private def subD2Sql(v: String, c: String, sub: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${PqSub + 1}),
          i -> (CAST($v[($sub)*$PqSub + i] AS DOUBLE) - CAST($c[($sub)*$PqSub + i] AS DOUBLE))
             * (CAST($v[($sub)*$PqSub + i] AS DOUBLE) - CAST($c[($sub)*$PqSub + i] AS DOUBLE)))),
        (acc, x) -> acc + x)"""

  private def codesSql(extra: String): String = s"""
    SELECT vec_id, embedding,
      sqrt(${dotSql("embedding", "embedding")}) AS nrm $extra
    FROM embeddings"""

  /** Oracle-side mirrors of [[bruteTopKSet]] / [[withRecall]] — the same
    * exact baseline and matches/k arithmetic, so `recall_k` hash-matches.
    * (The oracle needs no raise_error: the bound is the SPARK plan's
    * self-check; the oracle just reproduces the audited value.) */
  private def bruteTopKSqlCte: String = s"""
      brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${dotSql("q.embedding", "t.embedding")} / (q.nrm * t.nrm) DESC,
                t.vec_id) AS rank
          FROM e q JOIN e t ON q.vec_id < $NumQueries AND t.vec_id >= $NumQueries) bx
        WHERE rank <= $TopK)"""

  private def recallSqlCte: String = s"""
      rec AS (
        SELECT a.query_id, count(b.neighbor_id) / $TopK.0 AS recall_k
        FROM topk a LEFT JOIN brute b
          ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
        GROUP BY a.query_id)"""

  /** q180's oracle: the greedy MMR loop unrolled into MmrK chained CTEs —
    * each round re-derives the identical score expression (shared lam/mu
    * literals), excludes prior picks with NOT EXISTS (the anti-join
    * mirror), and takes the (score desc, vec_id) rank-1 row per query. */
  private def mmrOracleSql: String = {
    val head = s"""
      WITH e AS (${codesSql("")}),
      scored AS (
        SELECT q.vec_id AS qid, t.vec_id, t.embedding, t.nrm,
          ${dotSql("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS rel
        FROM e q JOIN e t ON q.vec_id < $NumQueries AND t.vec_id >= $NumQueries),
      cand AS (
        SELECT qid, vec_id, rel, embedding, nrm FROM (
          SELECT qid, vec_id, rel, embedding, nrm,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rk
          FROM scored) x WHERE rk <= $MmrPool),
      sim AS (
        SELECT a.qid, a.vec_id AS va, b.vec_id AS vb,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
        FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
      sel1 AS (
        SELECT qid, CAST(1 AS BIGINT) AS step, vec_id, score FROM (
          SELECT qid, vec_id, $MmrLam * rel - $MmrMu * 0.0 AS score,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY $MmrLam * rel - $MmrMu * 0.0 DESC, vec_id) AS rn
          FROM cand) x WHERE rn = 1),
      pre1 AS (SELECT * FROM sel1)"""
    val steps = (2 to MmrK).map { i =>
      s""",
      sel$i AS (
        SELECT qid, CAST($i AS BIGINT) AS step, vec_id, score FROM (
          SELECT c.qid, c.vec_id,
            $MmrLam * c.rel - $MmrMu * coalesce(m.msim, 0.0) AS score,
            ROW_NUMBER() OVER (PARTITION BY c.qid
              ORDER BY $MmrLam * c.rel - $MmrMu * coalesce(m.msim, 0.0) DESC,
                c.vec_id) AS rn
          FROM cand c
          LEFT JOIN (
            SELECT s.qid, s.va, max(s.sim) AS msim
            FROM sim s JOIN pre${i - 1} p ON s.qid = p.qid AND s.vb = p.vec_id
            GROUP BY s.qid, s.va) m
            ON m.qid = c.qid AND m.va = c.vec_id
          WHERE NOT EXISTS (SELECT 1 FROM pre${i - 1} p
            WHERE p.qid = c.qid AND p.vec_id = c.vec_id)) x WHERE rn = 1),
      pre$i AS (SELECT * FROM pre${i - 1} UNION ALL SELECT * FROM sel$i)"""
    }.mkString
    head + steps + s"""
      SELECT qid AS query_id, step, vec_id AS neighbor_id, score
      FROM pre$MmrK ORDER BY query_id, step"""
  }

  val oracles: Map[String, String] = Map(
    "q180_mmr_diversity" -> mmrOracleSql,
    // q172: same slices, same dot folds, same pools, same membership join.
    "q172_matryoshka" -> s"""
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm,
          embedding[1:$MrlDims] AS tr,
          sqrt(${dotSql(s"embedding[1:$MrlDims]", s"embedding[1:$MrlDims]")}) AS tnrm
        FROM embeddings),
      q AS (SELECT embedding AS qe, nrm AS qn, tr AS qt, tnrm AS qtn
            FROM e WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id,
          ${dotSql("q.qt", "e.tr")} / (q.qtn * e.tnrm) AS cos_trunc,
          ${dotSql("q.qe", "e.embedding")} / (q.qn * e.nrm) AS cos_full
        FROM e, q WHERE e.vec_id > 0),
      tpool AS (
        SELECT vec_id, cos_trunc, cos_full,
          ROW_NUMBER() OVER (ORDER BY cos_trunc DESC, vec_id) AS rank_trunc
        FROM (SELECT * FROM scored ORDER BY cos_trunc DESC, vec_id
              LIMIT $MrlTopK) tp),
      fpool AS (
        SELECT vec_id FROM scored ORDER BY cos_full DESC, vec_id
        LIMIT $MrlTopK)
      SELECT t.vec_id, t.rank_trunc, t.cos_trunc, t.cos_full,
        (f.vec_id IS NOT NULL) AS in_full_topk
      FROM tpool t LEFT JOIN fpool f ON t.vec_id = f.vec_id
      ORDER BY t.rank_trunc""",

    // q243: the same fixed 4x16 decomposition, greatest-per-query-segment,
    // and the identical ((g0+g1)+g2)+g3 fold order (shared SQL builders
    // with q249's re-rank).
    "q243_late_interaction" -> s"""
      WITH $maxSimSubnCtesSql,
      scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
          $maxSimScoreSql AS maxsim
        FROM subn q JOIN subn t ON q.vec_id < $NumQueries AND t.vec_id >= $NumQueries)
      SELECT query_id, rank, neighbor_id, maxsim FROM (
        SELECT query_id, neighbor_id, maxsim,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY maxsim DESC, neighbor_id) AS rank
        FROM scored) x
      WHERE rank <= $TopK
      ORDER BY query_id, rank""",

    "q50_ann_brute" -> s"""
      WITH e AS (${codesSql("")}),
      scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
          ${dotSql("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cos
        FROM e q JOIN e t ON q.vec_id < $NumQueries AND t.vec_id >= $NumQueries)
      SELECT query_id, rank, neighbor_id, cos FROM (
        SELECT query_id, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) x
      WHERE rank <= $TopK
      ORDER BY query_id, rank""",

    // q50's shape with a label-polarity partition in the rank window.
    "q152_hard_negatives" -> s"""
      WITH e AS (
        SELECT vec_id, embedding, label,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
          CASE WHEN t.label = q.label THEN 'pos' ELSE 'neg' END AS polarity,
          ${dotSql("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cos
        FROM e q JOIN e t ON q.vec_id < $NumQueries AND t.vec_id >= $NumQueries)
      SELECT query_id, polarity, rank, neighbor_id, cos FROM (
        SELECT query_id, polarity, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id, polarity
            ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) x
      WHERE rank <= $TopK
      ORDER BY query_id, polarity, rank""",

    // q53's exact cell/probe replay with the label carried through and the
    // polarity partition in the rank window (no recall CTEs: the decision
    // procedure is the gate).
    "q158_hard_negatives_ivf" -> s"""
      WITH e AS (${codesSql(", label")}),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      tassign AS (
        SELECT t.vec_id, t.embedding, t.nrm, t.label, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent c WHERE t.vec_id >= $NumQueries),
      tgt AS (SELECT vec_id, embedding, nrm, label, cid AS cell
        FROM tassign WHERE rn = 1),
      qprobe AS (
        SELECT q.vec_id AS qid, q.embedding AS qe, q.nrm AS qn,
          q.label AS qlab, c.cid AS cell,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${dotSql("q.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e q, cent c WHERE q.vec_id < $NumQueries),
      cand AS (
        SELECT p.qid AS query_id, t.vec_id AS neighbor_id,
          CASE WHEN t.label = p.qlab THEN 'pos' ELSE 'neg' END AS polarity,
          ${dotSql("p.qe", "t.embedding")} / (p.qn * t.nrm) AS cos
        FROM (SELECT * FROM qprobe WHERE rn <= $IvfProbes) p
        JOIN tgt t ON p.cell = t.cell)
      SELECT query_id, polarity, rank, neighbor_id, cos FROM (
        SELECT query_id, polarity, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id, polarity
            ORDER BY cos DESC, neighbor_id) AS rank
        FROM cand) x
      WHERE rank <= $TopK
      ORDER BY query_id, polarity, rank""",

    "q51_ann_lsh" -> {
      val codeExpr = (0 until LshBits).map(b =>
        s"CASE WHEN ${dotSql("embedding", planeSql(b))} > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH e AS (${codesSql(s", $codeExpr AS code")}),
      probes AS (
        SELECT vec_id AS qid, embedding AS qe, nrm AS qn,
          unnest([code] || list_transform(range(0, $LshBits), b -> xor(code, 1::BIGINT << b))) AS probe
        FROM e WHERE vec_id < $NumQueries),
      cand AS (
        SELECT p.qid AS query_id, t.vec_id AS neighbor_id,
          ${dotSql("p.qe", "t.embedding")} / (p.qn * t.nrm) AS cos
        FROM probes p JOIN e t ON p.probe = t.code AND t.vec_id >= $NumQueries),
      topk AS (
        SELECT query_id, rank, neighbor_id, cos FROM (
          SELECT query_id, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM cand) x
        WHERE rank <= $TopK),
      $bruteTopKSqlCte,
      $recallSqlCte
      SELECT t.query_id, t.rank, t.neighbor_id, t.cos, r.recall_k
      FROM topk t JOIN rec r ON t.query_id = r.query_id
      ORDER BY t.query_id, t.rank"""
    },

    // Mirrors the full IVF decision procedure — same seed centroids, same
    // index-order double folds for normalization / assignment / rerank, same
    // (desc, id) tie orders — so cells, probes, and ranks are bit-identical.
    "q53_ann_ivf" -> s"""
      WITH e AS (${codesSql("")}),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      tassign AS (
        SELECT t.vec_id, t.embedding, t.nrm, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent c WHERE t.vec_id >= $NumQueries),
      tgt AS (SELECT vec_id, embedding, nrm, cid AS cell FROM tassign WHERE rn = 1),
      qprobe AS (
        SELECT q.vec_id AS qid, q.embedding AS qe, q.nrm AS qn, c.cid AS cell,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${dotSql("q.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e q, cent c WHERE q.vec_id < $NumQueries),
      cand AS (
        SELECT p.qid AS query_id, t.vec_id AS neighbor_id,
          ${dotSql("p.qe", "t.embedding")} / (p.qn * t.nrm) AS cos
        FROM (SELECT * FROM qprobe WHERE rn <= $IvfProbes) p
        JOIN tgt t ON p.cell = t.cell),
      topk AS (
        SELECT query_id, rank, neighbor_id, cos FROM (
          SELECT query_id, neighbor_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM cand) x
        WHERE rank <= $TopK),
      $bruteTopKSqlCte,
      $recallSqlCte
      SELECT t.query_id, t.rank, t.neighbor_id, t.cos, r.recall_k
      FROM topk t JOIN rec r ON t.query_id = r.query_id
      ORDER BY t.query_id, t.rank""",

    // q53's cell/probe replay with the probe-rank cut generalized over the
    // sweep arms (a lateral over the nprobe list); recall joined per
    // (nprobe, query) against the same brute CTE.
    "q190_ivf_recall_sweep" -> s"""
      WITH e AS (${codesSql("")}),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      tassign AS (
        SELECT t.vec_id, t.embedding, t.nrm, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent c WHERE t.vec_id >= $NumQueries),
      tgt AS (SELECT vec_id, embedding, nrm, cid AS cell FROM tassign WHERE rn = 1),
      qprobe AS (
        SELECT q.vec_id AS qid, q.embedding AS qe, q.nrm AS qn, c.cid AS cell,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${dotSql("q.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e q, cent c WHERE q.vec_id < $NumQueries),
      np AS (SELECT unnest([${IvfSweep.mkString(", ")}]) AS nprobe),
      cand AS (
        SELECT np.nprobe, p.qid, t.vec_id,
          ${dotSql("p.qe", "t.embedding")} / (p.qn * t.nrm) AS cos
        FROM qprobe p JOIN tgt t ON p.cell = t.cell
        CROSS JOIN np WHERE p.rn <= np.nprobe),
      topk AS (
        SELECT nprobe, qid AS query_id, vec_id AS neighbor_id FROM (
          SELECT nprobe, qid, vec_id,
            ROW_NUMBER() OVER (PARTITION BY nprobe, qid
              ORDER BY cos DESC, vec_id) AS rank
          FROM cand) x WHERE rank <= $TopK),
      ncand AS (
        SELECT nprobe, qid AS query_id, CAST(count(*) AS BIGINT) AS n_cand
        FROM cand GROUP BY 1, 2),
      $bruteTopKSqlCte
      SELECT CAST(t.nprobe AS BIGINT) AS nprobe, t.query_id,
        count(b.neighbor_id) / $TopK.0 AS recall_k, max(n.n_cand) AS n_cand
      FROM topk t
      LEFT JOIN brute b
        ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
      JOIN ncand n ON t.nprobe = n.nprobe AND t.query_id = n.query_id
      GROUP BY t.nprobe, t.query_id
      ORDER BY nprobe, t.query_id""",

    // Mirrors q62's full decision procedure: same centroids, same
    // index-order assignment fold, then per-(cell, dimension) means with
    // the SUMD decimal-exact convention.
    "q62_kmeans_step" -> s"""
      WITH e AS (${codesSql("")}),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      tassign AS (
        SELECT t.vec_id, t.embedding, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent c WHERE t.vec_id >= $NumQueries),
      tgt AS (SELECT vec_id, embedding, cid AS cell FROM tassign WHERE rn = 1),
      ex AS (
        SELECT cell,
          unnest(list_transform(range(1, len(embedding) + 1),
            i -> struct_pack(pos := i - 1, x := embedding[i]))) AS u
        FROM tgt)
      SELECT cell, u.pos AS pos, CAST(count(*) AS BIGINT) AS n,
        ${graft.util.Sumd.SUMD("u.x::DOUBLE")} / count(*) AS c_new
      FROM ex GROUP BY cell, u.pos
      ORDER BY cell, pos""",

    // q252: the R training rounds unrolled declaratively — per round the
    // q62 assignment/mean chain (same dot fold, same tie rule, same SUMD
    // means) plus the spherical renormalization (index-order fold of m*m,
    // one sqrt, one division — every op bit-identical cross-engine); the
    // stored leg re-emits round R's coordinates (pinning the parquet
    // round-trip exactly), the serve leg re-assigns under them.
    "q252_trained_codebook" -> {
      val rounds = 3
      def roundCtes(r: Int): String = s"""
      tassign_$r AS (
        SELECT t.vec_id, t.embedding, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent_${r - 1} c WHERE t.vec_id >= $NumQueries),
      ex_$r AS (
        SELECT cid AS cell,
          unnest(list_transform(range(1, len(embedding) + 1),
            i -> struct_pack(pos := i - 1, x := embedding[i]))) AS u
        FROM tassign_$r WHERE rn = 1),
      mean_$r AS (
        SELECT cell, u.pos AS pos, CAST(count(*) AS BIGINT) AS n,
          ${graft.util.Sumd.SUMD("u.x::DOUBLE")} / count(*) AS m
        FROM ex_$r GROUP BY cell, u.pos),
      nrm_$r AS (
        SELECT cell,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE, list(m * m ORDER BY pos)),
            (acc, v) -> acc + v)) AS nrm
        FROM mean_$r GROUP BY cell),
      cent_$r AS (
        SELECT m.cell AS cid, list(m.m / g.nrm ORDER BY m.pos) AS cv
        FROM mean_$r m JOIN nrm_$r g ON g.cell = m.cell
        GROUP BY m.cell)"""
      s"""
      WITH e AS (${codesSql("")}),
      cent_0 AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      ${(1 to rounds).map(roundCtes).mkString(",")},
      tassign_serve AS (
        SELECT t.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent_$rounds c WHERE t.vec_id >= $NumQueries),
      serve AS (
        SELECT cid AS cell, CAST(count(*) AS BIGINT) AS n
        FROM tassign_serve WHERE rn = 1 GROUP BY cid),
      trainrows AS (${(1 to rounds).map(r => s"""
        SELECT 'train' AS leg, CAST($r AS BIGINT) AS round, m.cell, m.pos, m.n,
          m.m / g.nrm AS c
        FROM mean_$r m JOIN nrm_$r g ON g.cell = m.cell""").mkString(" UNION ALL ")}),
      storedrows AS (
        SELECT 'stored' AS leg, CAST($rounds AS BIGINT) AS round, m.cell, m.pos,
          CAST(0 AS BIGINT) AS n, m.m / g.nrm AS c
        FROM mean_$rounds m JOIN nrm_$rounds g ON g.cell = m.cell),
      serverows AS (
        SELECT 'serve' AS leg, CAST(${rounds + 1} AS BIGINT) AS round, cell,
          CAST(-1 AS BIGINT) AS pos, n, 0.0::DOUBLE AS c
        FROM serve)
      SELECT * FROM (SELECT * FROM trainrows UNION ALL SELECT * FROM storedrows
        UNION ALL SELECT * FROM serverows) x
      ORDER BY leg, round, cell, pos"""
    },

    // q260: the full refresh lifecycle unrolled — two base rounds (q252's
    // chain), the SUMD-exact fit audits (per-vector MAX(dot)/nrm, then the
    // decimal mean — same op order as the gate), one seeded refresh round
    // over base+drifted, and the serve counts under BOTH versions (v1 via
    // the store's AS OF 100, here just cent_2).
    "q260_codebook_refresh" -> {
      def roundCte(r: Int, corpus: String, seed: String, out: String): String = s"""
      ta_$out AS (
        SELECT t.vec_id, t.embedding, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM $corpus t, $seed c),
      ex_$out AS (
        SELECT cid AS cell,
          unnest(list_transform(range(1, len(embedding) + 1),
            i -> struct_pack(pos := i - 1, x := embedding[i]))) AS u
        FROM ta_$out WHERE rn = 1),
      mean_$out AS (
        SELECT cell, u.pos AS pos,
          ${graft.util.Sumd.SUMD("u.x::DOUBLE")} / count(*) AS m
        FROM ex_$out GROUP BY cell, u.pos),
      nrm_$out AS (
        SELECT cell,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE, list(m * m ORDER BY pos)),
            (acc, v) -> acc + v)) AS nrm
        FROM mean_$out GROUP BY cell),
      cent_$out AS (
        SELECT m.cell AS cid, list(m.m / g.nrm ORDER BY m.pos) AS cv
        FROM mean_$out m JOIN nrm_$out g ON g.cell = m.cell
        GROUP BY m.cell)"""
      def fitCte(name: String, corpus: String, seed: String): String = s"""
      ${name}_mx AS (
        SELECT t.vec_id,
          MAX(${dotSql("t.embedding", "c.cv")}) /
            sqrt(${dotSql("t.embedding", "t.embedding")}) AS mc
        FROM $corpus t, $seed c GROUP BY t.vec_id, t.embedding),
      $name AS (
        SELECT ${graft.util.Sumd.SUMD("mc")} / count(*) AS f FROM ${name}_mx)"""
      def serveCte(name: String, seed: String): String = s"""
      ${name}_a AS (
        SELECT t.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM allv t, $seed c),
      $name AS (
        SELECT cid AS cell, CAST(count(*) AS BIGINT) AS n
        FROM ${name}_a WHERE rn = 1 GROUP BY cid)"""
      s"""
      WITH base AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $NumQueries),
      fresh AS (
        SELECT vec_id + 1000000 AS vec_id, list_reverse(embedding) AS embedding
        FROM base),
      allv AS (SELECT * FROM base UNION ALL SELECT * FROM fresh),
      cent_0 AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding,
            x -> x::DOUBLE / sqrt(${dotSql("embedding", "embedding")})) AS cv
        FROM embeddings
        WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      ${roundCte(1, "base", "cent_0", "1")},
      ${roundCte(2, "base", "cent_1", "2")},
      ${fitCte("fit_base", "base", "cent_2")},
      ${fitCte("fit_new_old", "fresh", "cent_2")},
      ${roundCte(3, "allv", "cent_2", "ref")},
      ${fitCte("fit_new_ref", "fresh", "cent_ref")},
      ${serveCte("serve_v1", "cent_2")},
      ${serveCte("serve_v2", "cent_ref")},
      cb1 AS (
        SELECT 'cb_v1' AS leg, m.cell, m.pos, CAST(0 AS BIGINT) AS n,
          m.m / g.nrm AS c
        FROM mean_2 m JOIN nrm_2 g ON g.cell = m.cell),
      cb2 AS (
        SELECT 'cb_v2' AS leg, m.cell, m.pos, CAST(0 AS BIGINT) AS n,
          m.m / g.nrm AS c
        FROM mean_ref m JOIN nrm_ref g ON g.cell = m.cell),
      fits AS (
        SELECT 'fit' AS leg, -1 AS cell, 0 AS pos, CAST(0 AS BIGINT) AS n, f AS c
        FROM fit_base
        UNION ALL SELECT 'fit', -1, 1, 0, f FROM fit_new_old
        UNION ALL SELECT 'fit', -1, 2, 0, f FROM fit_new_ref),
      serves AS (
        SELECT 'serve_v1' AS leg, cell, -1 AS pos, n, 0.0::DOUBLE AS c FROM serve_v1
        UNION ALL SELECT 'serve_v2', cell, -1, n, 0.0::DOUBLE FROM serve_v2)
      SELECT leg, CAST(cell AS INT) AS cell, CAST(pos AS BIGINT) AS pos, n,
        CAST(c AS DOUBLE) AS c
      FROM (SELECT * FROM cb1 UNION ALL SELECT * FROM cb2
        UNION ALL SELECT * FROM fits UNION ALL SELECT * FROM serves) x
      ORDER BY leg, cell, pos"""
    },

    // Mirrors the full quantization procedure: same maxabs (abs/max over
    // exact float→double widenings), same three-IEEE-op code formula, the
    // integer code dot (order-independent — exact), and the same
    // dequantization op order, so scores and ranks are bit-identical.
    "q66_ann_quantized" -> s"""
      WITH e AS (${codesSql("")}),
      c AS (
        SELECT vec_id, maxabs,
          CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> 0::BIGINT)
          ELSE list_transform(embedding,
            x -> CAST(floor(x::DOUBLE * 127.0 / maxabs + 0.5) AS BIGINT)) END AS codes
        FROM (
          SELECT vec_id, embedding,
            list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
          FROM embeddings)),
      scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
          list_reduce(list_prepend(0::BIGINT,
            list_transform(range(1, len(q.codes) + 1), i -> q.codes[i] * t.codes[i])),
            (acc, v) -> acc + v) AS qdot,
          q.maxabs AS qm, t.maxabs AS tm
        FROM c q JOIN c t ON q.vec_id < $NumQueries AND t.vec_id >= $NumQueries),
      topk AS (
        SELECT query_id, rank, neighbor_id, qdot, score FROM (
          SELECT query_id, neighbor_id, qdot,
            qdot::DOUBLE * (qm * tm) / 16129.0 AS score,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY qdot::DOUBLE * (qm * tm) / 16129.0 DESC, neighbor_id) AS rank
          FROM scored) x
        WHERE rank <= $TopK),
      $bruteTopKSqlCte,
      $recallSqlCte
      SELECT t.query_id, t.rank, t.neighbor_id, t.qdot, t.score, r.recall_k
      FROM topk t JOIN rec r ON t.query_id = r.query_id
      ORDER BY t.query_id, t.rank""",

    // Exact all-pairs oracle over the same planted feed; DuckDB's native
    // cosine is safe here because no cosine value is emitted and the
    // planted/background margin (~1.0 vs <=0.55) dwarfs rounding.
    "q52_embed_neardup" -> s"""
      WITH feed AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000, list_transform(embedding, x -> x * 1.05) FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM feed a JOIN feed b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= $DedupCos
      ORDER BY id_a, id_b""",

    // q118: same cell argmax (identical dot fold + (desc, cid) order as
    // q62's tassign), same cosine op order, same lowest-id-wins retention.
    // The scaled copy mirrors Spark's FLOAT multiply exactly: a float
    // product is exactly representable in double (48 <= 53 mantissa bits),
    // so the double-then-REAL rounding equals the direct float multiply.
    "q125_pq_encode" -> s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $NumQueries),
      seeds AS (
        SELECT vec_id - $NumQueries AS k, embedding AS ce FROM embeddings
        WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      pairs AS (
        SELECT c.vec_id, m.m AS sub, s.k,
          ${subD2Sql("c.embedding", "s.ce", "m.m")} AS d2
        FROM corpus c
        CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) m
        CROSS JOIN seeds s),
      ranked AS (
        SELECT vec_id, sub, k, d2,
          ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, k) AS rn
        FROM pairs)
      SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(k AS BIGINT) AS code, d2
      FROM ranked WHERE rn = 1
      ORDER BY vec_id, sub""",

    // Replays q126's FULL decision procedure: same normalized-centroid cell
    // argmax, same probe order, same PQ code argmin, same ADC lookups
    // folded in subspace order (list aggregate with ORDER BY sub = the
    // plan's in-row left fold; 0.0+x is exact, so the prepend changes
    // nothing).
    "q126_ivfpq_search" -> s"""
      WITH e AS (${codesSql("")}),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      seeds AS (
        SELECT vec_id - $NumQueries AS k, embedding AS ce FROM e
        WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      subs AS (SELECT unnest(range(0, $PqM)) AS sub),
      tassign AS (
        SELECT t.vec_id, t.embedding, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent c WHERE t.vec_id >= $NumQueries),
      tgt AS (SELECT vec_id, embedding, cid AS cell FROM tassign WHERE rn = 1),
      tpairs AS (
        SELECT t.vec_id, m.sub, s.k,
          ${subD2Sql("t.embedding", "s.ce", "m.sub")} AS d2
        FROM tgt t CROSS JOIN subs m CROSS JOIN seeds s),
      tcode AS (
        SELECT vec_id, sub, k AS code FROM (
          SELECT vec_id, sub, k,
            ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, k) AS rn
          FROM tpairs) x WHERE rn = 1),
      qprobe AS (
        SELECT q.vec_id AS qid, c.cid AS cell,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${dotSql("q.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e q, cent c WHERE q.vec_id < $NumQueries),
      qadc AS (
        SELECT q.vec_id AS qid, m.sub, s.k,
          ${subD2Sql("q.embedding", "s.ce", "m.sub")} AS qd2
        FROM e q CROSS JOIN subs m CROSS JOIN seeds s WHERE q.vec_id < $NumQueries),
      cand AS (
        SELECT p.qid, t.vec_id
        FROM (SELECT qid, cell FROM qprobe WHERE rn <= $IvfProbes) p
        JOIN tgt t ON p.cell = t.cell),
      cdist AS (
        SELECT c.qid, c.vec_id,
          list_reduce(list_prepend(0.0::DOUBLE, list(a.qd2 ORDER BY tc.sub)),
            (acc, x) -> acc + x) AS adist
        FROM cand c
        JOIN tcode tc ON tc.vec_id = c.vec_id
        JOIN qadc a ON a.qid = c.qid AND a.sub = tc.sub AND a.k = tc.code
        GROUP BY c.qid, c.vec_id)
      SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank,
        vec_id AS neighbor_id, adist
      FROM (
        SELECT qid, vec_id, adist,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
        FROM cdist) x
      WHERE rank <= $TopK
      ORDER BY query_id, rank""",

    // q268: q126's replay extended with the residual path — seed cells,
    // residual codebook (seed minus own-cell centroid), residual codes,
    // PER-PROBED-CELL ADC tables, ranks, and BOTH pipelines' brute-match
    // audits. Every double rides the shared index-order folds.
    "q268_residual_ivfpq" -> s"""
      WITH e0 AS (${codesSql("")}),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE / nrm) AS cv
        FROM e0 WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      seeds AS (
        SELECT vec_id - $NumQueries AS k, embedding AS ce FROM e0
        WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      ew AS (
        SELECT v.vec_id,
          list_transform(range(1, 65),
            i -> CAST(c.cv[i] + v.embedding[i]::DOUBLE * 0.25 AS REAL)) AS embedding
        FROM e0 v JOIN cent c ON c.cid = CAST(v.vec_id % $IvfCells AS INT)),
      e AS (
        SELECT vec_id, embedding,
          sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM ew),
      subs AS (SELECT unnest(range(0, $PqM)) AS sub),
      scell AS (
        SELECT s.k, c.cid,
          ROW_NUMBER() OVER (PARTITION BY s.k
            ORDER BY ${dotSql("s.ce", "c.cv")} DESC, c.cid) AS rn
        FROM seeds s, cent c),
      sres AS (
        SELECT s.k,
          list_transform(range(1, 65), i -> s.ce[i]::DOUBLE - c.cv[i]) AS rce
        FROM seeds s
        JOIN scell x ON x.k = s.k AND x.rn = 1
        JOIN cent c ON c.cid = x.cid),
      tassign AS (
        SELECT t.vec_id, t.embedding, c.cid,
          ROW_NUMBER() OVER (PARTITION BY t.vec_id
            ORDER BY ${dotSql("t.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e t, cent c WHERE t.vec_id >= $NumQueries),
      tgt AS (SELECT vec_id, embedding, cid AS cell FROM tassign WHERE rn = 1),
      tres AS (
        SELECT t.vec_id, t.cell,
          list_transform(range(1, 65), i -> t.embedding[i]::DOUBLE - c.cv[i]) AS rv
        FROM tgt t JOIN cent c ON c.cid = t.cell),
      rpairs0 AS (
        SELECT t.vec_id, m.sub, s.k, ${subD2Sql("t.rv", "s.rce", "m.sub")} AS d2
        FROM tres t CROSS JOIN subs m CROSS JOIN sres s),
      rcode0 AS (
        SELECT vec_id, sub, k AS code FROM (
          SELECT vec_id, sub, k,
            ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, k) AS rn
          FROM rpairs0) x WHERE rn = 1),
      poss AS (SELECT unnest(range(0, $PqSub)) AS pos),
      rmean AS (
        SELECT rc.sub, rc.code, p.pos,
          CAST(SUM(CAST(t.rv[rc.sub * $PqSub + p.pos + 1] AS DECIMAL(18,6)))
            AS DOUBLE) / count(*) AS m
        FROM rcode0 rc
        JOIN tres t ON t.vec_id = rc.vec_id
        CROSS JOIN poss p
        GROUP BY rc.sub, rc.code, p.pos),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      sres1 AS (
        SELECT s.k, list(coalesce(r.m, s.rce[d.i]) ORDER BY d.i) AS rce
        FROM sres s CROSS JOIN dims d
        LEFT JOIN rmean r ON r.sub = (d.i - 1) // $PqSub
          AND r.code = s.k AND r.pos = (d.i - 1) % $PqSub
        GROUP BY s.k),
      rpairs AS (
        SELECT t.vec_id, m.sub, s.k, ${subD2Sql("t.rv", "s.rce", "m.sub")} AS d2
        FROM tres t CROSS JOIN subs m CROSS JOIN sres1 s),
      rcode AS (
        SELECT vec_id, sub, k AS code FROM (
          SELECT vec_id, sub, k,
            ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, k) AS rn
          FROM rpairs) x WHERE rn = 1),
      tpairs AS (
        SELECT t.vec_id, m.sub, s.k,
          ${subD2Sql("t.embedding", "s.ce", "m.sub")} AS d2
        FROM tgt t CROSS JOIN subs m CROSS JOIN seeds s),
      tcode AS (
        SELECT vec_id, sub, k AS code FROM (
          SELECT vec_id, sub, k,
            ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, k) AS rn
          FROM tpairs) x WHERE rn = 1),
      qprobe AS (
        SELECT q.vec_id AS qid, c.cid AS cell,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ${dotSql("q.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM e q, cent c WHERE q.vec_id < $NumQueries),
      qres AS (
        SELECT p.qid, p.cell,
          list_transform(range(1, 65), i -> q.embedding[i]::DOUBLE - c.cv[i]) AS qrv
        FROM (SELECT qid, cell FROM qprobe WHERE rn <= $IvfProbes) p
        JOIN e q ON q.vec_id = p.qid
        JOIN cent c ON c.cid = p.cell),
      radc AS (
        SELECT r.qid, r.cell, m.sub, s.k,
          ${subD2Sql("r.qrv", "s.rce", "m.sub")} AS qd2
        FROM qres r CROSS JOIN subs m CROSS JOIN sres1 s),
      rcand AS (
        SELECT r.qid, r.cell, t.vec_id
        FROM (SELECT DISTINCT qid, cell FROM qres) r
        JOIN tgt t ON t.cell = r.cell),
      rdist AS (
        SELECT c.qid, c.vec_id,
          list_reduce(list_prepend(0.0::DOUBLE, list(a.qd2 ORDER BY rc.sub)),
            (acc, x) -> acc + x) AS adist
        FROM rcand c
        JOIN rcode rc ON rc.vec_id = c.vec_id
        JOIN radc a ON a.qid = c.qid AND a.cell = c.cell
          AND a.sub = rc.sub AND a.k = rc.code
        GROUP BY c.qid, c.vec_id),
      restop AS (
        SELECT qid, vec_id, adist,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
        FROM rdist),
      qadc AS (
        SELECT q.vec_id AS qid, m.sub, s.k,
          ${subD2Sql("q.embedding", "s.ce", "m.sub")} AS qd2
        FROM e q CROSS JOIN subs m CROSS JOIN seeds s WHERE q.vec_id < $NumQueries),
      cand AS (
        SELECT p.qid, t.vec_id
        FROM (SELECT qid, cell FROM qprobe WHERE rn <= $IvfProbes) p
        JOIN tgt t ON p.cell = t.cell),
      cdist AS (
        SELECT c.qid, c.vec_id,
          list_reduce(list_prepend(0.0::DOUBLE, list(a.qd2 ORDER BY tc.sub)),
            (acc, x) -> acc + x) AS adist
        FROM cand c
        JOIN tcode tc ON tc.vec_id = c.vec_id
        JOIN qadc a ON a.qid = c.qid AND a.sub = tc.sub AND a.k = tc.code
        GROUP BY c.qid, c.vec_id),
      rawtop AS (
        SELECT qid, vec_id,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
        FROM cdist),
      $bruteTopKSqlCte,
      rmatch AS (
        SELECT a.qid AS query_id, count(b.neighbor_id) AS res_matches
        FROM (SELECT qid, vec_id FROM restop WHERE rank <= $TopK) a
        LEFT JOIN brute b ON b.query_id = a.qid AND b.neighbor_id = a.vec_id
        GROUP BY a.qid),
      wmatch AS (
        SELECT a.qid AS query_id, count(b.neighbor_id) AS raw_matches
        FROM (SELECT qid, vec_id FROM rawtop WHERE rank <= $TopK) a
        LEFT JOIN brute b ON b.query_id = a.qid AND b.neighbor_id = a.vec_id
        GROUP BY a.qid)
      SELECT r.qid AS query_id, CAST(r.rank AS BIGINT) AS rank,
        r.vec_id AS neighbor_id, r.adist, rm.res_matches, wm.raw_matches
      FROM restop r
      JOIN rmatch rm ON rm.query_id = r.qid
      JOIN wmatch wm ON wm.query_id = r.qid
      WHERE r.rank <= $TopK
      ORDER BY query_id, rank""",

    "q118_semantic_dedup" -> s"""
      WITH base AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $NumQueries),
      feed AS (
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT vec_id + 10000,
          list_transform(embedding, x -> CAST(x * CAST(1.05 AS REAL) AS REAL))
        FROM base),
      cent AS (
        SELECT CAST(vec_id - $NumQueries AS INT) AS cid,
          list_transform(embedding, x -> x::DOUBLE /
            sqrt(${dotSql("embedding", "embedding")})) AS cv
        FROM embeddings
        WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + IvfCells}),
      assign AS (
        SELECT f.vec_id, f.embedding,
          sqrt(${dotSql("f.embedding", "f.embedding")}) AS nrm, c.cid,
          ROW_NUMBER() OVER (PARTITION BY f.vec_id
            ORDER BY ${dotSql("f.embedding", "c.cv")} DESC, c.cid) AS rn
        FROM feed f, cent c),
      a2 AS (SELECT vec_id, embedding, nrm, cid AS cell FROM assign WHERE rn = 1),
      dom AS (
        SELECT DISTINCT b.vec_id
        FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $SemCos)
      SELECT vec_id, CAST(cell AS INT) AS cell FROM a2
      WHERE vec_id NOT IN (SELECT vec_id FROM dom)
      ORDER BY vec_id"""
  ) ++ Map(
    // Same fold order per row (dotSql), same order-independent decimal
    // accumulation per dimension, same normalization op order.
    "q107_pca_step" -> s"""
      WITH e AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $NumQueries),
      d AS (
        SELECT vec_id, embedding,
          ${dotSql("embedding", pcaV0Sql)} AS dd
        FROM e),
      ex AS (
        SELECT unnest(list_transform(range(1, len(embedding) + 1),
          i -> struct_pack(pos := i - 1, y := embedding[i]::DOUBLE * dd))) AS u
        FROM d),
      s AS (
        SELECT u.pos AS pos, ${graft.util.Sumd.SUMD("u.y")} AS s
        FROM ex GROUP BY u.pos),
      n AS (SELECT sqrt(${graft.util.Sumd.SUMD("s * s")}) AS lambda FROM s)
      SELECT s.pos, s.s / n.lambda AS loading, n.lambda
      FROM s, n ORDER BY pos"""
  )
}
