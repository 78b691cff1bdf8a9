package graft.ext

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The distributed min-label connected-components loop behind q54 (the
  * dedup-clustering operator) on synthetic graphs whose components are
  * known exactly. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Corpus.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, clique, and isolated pair each converge to the component min") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),          // chain
      (10L, 11L), (10L, 12L), (11L, 12L),    // triangle
      (21L, 20L))                            // pair, reversed order
    val got = cc(pairs)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a 30-node chain (worst-case diameter) still converges") {
    val pairs = (1L until 30L).map(i => (i, i + 1))
    val got = cc(pairs)
    assert(got.values.toSet == Set(1L), s"all labels must collapse to 1, got $got")
    assert(got.size == 30)
  }

  test("docs in no pair are absent; singletons are not fabricated") {
    val got = cc(Seq((5L, 6L)))
    assert(got.keySet == Set(5L, 6L))
  }

  test("malformed self-pairs are dropped identically by both dispatch paths") {
    import spark.implicits._
    val pairs = Seq((7L, 7L), (1L, 2L)).toDF("id_a", "id_b")
    val uf = Corpus.unionFindLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Corpus.connectedComponentsLoop(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf == Map(1L -> 1L, 2L -> 1L) && uf == loop,
      s"self-pair handling must not depend on the dispatch path: uf=$uf loop=$loop")
  }

  test("loop non-convergence raises instead of returning partial clusters") {
    import spark.implicits._
    // a 20-link chain needs >2 contraction rounds; the loop must fail loud
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException](
      Corpus.connectedComponentsLoop(pairs, maxIters = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("a 2000-node chain (diameter >> iteration budget) converges via star contraction") {
    import spark.implicits._
    // plain min-label propagation would need 2000 rounds here — the
    // large-star/small-star loop must finish within the DEFAULT budget
    val pairs = (1L until 2000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Corpus.connectedComponentsLoop(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 2000 && got.values.toSet == Set(1L),
      s"all 2000 chain nodes must collapse to label 1 (got ${got.values.toSet.take(5)}...)")
  }

  test("driver union-find and the distributed loop label identically") {
    import spark.implicits._
    // chains, a clique, cross-links, isolated pairs — reversed orders mixed in
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (10L, 11L), (12L, 10L), (11L, 12L),
      (21L, 20L), (30L, 31L), (31L, 32L), (33L, 32L),
      (40L, 41L)).toDF("id_a", "id_b")
    val uf = Corpus.unionFindLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Corpus.connectedComponentsLoop(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf.nonEmpty && uf == loop, s"uf=$uf loop=$loop")
  }

  test("dispatch: above the driver bound the distributed loop runs") {
    import spark.implicits._
    spark.conf.set(Corpus.CcMaxDriverPairsConf, "3")
    try {
      // 5 pairs > bound 3 -> loop path; result must still be correct
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
        .toDF("id_a", "id_b")
      val got = Corpus.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    } finally spark.conf.unset(Corpus.CcMaxDriverPairsConf)
  }

  test("removeBoilerplateLines drops high-df lines, keeps order and uniques") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // 6 docs share the header "promo banner" (df=6 >= BoilerDf=5); each has
    // a unique content line; doc 0 also repeats a line seen in only 2 docs
    // (df=2 < 5 -> kept)
    val lines = (0L until 6L).flatMap { d =>
      Seq((d, 0L, "promo banner"), (d, 1L, s"content line $d")) ++
        (if (d < 2) Seq((d, 2L, "semi rare line")) else Nil)
    }.toDF("doc_id", "li", "line")
    val got = Corpus.removeBoilerplateLines(lines)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // expected clean_hash = polyHash of the kept lines joined in li order
    def ph(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % TextOps.HashMod)
    assert(got.length == 6)
    got.foreach { case (d, total, kept, hash) =>
      val expTotal = if (d < 2) 3L else 2L
      val expKeptText =
        if (d < 2) s"content line $d | semi rare line" else s"content line $d"
      assert(total == expTotal, s"doc $d total")
      assert(kept == expTotal - 1, s"doc $d kept (header must be dropped)")
      assert(hash == ph(expKeptText), s"doc $d clean hash")
    }
  }

  test("bpeStep merges greedily left-to-right, never relapping in one pass") {
    import spark.implicits._
    // best pair is (a,a) [cnt 10*3+3*2=36]; greedy order: [a,a,a,a] ->
    // [aa,aa] (second pair starts AFTER the first merge), [a,a,a] -> [aa,a]
    val vocab = Seq((10L, Seq("a", "a", "a", "a")), (3L, Seq("a", "a", "a")))
      .toDF("f", "s")
    val (best, merged) = Corpus.bpeStep(vocab)
    val b = best.collect().head
    assert(b.getString(0) == "a a" && b.getLong(1) == 36L)
    val got = merged.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(10L) == Seq("aa", "aa"), s"got ${got(10L)}")
    assert(got(3L) == Seq("aa", "a"), s"got ${got(3L)}")
  }

  test("bpeStep passes extra vocab columns (the word) through the merge untouched") {
    import spark.implicits._
    val vocab = Seq(("ab", 3L, Seq("a", "b")), ("cd", 1L, Seq("c", "d")))
      .toDF("w", "f", "s")
    val (best, merged) = Corpus.bpeStep(vocab)
    assert(best.collect().head.getString(0) == "a b")
    val got = merged.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSet
    assert(got == Set(("ab", 3L, Seq("ab")), ("cd", 1L, Seq("c", "d"))), s"got $got")
  }

  test("bpeStep merge is boundary-safe for multi-character symbols") {
    import spark.implicits._
    // best pair is (b,c) [cnt 5]; the segmentation [ab, c] CONTAINS the
    // character sequence "b c" but must NOT merge — (ab,c) is a different
    // pair (cnt 2). A naive substring replace over a single-space join
    // would corrupt [ab, c] into [abc].
    val vocab = Seq((2L, Seq("ab", "c")), (5L, Seq("b", "c"))).toDF("f", "s")
    val (best, merged) = Corpus.bpeStep(vocab)
    val b = best.collect().head
    assert(b.getString(0) == "b c" && b.getLong(1) == 5L)
    val got = merged.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(5L) == Seq("bc"), s"got ${got(5L)}")
    assert(got(2L) == Seq("ab", "c"),
      s"cross-boundary false match: ${got(2L)}")
  }

  test("bridged cliques collapse to one component across the bridges") {
    import spark.implicits._
    // three 8-cliques on disjoint id ranges, chained by single bridge
    // edges — contraction must merge THROUGH the bridges, not just
    // within the dense blocks (a star step that only looks at dense
    // neighborhoods stalls here)
    def clique(base: Long): Seq[(Long, Long)] =
      (for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (base + i, base + j))
    val pairs = (clique(100L) ++ clique(200L) ++ clique(300L) ++
      Seq((107L, 200L), (207L, 300L))).toDF("id_a", "id_b")
    val got = Corpus.connectedComponentsLoop(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 24 && got.values.toSet == Set(100L),
      s"all three cliques must share label 100 (got ${got.values.toSet})")
  }

  test("star-of-stars with a MAX-id root converges to the global min leaf") {
    import spark.implicits._
    // hub 9000 links sub-hubs 8001..8008, each with 10 leaves BELOW it;
    // the global minimum (1) sits at a leaf two hops from the root, and
    // every hub id EXCEEDS its leaves — the adversarial direction for a
    // min-propagating star step (edges all point "downhill" in id order)
    val subHubs = (1L to 8L).map(8000L + _)
    val pairs = (subHubs.map(h => (9000L, h)) ++
      subHubs.zipWithIndex.flatMap { case (h, i) =>
        (1L to 10L).map(l => (h, i * 10L + l))
      }).toDF("id_a", "id_b")
    val got = Corpus.connectedComponentsLoop(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 89 && got.values.toSet == Set(1L),
      s"star-of-stars must collapse to the min leaf 1 (got ${got.values.toSet.take(5)})")
  }

  test("property: random graphs label identically to driver union-find (seeded)") {
    import spark.implicits._
    // the IncrementalViewSpec randomized idiom: N seeded shapes, each
    // cross-validated against the independent union-find implementation —
    // pins the witness-based convergence against topology surprises
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(140)          // nodes in play
      val m = n / 2 + rnd.nextInt(2 * n)     // edges: sparse to ~2x nodes
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (a, b) // self-pairs and duplicates included on purpose
      }
      val pairs = edges.toDF("id_a", "id_b")
      val uf = Corpus.unionFindLabels(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loop = Corpus.connectedComponentsLoop(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(uf == loop, s"seed=$seed n=$n m=$m: uf and loop diverge " +
        s"(${(uf.toSet diff loop.toSet).take(3)} vs ${(loop.toSet diff uf.toSet).take(3)})")
    }
  }

  // ---- q109's star-compression theorem: CC(star(CC(P)) ∪ N) == CC(P ∪ N).
  //      The incremental fold replaces the accumulated edge set with one
  //      (id → label) star edge per clustered node; these tests pin that
  //      the compression neither loses nor invents connectivity under the
  //      adversarial deltas a daily fold actually sees.

  private def starOf(labels: Map[Long, Long]): Seq[(Long, Long)] =
    labels.toSeq.collect { case (id, lab) if id != lab => (id, lab) }

  private def incrementalMatchesScratch(old: Seq[(Long, Long)],
                                        delta: Seq[(Long, Long)],
                                        clue: String): Unit = {
    val scratch = cc(old ++ delta)
    val inc = cc(starOf(cc(old)) ++ delta)
    assert(inc == scratch, s"$clue: incremental=$inc scratch=$scratch")
  }

  test("q109: a delta edge BELOW an old canonical relabels the whole old cluster") {
    // old cluster {10,11,12} canonical 10; delta bridges 11 to new min 1 —
    // every old member must re-label to 1 even though only 11 was touched
    incrementalMatchesScratch(
      old = Seq((10L, 11L), (11L, 12L)),
      delta = Seq((1L, 11L)),
      clue = "lower-id bridge")
  }

  test("q109: a delta edge merging two old clusters unifies both stars") {
    incrementalMatchesScratch(
      old = Seq((10L, 11L), (20L, 21L), (21L, 22L)),
      delta = Seq((22L, 11L)),
      clue = "cluster merge")
  }

  test("q109: deltas attaching brand-new nodes and untouched clusters coexist") {
    incrementalMatchesScratch(
      old = Seq((10L, 11L), (30L, 31L)),
      delta = Seq((11L, 1000011L), (40L, 41L)), // growth + a new cluster
      clue = "new nodes")
  }

  test("q109: property — random old graph + random delta folds exactly (seeded)") {
    for (seed <- 11 to 15) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(80)
      def randEdges(m: Int, lo: Long, hi: Long): Seq[(Long, Long)] =
        Seq.fill(m)((lo + rnd.nextInt((hi - lo).toInt).toLong,
                     lo + rnd.nextInt((hi - lo).toInt).toLong))
      // delta ids overlap the old range AND extend below/above it, so
      // canonical minima can move in both directions
      incrementalMatchesScratch(
        old = randEdges(n, 100, 100 + n),
        delta = randEdges(n / 3, 100 - n / 4, 100 + n + n / 4),
        clue = s"seed=$seed n=$n")
    }
  }

  test("pageRankStep: hand-computed graph, dangling mass conserved") {
    import spark.implicits._
    // 1→{2,3}, 2→3; node 3 dangles, node 4 is isolated (rank, no edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val ranks = Seq((1L, 0.25), (2L, 0.25), (3L, 0.25), (4L, 0.25)).toDF("id", "rank")
    val got = Corpus.pageRankStep(edges, ranks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the exact op order of the implementation; every intermediate here
    // (0.125, 0.375, 0.5) is DECIMAL(38,18)-exact, so doubles reproduce it
    def expect(in: Double) = (1.0 - 0.85) / 4 + 0.85 * in + 0.85 * 0.5 / 4
    assert(got == Map(
      1L -> expect(0.0), 2L -> expect(0.25 / 2),
      3L -> expect(0.25 / 2 + 0.25 / 1), 4L -> expect(0.0)), s"got $got")
    // one step must conserve total probability mass
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("graft_rep_stats kernel equals the HOF formulation on the corpus") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val kernel = docs.select(col("doc_id"),
        call_function("graft_rep_stats", col("text")).as("rs"))
      .select(col("doc_id"), element_at(col("rs"), 1), element_at(col("rs"), 2),
        element_at(col("rs"), 3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val hof = Corpus.repetitionHof(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(kernel.nonEmpty && kernel == hof,
      s"kernel/HOF divergence: ${kernel.toSet.diff(hof.toSet).take(3)}")
  }

  test("chunkOverlap: stride reconstruction recovers every doc exactly (long docs)") {
    import spark.implicits._
    val (cs, st) = (Corpus.ChunkSize.toInt, Corpus.ChunkStride.toInt)
    // lengths around every boundary: sub-window, exact window, one over,
    // exact second stride boundary, far beyond — plus a 1-token doc
    val lens = Seq(1, st, cs - 1, cs, cs + 1, cs + st, cs + st + 1, 5 * cs)
    val docs = lens.zipWithIndex.map { case (n, id) =>
      (id.toLong, (0 until n).map(i => s"w${id}x$i").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = Corpus.chunkOverlap(docs)
      .select($"doc_id", $"ci", $"chunk")
      .as[(Long, Long, Seq[String])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for (((n, id)) <- lens.zipWithIndex) {
      val expected = (0 until n).map(i => s"w${id}x$i")
      val cks = chunks(id.toLong)
      // stride reconstruction: chunk 0 + the tail past the overlap of each
      // following chunk = the original token sequence, exactly
      val rebuilt = cks.head ++ cks.tail.flatMap(_.drop(cs - st))
      assert(rebuilt == expected, s"doc $id (n=$n): bad reconstruction")
      // every chunk is full except possibly the last; the last is non-empty
      assert(cks.init.forall(_.size == cs), s"doc $id: short non-final chunk")
      assert(cks.last.nonEmpty, s"doc $id: empty final chunk")
      // chunk count matches the closed-form geometry
      val expChunks = if (n <= cs) 1 else 1 + (n - cs + st - 1) / st
      assert(cks.size == expChunks, s"doc $id: ${cks.size} chunks, want $expChunks")
    }
  }

  test("chunkOverlap: consecutive chunks overlap by exactly size-stride tokens") {
    import spark.implicits._
    val (cs, st) = (Corpus.ChunkSize.toInt, Corpus.ChunkStride.toInt)
    val docs = Seq((1L, (0 until 3 * cs).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cks = Corpus.chunkOverlap(docs)
      .select($"ci", $"chunk").as[(Long, Seq[String])]
      .collect().sortBy(_._1).map(_._2)
    cks.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(cs - st) == b.take(cs - st), "overlap region mismatch")
    }
  }

  test("dedupParagraphs: first global occurrence wins, within and across docs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // doc 1: [shared, unique1, twice] — "twice" repeats at pi 3 within doc 1
    // doc 2: [shared, unique2]        — "shared" already seen in doc 1
    val paras = Seq(
      (1L, 0L, "shared promo"), (1L, 1L, "unique one"),
      (1L, 2L, "twice"), (1L, 3L, "twice"),
      (2L, 0L, "shared promo"), (2L, 1L, "unique two"))
      .toDF("doc_id", "pi", "para")
    val got = Corpus.dedupParagraphs(paras)
      .select($"doc_id", $"paras_total", $"paras_kept")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 3L), (2L, 2L, 1L)),
      s"doc 1 keeps shared+unique+first 'twice'; doc 2 keeps only unique: $got")
    // the kept text reassembles in pi order: hash must equal the hash of
    // the expected cleaned strings (computed through the same kernel)
    val expClean = Seq(
      (1L, "shared promo | unique one | twice"),
      (2L, "unique two"))
      .toDF("doc_id", "clean")
      .select($"doc_id", TextOps.polyHash($"clean").as("h"))
      .as[(Long, Long)].collect().toMap
    val gotHash = Corpus.dedupParagraphs(paras)
      .select($"doc_id", $"clean_hash").as[(Long, Long)].collect().toMap
    assert(gotHash == expClean)
  }

  test("temperatureTargets: sqrt weights, floor'd shares, budget never exceeded") {
    import spark.implicits._
    val got = Corpus.temperatureTargets(
        Seq(("a", 900L), ("b", 100L), ("c", 400L)).toDF("source", "src_tokens"))
      .select($"source", $"src_tokens", $"w", $"budget", $"target")
      .as[(String, Long, Double, Long, Long)].collect().sortBy(_._1)
    val budget = 1400L / Corpus.TempBudgetDiv // 350
    assert(got.forall(_._4 == budget))
    // weights are exact sqrt; Σw = 30+10+20 = 60 exactly representable,
    // so targets are floor(350 * w / 60)
    assert(got.map(_._3).toSeq == Seq(30.0, 10.0, 20.0))
    assert(got.map(_._5).toSeq ==
      Seq(math.floor(350.0 * 30 / 60).toLong, math.floor(350.0 * 10 / 60).toLong,
        math.floor(350.0 * 20 / 60).toLong))
    // temperature flattening: the 9x-larger source gets only 3x the target
    assert(got.map(_._5).sum <= budget, "targets must never exceed the budget")
  }

  test("removeDuplicateSubstrings: first kept, later cut, islands merge, full dup empties") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val k = 8
    val run = "ABCDEFGHIJKL" // 12 chars: grams at 5 positions when k=8
    // doc 1 owns the run; doc 2 embeds the same run (later → cut);
    // doc 3 repeats a run twice INTERNALLY (2nd occurrence cut);
    // doc 4 is a verbatim copy of doc 1's text (fully duplicated → empty);
    // doc 5 shares nothing
    val d1 = "xx" + run + "yy"
    val d3run = "MNOPQRSTUVWX"
    val docs = Seq(
      (1L, d1),
      (2L, "aaaa" + run + "bbbb"),
      (3L, d3run + "----" + d3run),
      (4L, d1),
      (5L, "zzzzzzzzzzzzzzzzzz"))
      .toDF("doc_id", "text")
    val got = Corpus.removeDuplicateSubstrings(docs, k)
      .select($"doc_id", $"chars_total", $"chars_removed", $"clean_hash")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    def ph(x: String) = x.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    // doc 1: every gram's first occurrence (vs docs 2 and 4) → untouched
    assert(got(0) == (1L, 16L, 0L, ph(d1)), got(0).toString)
    // doc 2: the run's grams occupy positions 5..9, spans cover [5, 16] →
    // 12 chars cut, 'aaaa' + 'bbbb' remain
    assert(got(1) == (2L, 20L, 12L, ph("aaaabbbb")), got(1).toString)
    // doc 3: second internal occurrence cut (positions 17..28)
    assert(got(2) == (3L, 28L, 12L, ph(d3run + "----")), got(2).toString)
    // doc 4: every gram already seen in doc 1 → everything cut
    assert(got(3) == (4L, 16L, 16L, ph("")), got(3).toString)
    // doc 5: 18 distinct z-grams... all identical 'zzzzzzzz' grams repeat
    // internally: first kept at pos 1, positions 2..11 cut → span [2, 18]
    assert(got(4) == (5L, 18L, 17L, ph("z")), got(4).toString)
  }

  test("triangleCount: K4, path, star, duplicate/reversed/self edges") {
    import spark.implicits._
    def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
      Corpus.triangleCount(edges.toDF("a", "b"))
        .as[(Long, Long, Long)].collect().head
    // K4: 4 triangles; edges given in mixed orientation with a duplicate
    // and a self-loop (must canonicalize away)
    assert(count(Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L),
      (2L, 4L), (3L, 4L), (3L, 3L))) == (4L, 6L, 4L))
    // path: none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (4L, 3L, 0L))
    // star + one closing edge: exactly one triangle at the hub
    assert(count(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 2L))) == (6L, 6L, 1L))
  }

  test("unigramStep: hand-computed lattice — seed probs, Viterbi argmax, M-step") {
    import spark.implicits._
    // corpus "ab ab b": words ab(f=2), b(f=1).
    // seed: a: 2 (from ab x2), b: 2+1=3, ab: 2; t0 = 7.
    // p(a)=2/7, p(b)=3/7, p(ab)=2/7.
    // lattice "ab": [ab] -> 2/7 ~ .2857  vs  [a,b] -> 6/49 ~ .1224 -> [ab].
    // lattice "b": [b].
    // M-step: cnt(ab)=2, cnt(b)=1, tot=3.
    val out = Corpus.unigramStep(Seq("ab ab b").toDF("text"))
      .as[(String, Long, Double)].collect().toList
    assert(out == List(("ab", 2L, 2.0 / 3.0), ("b", 1L, 1.0 / 3.0)), out)

    // corpus "aa": seed a=2, aa=1, t0=3; [a,a] -> 4/9 beats [aa] -> 1/3,
    // so the SPLIT wins — the argmax really compares lattice paths, not
    // just "whole word first".
    val out2 = Corpus.unigramStep(Seq("aa").toDF("text"))
      .as[(String, Long, Double)].collect().toList
    assert(out2 == List(("a", 2L, 1.0)), out2)
  }

  test("temperatureTargets at full budget: tail sources upsample past their size") {
    import spark.implicits._
    // 10000 vs 100 tokens: sqrt weights 100 vs 10 → tail target ≈
    // 10100·(10/110) ≈ 918 > 100 → replication (q146's epoch regime);
    // head target ≈ 9181 < 10000 → downsample
    val got = Corpus.temperatureTargets(
        Seq(("head", 10000L), ("tail", 100L)).toDF("source", "src_tokens"),
        budgetDiv = 1L)
      .select($"source", $"src_tokens", $"target")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val Seq(h, t) = got.toSeq
    assert(h._3 < h._2, s"head must downsample: $h")
    assert(t._3 > t._2, s"tail must upsample (target beyond its tokens): $t")
    val epochs = (t._3 + t._2 - 1) / t._2
    assert(epochs >= 2, s"tail must replicate across >= 2 epochs, got $epochs")
  }

  test("gopherMatrix: hand-computed rule verdicts (q178)") {
    import spark.implicits._
    // doc 1: "the a xx yy zz" — nw=5 (< 50 fails r_words), stops {the,a}
    //   passes r_stop, mean len 10/5=2.0 fails r_wlen, cover = max bigram
    //   cnt*chars = 1*(3+1)=4? bigrams: (the,a)=4,(a,xx)=3,(xx,yy)=4,
    //   (yy,zz)=4 → cover 4, frac 4/10=0.4 fails r_2gram.
    // doc 2: 60 words "w1..w50 the a the a ..." — engineered to pass all.
    val pass = ((1 to 52).map(i => s"word$i") ++ Seq(
      "the", "a", "brick", "stone", "cloud", "river", "maple", "frost"))
      .mkString(" ")
    val got = Corpus.gopherMatrix(Seq(
        (1L, "the a xx yy zz"), (2L, pass)).toDF("doc_id", "text"))
      .orderBy($"doc_id")
      .select($"doc_id", $"nw", $"n_stop", $"r_words", $"r_wlen", $"r_stop",
        $"r_2gram", $"keep")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toList
    assert(got(0) == (1L, 5L, 2L, false, false, true, false, false), got(0))
    assert(got(1) == (2L, 60L, 2L, true, true, true, true, true), got(1))
  }
}
