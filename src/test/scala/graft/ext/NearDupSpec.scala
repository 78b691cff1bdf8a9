package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Cross-validation between the three near-dup paths (beyond the per-query
  * DuckDB oracles): the LSH candidates must reproduce the exact join, and
  * pigeonhole banding must find every Hamming-close signature pair. */
class NearDupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH output equals the exact similarity join") {
    val docs = Tables.load(spark, dir, "documents")
    val exact = NearDup.exactJaccardPairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minhashLshPairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, invented ${lsh -- exact}")
  }

  test("PPJoin prefix-filtered exact join equals the bitmap-band exact join") {
    val docs = Tables.load(spark, dir, "documents")
    val exact = NearDup.exactJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pp = NearDup.ppjoinJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(pp == exact, s"PPJoin missed ${exact -- pp}, invented ${pp -- exact}")
  }

  test("adaptive dispatch: large dictionary takes the PPJoin path, no driver dictionary") {
    import spark.implicits._
    // Deterministic corpus with a data-scale char-5-gram dictionary: 30
    // pseudo-random 9-digit "words" per doc, so distinct shingles >> the
    // bound below. Docs 2i and 2i+1 share identical text (planted J=1.0
    // pairs); cross-doc shingle overlap is negligible.
    val texts = (0 until 120).map { i =>
      val words = (0 until 30).map { j =>
        (((i / 2) * 31L + j) * 2654435761L % 1000000007L).toString
      }
      (i.toLong, words.mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    spark.conf.set(NearDup.MaxDictConf, "500")
    try {
      val df = NearDup.exactJaccardPairs(docs)
      val plan = df.queryExecution.optimizedPlan.toString
      // PPJoin verifies via array_intersect; the bitmap plan's signature is
      // the bit_count join condition. (The shingle kernel itself is behind a
      // localCheckpoint, so we assert on the post-checkpoint plan shape.)
      assert(plan.contains("array_intersect"), plan.take(2000))
      assert(!plan.contains("bit_count"), plan.take(2000))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until 60).map(i => (2L * i, 2L * i + 1)).toSet
      assert(got == want, s"missed ${want -- got}, invented ${got -- want}")
    } finally spark.conf.unset(NearDup.MaxDictConf)
  }

  test("adaptive dispatch: small dictionary keeps the bitmap fast path") {
    val docs = Tables.load(spark, dir, "documents")
    val plan = NearDup.exactJaccardPairs(docs).queryExecution.optimizedPlan.toString
    assert(plan.contains("bit_count"), plan.take(2000))
    assert(!plan.contains("array_intersect"), plan.take(2000))
  }

  test("graft_simhash kernel equals the HOF formulation on the corpus") {
    val docs = Tables.load(spark, dir, "documents")
    val both = docs
      .select(col("doc_id"),
        call_function("graft_simhash", col("text")).as("fused"),
        NearDup.simhashHofExpr.as("hof"))
      .collect()
    assert(both.nonEmpty)
    val bad = both.filter(r => r.getLong(1) != r.getLong(2))
    assert(bad.isEmpty, s"kernel/HOF divergence on doc_ids ${bad.map(_.getLong(0)).toSeq}")
  }

  test("SimHash banding finds exactly the brute-force Hamming<=3 pairs") {
    val docs = Tables.load(spark, dir, "documents")
    val sig = NearDup.withSimhash(docs)
    val banded = NearDup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("h", expr("bit_count(a.simhash ^ b.simhash)"))
      .filter(col("h") <= NearDup.HammingT)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"pigeonhole banding must be exact: missed ${brute -- banded}, invented ${banded -- brute}")
  }

  test("fuzzy vocab linkage: deletion-key blocking finds every edit-distance-1 pair") {
    import spark.implicits._
    // every edit class incl. the FIRST-char substitution that naive
    // first-letter blocking would miss; "spade" is distance 2 from "spark"
    // and must be absent; canonical = higher-count side ("spark" x3)
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spork"), // substitution (interior)
      (3L, "zpark"), // substitution (first char)
      (4L, "sprk"),  // deletion
      (5L, "sparkk"), // insertion
      (6L, "spade"), // distance 2 — excluded
      (7L, "a b")    // 1-char words: substitution via empty deletion key
    ).toDF("doc_id", "text")
    val got = NearDup.fuzzyVocabLinkage(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(4))).toSet
    val expect = Set(
      ("spark", "spork", "spark"),
      ("spark", "zpark", "spark"),
      ("spark", "sparkk", "spark"),
      ("spark", "sprk", "spark"),
      ("spork", "sprk", "spork"), // spork vs sprk: deletion of o — also dist 1
      ("a", "b", "a"))
    // compare on the pair set the algorithm must find; count ties break to w1
    val gotPairs = got.map(t => (t._1, t._2))
    val expPairs = expect.map(t => (t._1, t._2))
    assert(gotPairs == expPairs,
      s"missed ${expPairs -- gotPairs}, invented ${gotPairs -- expPairs}")
    // canonical must be the higher-frequency side everywhere spark appears
    got.filter(t => t._1 == "spark" || t._2 == "spark")
      .foreach(t => assert(t._3 == "spark", t.toString))
  }

  test("winnowPairs: contiguous overlap pairs found, boilerplate df-pruned") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def noise(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    // docs 1 and 2 share a 160-char run embedded in unrelated noise;
    // doc 3 is pure noise. Docs 100..130 all carry the SAME boilerplate
    // run — its fingerprints exceed WinnowMaxDf (20) and must be pruned,
    // so the 31 boilerplate docs produce NO pairs.
    val sharedRun = noise(160)
    val boiler = noise(160)
    val docs = (Seq(
      (1L, noise(200) + sharedRun + noise(200)),
      (2L, noise(180) + sharedRun + noise(220)),
      (3L, noise(500))) ++
      (100L to 130L).map(i => (i, noise(40) + boiler + noise(40))))
      .toDF("doc_id", "text")
    val got = NearDup.winnowPairs(docs)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)),
      s"want exactly the planted overlap pair, got $got")
  }
  test("Bloom filter: no false negatives ever; FP rate within the design bound") {
    import NearDup.{Bloom, BloomAgg, BloomBits, BloomHashes}
    val agg = new BloomAgg(BloomBits, BloomHashes)
    // build over 5k deterministic keys through the full Aggregator path
    // (reduce + merge), as the distributed build would
    val keys = (0 until 5000).map(i => i.toLong * 0x9e3779b97f4a7c15L + 17)
    val half = keys.length / 2
    val b1 = keys.take(half).foldLeft(agg.zero)(agg.reduce)
    val b2 = keys.drop(half).foldLeft(agg.zero)(agg.reduce)
    val bits = agg.merge(b1, b2)
    // every inserted key MUST probe positive (Bloom's structural guarantee)
    assert(keys.forall(Bloom.mightContain(bits, _, BloomBits, BloomHashes)))
    // non-members: (1 - e^{-kn/m})^k with n=5000, m=2^20, k=7 is ~5e-11;
    // 100k probes should observe zero positives (any hit = a broken mix)
    val fps = (1000000 until 1100000).count(i =>
      Bloom.mightContain(bits, i.toLong * 0x9e3779b97f4a7c15L + 17,
        BloomBits, BloomHashes))
    assert(fps == 0, s"$fps false positives in 100k probes at design FPR ~5e-11")
  }

}
