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
}
