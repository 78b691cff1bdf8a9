package graft.ext

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the bigram-LM quality scorer behind q113 (hand-computed
  * probabilities, add-one OOV backoff, sub-2-token totality) — the paths
  * the oracle gate can't isolate because train == score there. */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def score(
      train: Seq[(Long, String)], sc: Seq[(Long, String)]): Map[Long, (Long, Option[Double])] = {
    import spark.implicits._
    TextOps.lmScore(train.toDF("doc_id", "text"), sc.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
  }

  test("lmScore: hand-computed add-one bigram probabilities") {
    // "a b a c": bigrams (a,b) (b,a) (a,c), contexts a=2 b=1, V=3.
    // p = (1+1)/(2+3), (1+1)/(1+3), (1+1)/(2+3) -> mean of 0.4, 0.5, 0.4
    val got = score(Seq(1L -> "a b a c"), Seq(1L -> "a b a c"))
    val (n, s) = got(1L)
    assert(n == 3L)
    assert(math.abs(s.get - (0.4 + 0.5 + 0.4) / 3.0) < 1e-12, s)
  }

  test("lmScore: OOV pair and OOV context degrade to add-one backoff") {
    // model from "a b": V=2, contexts a=1. Scoring "x y": both counts miss
    // -> p = (0+1)/(0+2) = 0.5. Scoring "a z": pair miss, context hit
    // -> p = (0+1)/(1+2) = 1/3.
    val got = score(Seq(1L -> "a b"), Seq(2L -> "x y", 3L -> "a z"))
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2.get - 0.5) < 1e-12)
    // per-term probabilities are summed at the DECIMAL(18,6) convention
    // (see lmScore's scaladoc), so 1/3 lands as 0.333333
    assert(got(3L)._1 == 1L && math.abs(got(3L)._2.get - 1.0 / 3.0) < 5e-7)
  }

  test("lmScore: docs with fewer than two tokens emit n_bigrams=0, NULL score") {
    val got = score(Seq(1L -> "a b"), Seq(4L -> "solo", 5L -> ""))
    assert(got(4L) == ((0L, None)))
    assert(got(5L) == ((0L, None)))
  }
}
