package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries candidate stage behind q72 — the property the two-pass
  * heavy-hitter plan rests on: the union of per-partition summaries is a
  * SUPERSET of every term whose global count*k exceeds the stream length
  * (pass 2 then recounts exactly, so a lost candidate would be a lost
  * result row, not an approximation). */
class RetrievalSpec extends AnyFunSuite {

  private def exactHeavy(stream: Seq[String], k: Int): Set[String] = {
    val n = stream.size.toLong
    stream.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * k > n => t
    }.toSet
  }

  private def candidates(parts: Seq[Seq[String]], k: Int): Set[String] =
    parts.flatMap(p => Retrieval.misraGries(p.iterator, k)).toSet

  test("summary never exceeds the k-counter capacity") {
    val rng = new scala.util.Random(7)
    val stream = Seq.fill(10000)(s"t${rng.nextInt(5000)}")
    assert(Retrieval.misraGries(stream.iterator, 20).size <= 20)
  }

  test("zipfian streams: per-partition candidates cover every true heavy hitter") {
    for (seed <- 1 to 5; k <- Seq(5, 20, 100)) {
      val rng = new scala.util.Random(seed)
      // zipf-ish: term i with weight ~ 1/(i+1)
      val vocab = 500
      val weights = (0 until vocab).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      def draw(): String = {
        val x = rng.nextDouble() * total
        s"z${cum.indexWhere(x <= _)}"
      }
      val stream = Seq.fill(20000)(draw())
      // uneven partitioning — including a tiny and an empty partition
      val parts = Seq(
        stream.slice(0, 9000), stream.slice(9000, 9050),
        stream.slice(9050, 20000), Seq.empty[String])
      val heavy = exactHeavy(stream, k)
      val cand = candidates(parts, k)
      assert(heavy.subsetOf(cand),
        s"seed=$seed k=$k lost ${heavy.diff(cand).take(5)}")
    }
  }

  test("adversarial: heavy hitter spread thin across many partitions still survives") {
    // one term at just over n/k overall, diluted evenly over all partitions,
    // against a churn of unique distractors that force constant decrements
    val k = 10
    val parts = (0 until 8).map { p =>
      Seq.fill(130)("hot") ++ (0 until 900).map(i => s"u${p}_$i")
    }
    val n = parts.map(_.size).sum // 8240; hot = 1040 > 824
    assert(1040L * k > n)
    val shuf = new scala.util.Random(3)
    val cand = candidates(parts.map(p => shuf.shuffle(p)), k)
    assert(cand.contains("hot"), s"diluted heavy hitter lost from $cand")
  }
}
