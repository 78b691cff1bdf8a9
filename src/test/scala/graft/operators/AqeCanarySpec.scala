package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** AQE plan-drift canary (round-12 ask #7): production runs adaptive query
  * execution, so the plan properties [[PlanSpec]] locks are only worth
  * their 100 TB claims if they SURVIVE AQE's runtime re-planning. Two
  * facts pinned here:
  *
  *  1. AQE is ON in the test conf already — Spark 4 defaults
  *     `spark.sql.adaptive.enabled=true` and no session in this repo turns
  *     it off, so every PlanSpec lock has been an under-AQE lock all along
  *     (`plan()` finalizes the adaptive plan before asserting). The canary
  *     makes that explicit: if a future conf change silently disabled AQE
  *     in tests, the locks would stop guarding what production executes —
  *     this suite fails instead.
  *  2. Under the full production AQE profile (coalescePartitions +
  *     skewJoin forced on), the invariant SUBSET that a runtime re-plan
  *     must never undo still holds: dimension joins stay broadcast,
  *     EXISTS/NOT EXISTS stay semi/anti, pushed filters stay pushed, and
  *     no near-dup/bloom join degrades to a cartesian — the exact failure
  *     classes an AQE rewrite could introduce at scale.
  */
class AqeCanarySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Final physical plan with AQE resolved (executes the query), plus the
    * formatted explain for scan-level PushedFilters — PlanSpec's reader. */
  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan.toString + "\n" +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  private val AqeConfs = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled")

  private def withAqeForced[T](f: => T): T = {
    val prev = AqeConfs.map(k => k -> spark.conf.getOption(k))
    AqeConfs.foreach(k => spark.conf.set(k, "true"))
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE is the default execution mode — PlanSpec's locks already run under it") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "adaptive execution was disabled in the test conf: every PlanSpec " +
        "lock would stop guarding what production executes")
  }

  test("broadcast + top-k survive the production AQE profile") {
    withAqeForced {
      val p = plan("q03_join_topk")
      assert(p.contains("BroadcastHashJoin"), p)
      assert(p.contains("TakeOrderedAndProject"), p)
      val stats = plan("q236_connector_stats")
      assert(stats.contains("BroadcastHashJoin"),
        "connector-stats auto-broadcast must survive AQE:\n" + stats)
    }
  }

  test("semi/anti joins and pushdown survive the production AQE profile") {
    withAqeForced {
      assert(plan("q04_semi_join").contains("LeftSemi"))
      assert(plan("q05_anti_join").contains("LeftAnti"))
      val p = plan("q02_filter_agg")
      assert(p.contains("PushedFilters: [") &&
        p.contains("GreaterThanOrEqual(l_shipdate"), p)
    }
  }

  test("no candidate join degrades to a cartesian under the production AQE profile") {
    withAqeForced {
      Seq("q41_neardup_jaccard", "q42_minhash_lsh", "q147_bloom_join",
        "q108_salted_join").foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      }
    }
  }

  test("the storage-partitioned join stays shuffle-free under the production AQE profile") {
    // q255's zero-exchange property is exactly the kind of plan shape an
    // adaptive re-plan could undo at scale (an AQE-inserted exchange would
    // silently re-pay the shuffle the layout already paid at write time) —
    // the gate's own require re-runs here under the FORCED full profile.
    withAqeForced {
      val df = SparkEntry.queries("q255_spj_join")(spark, dir)
      df.queryExecution.toRdd.foreach(_ => ())
      assert(df.count() > 0)
    }
  }

  test("the sorted SPJ stays shuffle-free AND sort-free under the production AQE profile") {
    // q262 extends q255: the layout also paid the SORT at write time, and
    // an adaptive re-plan inserting either an Exchange or a per-partition
    // Sort would silently re-pay it — the gate's own requires (no
    // "Exchange", no "Sort [" node, MOR side re-sorts, both joins agree)
    // re-run here under the FORCED full profile.
    withAqeForced {
      val df = SparkEntry.queries("q262_sorted_spj")(spark, dir)
      df.queryExecution.toRdd.foreach(_ => ())
      assert(df.count() > 0)
    }
  }

  test("the compacted-mor sorted SPJ holds BOTH directions under the production AQE profile") {
    // q276 extends q262 to merge-on-read: post-compaction the fact reports
    // its order (zero Exchange, zero Sort — requires in-gate), and a fresh
    // delta must flip the plan back to a re-sorting, resolving read. Both
    // directions re-run here under the FORCED full profile — an adaptive
    // re-plan wrongly keeping the resolve-free read after the delta would
    // serve duplicate versions, which the gate's oracle-shaped join counts
    // catch loudly.
    withAqeForced {
      val df = SparkEntry.queries("q276_sorted_mor_compact")(spark, dir)
      df.queryExecution.toRdd.foreach(_ => ())
      assert(df.count() > 0)
    }
  }
}
