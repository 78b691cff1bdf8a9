package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.cdc.CdcApplier

/** Materialized-view REWRITE — the optimizer half of the IVM family: the
  * engine already MAINTAINS aggregate views incrementally
  * ([[graft.cdc.IncrementalView]], q79/q97/q193/q217-q219); this
  * `Rule[LogicalPlan]` makes the optimizer SERVE them, rewriting a
  * matching aggregate over the base table into a scan of the maintained
  * view store — the classic warehouse answer-query-from-MV, Spark-native
  * through the public `Rule` + `experimental.extraOptimizations` /
  * `SparkSessionExtensions.injectOptimizerRule` hooks.
  *
  * Deliberately NARROW matching (a rewrite that fires too eagerly is a
  * wrong-results generator): the plan must be exactly
  * `Aggregate(groupBy g, [g, count(*) as c], <pruning projects>* over a
  * parquet scan of the registered base path)` — one grouping column, one
  * COUNT(*), no filters (a filtered aggregate is NOT the view's content).
  * Anything else passes through untouched. The rewritten subtree is the
  * view target's snapshot (tombstones filtered, latest state — the same
  * read every other surface uses), with the original output `ExprId`s
  * re-bound so parents above the aggregate are untouched.
  *
  * Freshness is the registrar's contract, exactly as in every warehouse
  * MV system: registering `(basePath, groupCol) -> viewDir` asserts the
  * view is maintained from the base's change feed through the IVM
  * discipline (exactly-once fold, q97); unregister around backfills.
  *
  * 100 TB: the whole point — a corpus-sized scan+shuffle collapses to a
  * groups-sized view read. The rewrite itself is driver-side pattern
  * matching, O(plan size).
  */
object GraftViewRewrite extends Rule[LogicalPlan] {

  /** (absolute base path, grouping column) -> view target dir. */
  private val views = new java.util.concurrent.ConcurrentHashMap[(String, String), String]

  def register(basePath: String, groupCol: String, viewDir: String): Unit =
    views.put((normalize(basePath), groupCol), viewDir)

  def unregister(basePath: String, groupCol: String): Unit =
    views.remove((normalize(basePath), groupCol))

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Install into an already-built session (idempotent). Sessions built
    * with `spark.sql.extensions=graft.functions.GraftExtensions` have it
    * from the start. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** The registered base path a plan subtree scans, if it is nothing but
    * column-pruning projections over one parquet relation. */
  private def baseScanPath(plan: LogicalPlan): Option[String] = plan match {
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseScanPath(child)
    case r: LogicalRelation => r.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.toList match {
          case one :: Nil => Some(normalize(one.toString))
          case _          => None
        }
      case _ => None
    }
    case _ => None
  }

  private def isCountStar(e: AggregateExpression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (views.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
          if aggExprs.length == 2 =>
        val rewrite = for {
          basePath <- baseScanPath(child)
          viewDir <- Option(views.get((basePath, g.name)))
          // output shape: [group attr, alias(count(*))]
          gOut <- aggExprs.head match {
            case a: AttributeReference if a.exprId == g.exprId => Some(a)
            case _ => None
          }
          cOut <- aggExprs(1) match {
            case a @ Alias(ae: AggregateExpression, _) if isCountStar(ae) => Some(a)
            case _ => None
          }
        } yield {
          val view = CdcApplier.snapshot(SparkSession.active, viewDir)
            .select(g.name, "cnt")
          val viewPlan =
            view.queryExecution.analyzed
          val Seq(vg, vc) = viewPlan.output
          // re-bind the original ExprIds so everything ABOVE the aggregate
          // resolves unchanged
          Project(Seq(
            Alias(vg, gOut.name)(exprId = gOut.exprId),
            Alias(vc, cOut.name)(exprId = cOut.exprId)), viewPlan)
        }
        rewrite.getOrElse(agg)
    }
  }
}
