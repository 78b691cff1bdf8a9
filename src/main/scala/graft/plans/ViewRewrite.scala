package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  /** (absolute base path, grouping column, value column) -> a q89-shaped
    * stats view target `(key, cnt, sum: decimal, mn, mx, avg)` serving
    * COUNT(*) / SUM / MIN / MAX / AVG of the value column in one row. */
  private val statsViews =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]

  def register(basePath: String, groupCol: String, viewDir: String): Unit =
    views.put((normalize(basePath), groupCol), viewDir)

  def unregister(basePath: String, groupCol: String): Unit =
    views.remove((normalize(basePath), groupCol))

  def registerStats(basePath: String, groupCol: String, valueCol: String,
      viewDir: String): Unit =
    statsViews.put((normalize(basePath), groupCol, valueCol), viewDir)

  def unregisterStats(basePath: String, groupCol: String, valueCol: String): Unit =
    statsViews.remove((normalize(basePath), groupCol, valueCol))

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

  /** The count(*)-only rewrite against a `(key, cnt)` view store. */
  private def countRewrite(g: AttributeReference, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    for {
      _ <- if (aggExprs.length == 2) Some(()) else None
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
      val viewPlan = CdcApplier.snapshot(SparkSession.active, viewDir)
        .select(g.name, "cnt").queryExecution.analyzed
      val Seq(vg, vc) = viewPlan.output
      // re-bind the original ExprIds so everything ABOVE the aggregate
      // resolves unchanged
      Project(Seq(
        Alias(vg, gOut.name)(exprId = gOut.exprId),
        Alias(vc, cOut.name)(exprId = cOut.exprId)), viewPlan)
    }

  /** Which stats-view column serves one aggregate output, or None if the
    * aggregate is not one of the five maintained members (distinct,
    * filtered, or wrongly-typed aggregates never rewrite — narrowness is
    * the correctness guarantee). Returns (view column, value column it
    * requires — None for COUNT(*)). */
  private def statsMember(ae: AggregateExpression): Option[(String, Option[String])] =
    ae match {
      case AggregateExpression(fn, _, false, None, _) => fn match {
        case Count(Seq(Literal(1, _)))                 => Some(("cnt", None))
        case Sum(a: AttributeReference, _) if a.dataType == DoubleType =>
          Some(("sum", Some(a.name)))
        case Min(a: AttributeReference) if a.dataType == DoubleType =>
          Some(("mn", Some(a.name)))
        case Max(a: AttributeReference) if a.dataType == DoubleType =>
          Some(("mx", Some(a.name)))
        case Average(a: AttributeReference, _) if a.dataType == DoubleType =>
          Some(("avg", Some(a.name)))
        case _ => None
      }
      case _ => None
    }

  /** The widened rewrite: any combination of COUNT(*) / SUM / MIN / MAX /
    * AVG over ONE registered value column, served from a q89-shaped stats
    * view in one projection. SUM serves as the view's decimal-exact sum
    * cast to double — SUMD's "exact sum, one final IEEE division/cast"
    * discipline, so the rewrite reproduces the maintained view bit-for-bit
    * regardless of the base's aggregation order. */
  private def statsRewrite(g: AttributeReference, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val members = aggExprs.tail.map {
      case a @ Alias(ae: AggregateExpression, _) => statsMember(ae).map((a, _))
      case _ => None
    }
    for {
      _ <- if (aggExprs.length >= 2 && members.forall(_.isDefined)) Some(()) else None
      basePath <- baseScanPath(child)
      gOut <- aggExprs.head match {
        case a: AttributeReference if a.exprId == g.exprId => Some(a)
        case _ => None
      }
      valueCol <- members.flatMap(_.get._2._2).distinct match {
        case Seq(v) => Some(v)
        case Seq()  => None // count-only is the narrow rule's job
        case _      => None // two different value columns: not this view
      }
      viewDir <- Option(statsViews.get((basePath, g.name, valueCol)))
    } yield {
      val viewPlan = CdcApplier.snapshot(SparkSession.active, viewDir)
        .select(g.name, "cnt", "sum", "mn", "mx", "avg").queryExecution.analyzed
      val byName: Map[String, Attribute] =
        viewPlan.output.map(a => a.name -> a).toMap
      val vg = byName(g.name)
      val served = members.map(_.get).map { case (orig, (colName, _)) =>
        val raw = byName(colName)
        val expr = if (colName == "sum") Cast(raw, DoubleType) else raw
        Alias(expr, orig.name)(exprId = orig.exprId)
      }
      Project(Alias(vg, gOut.name)(exprId = gOut.exprId) +: served, viewPlan)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (views.isEmpty && statsViews.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
          if aggExprs.length >= 2 =>
        countRewrite(g, aggExprs, child)
          .orElse(statsRewrite(g, aggExprs, child))
          .getOrElse(agg)
    }
  }
}
