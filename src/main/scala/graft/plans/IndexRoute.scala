package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, In, IsNotNull, Literal, NamedExpression, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.Row

import graft.cdc.CdcApplier

/** AUTOMATIC secondary-index routing (q266) — the optimizer half of q123's
  * index machinery. The engine can MAINTAIN a secondary index (a graft
  * table keyed (value, pk), bucketed on the value prefix, fed from the same
  * change envelope as the base store — q123/q170), but a SQL user filtering
  * on the indexed non-key column still got a full scan unless they knew to
  * chain two [[CdcApplier.pointLookup]]s by hand. This `Rule[LogicalPlan]`
  * (the [[GraftViewRewrite]] seam: `experimental.extraOptimizations`)
  * rewrites an eligible point/IN predicate on a REGISTERED indexed column
  * into exactly that chain — index lookup → PK fetch — so the query reads
  * ≤k index buckets + the matching store buckets instead of the table
  * (the HBase-ecosystem covered-index read path, SURVEY S7/EP3; public
  * design point: Phoenix/Astro secondary-index plan rewrite).
  *
  * Deliberately NARROW (the [[GraftViewRewrite]] discipline — an eager
  * rewrite is a wrong-results generator). Fires ONLY when the plan is
  * `Project(cols..., Filter(conjuncts, LogicalRelation(store path)))` where
  *  - the conjuncts are exactly: one `col = lit` / `col IN (lits)` on the
  *    registered indexed column, plus only predicates the lookup already
  *    enforces (IsNotNull on the indexed column — vacuous against
  *    literals — and the snapshot's own tombstone filter on
  *    `_graft_deleted`, which [[CdcApplier.pointLookup]] applies);
  *  - the projected columns all exist on the lookup's output (data columns
  *    + `_graft_pos`).
  * Range predicates beyond the index's point form, predicates on other
  * columns, and any unrecognized conjunct DECLINE — the plan runs as
  * written. Freshness is the registrar's contract, exactly as for the
  * maintained views: registering asserts the index is maintained from the
  * same envelope (q123's discipline); unregister around backfills.
  *
  * The rewrite executes the two lookups at PLANNING time — driver-bounded
  * by the same contract as every pointLookup (a point/IN batch is a
  * handful of literals, never a table). 100 TB: this is the difference
  * between ≤k bucket directories and a full fact-table scan, chosen
  * automatically.
  */
object GraftIndexRoute extends Rule[LogicalPlan] {

  /** (absolute store path, indexed column) -> index table dir. */
  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]

  /** Plan-shape seams for the spec/gate: how often the rewrite fired /
    * was consulted but declined, since install or [[resetCounters]]. */
  @volatile var fired: Long = 0L
  @volatile var declined: Long = 0L
  def resetCounters(): Unit = { fired = 0L; declined = 0L }

  def register(storePath: String, indexedCol: String, indexDir: String): Unit =
    indexes.put((normalize(storePath), indexedCol), indexDir)

  def unregister(storePath: String, indexedCol: String): Unit =
    indexes.remove((normalize(storePath), indexedCol))

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case r: LogicalRelation => r.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.toList match {
        case one :: Nil => Some(normalize(one.toString))
        case _          => None
      }
      case _ => None
    }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The single point/IN predicate on a registered indexed column, or None. */
  private case class Route(col: AttributeReference, values: Seq[Any],
      indexDir: String, storePath: String)

  private def routeOf(cs: Seq[Expression], storePath: String): Option[Route] = {
    val points = cs.collect {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null => (a, Seq(v))
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null => (a, Seq(v))
      case In(a: AttributeReference, vs) if vs.nonEmpty &&
        vs.forall { case Literal(v, _) => v != null; case _ => false } =>
        (a, vs.map { case Literal(v, _) => v })
    }
    points match {
      case Seq((a, vs)) =>
        Option(indexes.get((storePath, a.name))).map(Route(a, vs, _, storePath))
      case _ => None
    }
  }

  /** Every conjunct the lookup chain already enforces: IsNotNull on the
    * routed column, and the snapshot's tombstone filter shapes on
    * `_graft_deleted` (pointLookup filters tombstones itself). */
  private def redundant(e: Expression, routed: String): Boolean = e match {
    case IsNotNull(a: AttributeReference) =>
      a.name == routed || a.name == CdcApplier.DEL
    case Not(a: AttributeReference)     => a.name == CdcApplier.DEL
    case EqualTo(a: AttributeReference, Literal(false, _)) => a.name == CdcApplier.DEL
    case EqualTo(Literal(false, _), a: AttributeReference) => a.name == CdcApplier.DEL
    case _ => false
  }

  private def rewrite(projList: Seq[NamedExpression], cond: Expression,
      rel: LogicalRelation, storePath: String): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    for {
      route <- routeOf(cs, storePath)
      _ <- if (cs.forall(c =>
        redundant(c, route.col.name) || routeOf(Seq(c), storePath).isDefined))
        Some(()) else None
      // pure column projection only (the snapshot/tableSchema shape)
      outAttrs <- Some(projList).filter(_.forall(_.isInstanceOf[AttributeReference]))
      spark = SparkSession.active
      // index lookup: the literal values, typed as the routed column.
      // Literals carry Catalyst-INTERNAL values (UTF8String for strings,
      // epoch ints/longs for dates/timestamps) — convert to the external
      // form createDataFrame expects; a type whose conversion surprises
      // DECLINES (the rule's contract), never crashes planning.
      external <- scala.util.Try(route.values.map(v =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(v, route.col.dataType))).toOption
      keys = spark.createDataFrame(
        spark.sparkContext.parallelize(external.map(Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            route.col.name, route.col.dataType, nullable = false))))
      storeMeta <- graft.cdc.CdcApplier.TargetMeta.read(
        spark.sparkContext.hadoopConfiguration,
        new org.apache.hadoop.fs.Path(storePath))
      storePk <- storeMeta.pkCols
      fetched = CdcApplier.pointLookup(spark, storePath,
        CdcApplier.pointLookup(spark, route.indexDir, keys)
          .select(storePk.map(org.apache.spark.sql.functions.col): _*))
      // this subtree is injected POST-analysis into an already-optimized
      // plan, so hint wrappers must be resolved here (EliminateResolvedHint
      // already ran); dropping them costs at most a join strategy, and the
      // semi-join's key side is stats-tiny anyway
      plan = fetched.queryExecution.analyzed.transform {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h.child
      }
      byName: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute] =
        plan.output.map(a => a.name -> a).toMap
      _ <- if (outAttrs.forall(o => byName.contains(o.name))) Some(()) else None
    } yield Project(outAttrs.map { o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)
    }, plan)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (indexes.isEmpty) return plan
    plan.transform {
      case p @ Project(projList, Filter(cond, rel: LogicalRelation)) =>
        scanPath(rel).flatMap { sp =>
          if (!indexes.keySet().stream().anyMatch(_._1 == sp)) None
          else rewrite(projList, cond, rel, sp) match {
            case some @ Some(_) => fired += 1; some
            case None           => declined += 1; None
          }
        }.getOrElse(p)
    }
  }
}
