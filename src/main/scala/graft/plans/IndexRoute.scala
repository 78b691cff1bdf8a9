package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.Row

import graft.cdc.CdcApplier

/** AUTOMATIC secondary-index routing (q266/q273/q274) — the optimizer half
  * of q123's index machinery. The engine can MAINTAIN a secondary index (a
  * graft table keyed (value, pk), bucketed on the value prefix, fed from the
  * same change envelope as the base store — q123/q170), but a SQL user
  * filtering on the indexed non-key column still got a full scan unless
  * they knew to chain two [[CdcApplier.pointLookup]]s by hand. This
  * `Rule[LogicalPlan]` (the [[GraftViewRewrite]] seam:
  * `experimental.extraOptimizations`) rewrites an eligible predicate on a
  * REGISTERED indexed column into exactly that chain — index lookup →
  * PK fetch — so the query reads ≤k index buckets + the matching store
  * buckets instead of the table (the HBase-ecosystem covered-index read
  * path, SURVEY S7/EP3; public design point: Phoenix/Astro secondary-index
  * plan rewrite).
  *
  * TWO plan legs route (q273): the V1 `LogicalRelation(HadoopFsRelation)`
  * shape the Scala read paths ([[CdcApplier.snapshot]]) produce, and the
  * DataSource-V2 `DataSourceV2ScanRelation` shape catalog SQL
  * (`SELECT ... FROM cat.ns.t WHERE ...`) reaches the optimizer with. The
  * V2 leg fires only when the chosen scan is the plain full-coverage
  * [[graft.sources.GraftBatchScan]] — by construction that excludes as-of
  * / change-feed / limit / aggregate projections, whose semantics a
  * current-state lookup must not impersonate.
  *
  * TWO predicate forms route:
  *  - point/IN (`col = lit`, `col IN (lits)`) — on any index layout;
  *  - RANGE (`col >= lo AND col <= hi`, any one- or two-sided combination
  *    of >/>=/</<=) — ONLY when the index table itself is RANGE-bucketed on
  *    the indexed column (q274): the covering buckets are then a contiguous
  *    prefix-scan ([[CdcApplier.rangeLookup]]), exactly HBase's
  *    rowkey-range scan. On a hash-bucketed index a range would read every
  *    index bucket, so it DECLINES — the plan runs as written.
  *
  * Deliberately NARROW (the [[GraftViewRewrite]] discipline — an eager
  * rewrite is a wrong-results generator). Fires ONLY when the plan is
  * `[Project(cols...)](Filter(conjuncts, relation(store path)))` where
  *  - SOME conjunct routes on a registered indexed column; the remaining
  *    conjuncts are either enforced by the lookup already (IsNotNull on
  *    the indexed column — vacuous against literals — and the snapshot's
  *    own tombstone filter on `_graft_deleted`, which
  *    [[CdcApplier.pointLookup]] applies) or ride as RESIDUALS (q289)
  *    re-applied verbatim ABOVE the fetched frame — `o_status = 'F'`
  *    beside the routed `custkey IN (...)` routes the indexed half and
  *    filters the rest, exactly Phoenix's index-plus-filter plan. A
  *    non-deterministic residual declines; a residual referencing a
  *    column the served frame lacks declines.
  *  - the projected columns all exist on the lookup's output (data columns
  *    + `_graft_pos`).
  * A filter with NO routable conjunct declines — residuals alone never
  * fabricate a route.
  * Freshness is the registrar's contract, exactly as for the maintained
  * views: registering asserts the index is maintained from the same
  * envelope (q123's discipline); unregister around backfills.
  *
  * The rewrite executes the lookups at PLANNING time — driver-bounded by
  * the same contract as every pointLookup (a point/IN batch is a handful
  * of literals, never a table). Bounds are ENFORCED, not assumed: an
  * IN-list wider than `spark.graft.indexroute.maxKeys` (default 1024)
  * declines, and a range whose index matches more than that many keys
  * declines after one bounded count over the covering index buckets —
  * refusal is always the rule's safe default. The entire rewrite body is
  * failure-isolated: ANY throw (index dir deleted after registration,
  * layout mismatch, conversion surprise) DECLINES and the user's
  * otherwise-valid plan runs as written, never fails planning.
  *
  * 100 TB: this is the difference between ≤k bucket directories and a
  * full fact-table scan, chosen automatically — now also through the
  * catalog SQL surface users actually query (q273) and for the BETWEEN
  * form every time-keyed lookup table serves (q274).
  */
object GraftIndexRoute extends Rule[LogicalPlan] {

  /** (absolute store path, indexed column) -> index table dir. */
  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]

  /** Plan-shape seams for the spec/gate: how often the rewrite fired /
    * was consulted but declined, since install or [[resetCounters]].
    * LongAdders — two sessions planning concurrently must not lose
    * counts (the monotonicity the gates assert). */
  private val firedCount = new java.util.concurrent.atomic.LongAdder
  private val declinedCount = new java.util.concurrent.atomic.LongAdder
  def fired: Long = firedCount.sum()
  def declined: Long = declinedCount.sum()
  def resetCounters(): Unit = { firedCount.reset(); declinedCount.reset() }

  /** Hard cap on planning-time lookup keys: an IN-list wider than this —
    * or a range matching more index keys than this — declines to the scan
    * (a generated 50k-literal IN must not run table lookups at planning
    * time on the driver path). */
  private def maxKeys(spark: SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.graft.indexroute.maxKeys").toInt)
      .getOrElse(1024)

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

  /** The store path of a routable relation, or None. V1: a single-root
    * HadoopFsRelation (the snapshot read). V2 (q273): a catalog/path graft
    * table whose chosen scan is the plain full-coverage Batch leg — the
    * builder picks it exactly when no static predicate bounded the bucket
    * key and no as-of/change-feed/limit/aggregate mode is in play, which
    * is precisely the only shape a current-state lookup may replace. */
  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case r: LogicalRelation => r.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.toList match {
        case one :: Nil => Some(normalize(one.toString))
        case _          => None
      }
      case _ => None
    }
    case r: DataSourceV2ScanRelation => (r.relation.table, r.scan) match {
      case (t: graft.sources.GraftTable, _: graft.sources.GraftBatchScan) =>
        Some(normalize(t.targetDir))
      case _ => None
    }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The routable predicate set on a registered indexed column, or None. */
  private sealed trait Form
  private case class Points(values: Seq[Any]) extends Form
  private case class Range(lo: Option[Long], hi: Option[Long]) extends Form
  private case class Route(col: AttributeReference, form: Form,
      indexDir: String, storePath: String)

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue)
    case _                   => None
  }

  /** Strict-bound adjustment WITHOUT wraparound: `col > Long.MaxValue` /
    * `col < Long.MinValue` are always-false predicates, and naive `x + 1`
    * wraps them into whole-domain ranges — the route would then serve the
    * ENTIRE index where the plan demands zero rows. A domain-edge strict
    * bound declines instead (None), and the scan answers correctly. */
  private def incExact(x: Long): Option[Long] =
    if (x == Long.MaxValue) None else Some(x + 1)
  private def decExact(x: Long): Option[Long] =
    if (x == Long.MinValue) None else Some(x - 1)

  /** The routable predicate on a registered indexed column, plus the
    * conjuncts it CONSUMES (q289: everything else becomes a RESIDUAL the
    * rewrite re-applies above the fetched frame — a point route no longer
    * demands the filter be nothing-but-the-point). Point/IN wins over a
    * range on ties; among several routable columns the name-least wins
    * (determinism — the others' conjuncts ride as residuals, which is
    * correct either way). */
  private def routeOf(cs: Seq[Expression], storePath: String)
      : Option[(Route, Seq[Expression])] = {
    val points = cs.collect {
      case e @ EqualTo(a: AttributeReference, Literal(v, _)) if v != null =>
        (a, Seq(v), e)
      case e @ EqualTo(Literal(v, _), a: AttributeReference) if v != null =>
        (a, Seq(v), e)
      case e @ In(a: AttributeReference, vs) if vs.nonEmpty &&
        vs.forall { case Literal(v, _) => v != null; case _ => false } =>
        (a, vs.map { case Literal(v, _) => v }, e)
    }
    // range conjuncts (q274): literal one-/two-sided bounds, integral only
    // (rangeLookup's domain — the range-bucketed layouts are Long-keyed);
    // a non-convertible bound on the routed column falls into the residual
    // set, which the rewrite enforces above the frame — never dropped
    val ranges = cs.collect {
      case e @ GreaterThan(a: AttributeReference, Literal(v, _)) if v != null =>
        (a, asLong(v).flatMap(incExact).map(x => Range(Some(x), None)), e)
      case e @ GreaterThan(Literal(v, _), a: AttributeReference) if v != null =>
        (a, asLong(v).flatMap(decExact).map(x => Range(None, Some(x))), e)
      case e @ GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        (a, asLong(v).map(x => Range(Some(x), None)), e)
      case e @ GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if v != null =>
        (a, asLong(v).map(x => Range(None, Some(x))), e)
      case e @ LessThan(a: AttributeReference, Literal(v, _)) if v != null =>
        (a, asLong(v).flatMap(decExact).map(x => Range(None, Some(x))), e)
      case e @ LessThan(Literal(v, _), a: AttributeReference) if v != null =>
        (a, asLong(v).flatMap(incExact).map(x => Range(Some(x), None)), e)
      case e @ LessThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        (a, asLong(v).map(x => Range(None, Some(x))), e)
      case e @ LessThanOrEqual(Literal(v, _), a: AttributeReference) if v != null =>
        (a, asLong(v).map(x => Range(Some(x), None)), e)
    }
    val pointRoute = points
      .filter(p => indexes.containsKey((storePath, p._1.name)))
      .sortBy(_._1.name).headOption.map { case (a, vs, e) =>
        (Route(a, Points(vs), indexes.get((storePath, a.name)), storePath), Seq(e))
      }
    def rangeRoute = ranges
      .filter(r => r._2.isDefined && indexes.containsKey((storePath, r._1.name)))
      .groupBy(_._1.name).toSeq.sortBy(_._1).headOption.map { case (_, rs) =>
        val a = rs.head._1
        val merged = rs.flatMap(_._2).foldLeft(Range(None, None)) { (acc, r) =>
          Range(
            (acc.lo.toSeq ++ r.lo.toSeq).reduceOption(math.max(_: Long, _: Long)),
            (acc.hi.toSeq ++ r.hi.toSeq).reduceOption(math.min(_: Long, _: Long)))
        }
        (Route(a, merged, indexes.get((storePath, a.name)), storePath),
          rs.map(_._3))
      }
    pointRoute.orElse(rangeRoute)
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

  /** The served frame for one route. NON-covered (the default): the index
    * lookup's matched keys feed a second pointLookup into the store.
    * COVERED (q282; Phoenix's covered query): when every projected column
    * already lives on the index table, the index lookup IS the answer —
    * one hop, no store read at all; a covered RANGE additionally needs NO
    * key cap (nothing is ever fetched to the driver — the covering-bucket
    * scan is distributed end-to-end, so arbitrarily wide ranges route).
    * None declines (cap exceeded, layout ineligible). */
  private def serve(spark: SparkSession, route: Route, storePk: Seq[String],
      idxMeta: graft.cdc.CdcApplier.TargetMeta, covered: Boolean)
      : Option[org.apache.spark.sql.DataFrame] = {
    val cap = maxKeys(spark)
    def fetch(idx: org.apache.spark.sql.DataFrame) =
      if (covered) idx
      else CdcApplier.pointLookup(spark, route.storePath,
        idx.select(storePk.map(org.apache.spark.sql.functions.col): _*))
    route.form match {
      case Points(values) =>
        if (values.size > cap) return None
        // Literals carry Catalyst-INTERNAL values (UTF8String for strings,
        // epoch ints/longs for dates/timestamps) — convert to the external
        // form createDataFrame expects; a type whose conversion surprises
        // DECLINES (the rule's contract), never crashes planning.
        val external = values.map(v =>
          org.apache.spark.sql.catalyst.CatalystTypeConverters
            .convertToScala(v, route.col.dataType))
        val keys = spark.createDataFrame(
          spark.sparkContext.parallelize(external.map(Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              route.col.name, route.col.dataType, nullable = false))))
        Some(fetch(CdcApplier.pointLookup(spark, route.indexDir, keys)))
      case Range(lo, hi) =>
        // range routes ONLY over a range-bucketed index whose bucket key IS
        // the indexed column (q274) — on a hash layout the range would read
        // every index bucket, so decline
        if (idxMeta.rangeBounds.isEmpty) return None
        val ipk = idxMeta.pkCols.getOrElse(return None)
        if (idxMeta.bucketCols.getOrElse(ipk).headOption != Some(route.col.name))
          return None
        val matched = CdcApplier.rangeLookup(spark, route.indexDir,
          lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue))
        if (covered) Some(matched)
        // bounded-fetch enforcement on the two-hop form only: one count
        // over the covering buckets — wider matches decline to the scan
        // (which is then the right plan)
        else if (matched.limit(cap + 1).count() > cap) None
        else Some(fetch(matched))
    }
  }

  private def rewrite(projList: Seq[NamedExpression], cond: Expression,
      storePath: String): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    for {
      routed <- routeOf(cs, storePath)
      (route, consumed) = routed
      // RESIDUAL conjuncts (q289): everything the lookup chain does not
      // already enforce re-applies ABOVE the fetched frame — the routed
      // half narrows the read, the residual keeps the exact semantics.
      // Non-deterministic residuals decline (re-evaluation could differ).
      consumedSet = consumed.toSet
      residual = cs.filterNot(c =>
        consumedSet.contains(c) || redundant(c, route.col.name))
      _ <- if (residual.forall(_.deterministic)) Some(()) else None
      residRefs = residual.flatMap(_.references.toSeq.map(_.name)).toSet
      // pure column projection only (the snapshot/tableSchema shape)
      outAttrs <- Some(projList).filter(_.forall(_.isInstanceOf[AttributeReference]))
      spark = SparkSession.active
      storeMeta <- graft.cdc.CdcApplier.TargetMeta.read(
        spark.sparkContext.hadoopConfiguration,
        new org.apache.hadoop.fs.Path(storePath))
      storePk <- storeMeta.pkCols
      idxMeta <- graft.cdc.CdcApplier.TargetMeta.read(
        spark.sparkContext.hadoopConfiguration,
        new org.apache.hadoop.fs.Path(route.indexDir))
      // covered eligibility (q282): every projected column — and every
      // residual-referenced column — lives on the index table; LOGICAL
      // names, since the lookup logicalizes. The layout offset
      // `_graft_pos` is NEVER covered: the index's positions are its own,
      // not the store's, and serving them would lie.
      idxCols = idxMeta.schemaJson.map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
          .filterNot(c => c == CdcApplier.DEL || c == CdcApplier.BUCKET)
          .map(c => CdcApplier.logicalName(Some(idxMeta), c)).toSet)
        .getOrElse(Set.empty[String])
      covers = (n: String) => n != CdcApplier.POS && idxCols.contains(n)
      covered = idxCols.nonEmpty && outAttrs.forall(o => covers(o.name)) &&
        residRefs.forall(covers)
      fetched <- serve(spark, route, storePk, idxMeta, covered)
      // this subtree is injected POST-analysis into an already-optimized
      // plan, so hint wrappers must be resolved here (EliminateResolvedHint
      // already ran); dropping them costs at most a join strategy, and the
      // semi-join's key side is stats-tiny anyway
      plan = fetched.queryExecution.analyzed.transform {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h.child
      }
      byName: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute] =
        plan.output.map(a => a.name -> a).toMap
      _ <- if (outAttrs.forall(o => byName.contains(o.name)) &&
        residRefs.forall(byName.contains)) Some(()) else None
      // the residual's attributes re-bind to the served frame's exprIds
      withResidual = if (residual.isEmpty) plan
        else Filter(residual.map(_.transform {
          case a: AttributeReference => byName(a.name)
        }).reduce(And), plan)
    } yield Project(outAttrs.map { o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)
    }, withResidual)
  }

  /** [[rewrite]] with the rule's decline-on-ANY-failure contract: the body
    * runs planning-time lookups against live state, and an index dir
    * deleted or corrupted after registration must fail THE REWRITE, never
    * the user's otherwise-valid plan. */
  private def tryRewrite(projList: Seq[NamedExpression], cond: Expression,
      storePath: String): Option[LogicalPlan] =
    try rewrite(projList, cond, storePath)
    catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft index route declined on failure: $e")
        None
    }

  /** Counting is PER PLAN: one fired tick when any rewrite landed in this
    * apply, else one declined tick when a registered relation was consulted
    * — the seam the gates/specs assert ("exactly once per plan"), robust to
    * a plan holding several candidate shapes (a Project-level decline still
    * consults the bare Filter beneath it). */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (indexes.isEmpty) return plan
    var consulted = false
    var landed = false
    def consult(p: LogicalPlan, projList: Seq[NamedExpression],
        cond: Expression, rel: LogicalPlan): LogicalPlan =
      scanPath(rel).flatMap { sp =>
        if (!indexes.keySet().stream().anyMatch(_._1 == sp)) None
        else {
          consulted = true
          val r = tryRewrite(projList, cond, sp)
          if (r.isDefined) landed = true
          r
        }
      }.getOrElse(p)
    val out = plan.transform {
      case p @ Project(projList, Filter(cond, rel: LogicalRelation)) =>
        consult(p, projList, cond, rel)
      case p @ Project(projList, Filter(cond, rel: DataSourceV2ScanRelation)) =>
        consult(p, projList, cond, rel)
      // catalog SQL's SELECT-* shape: the no-op Project is already elided
      case p @ Filter(cond, rel: DataSourceV2ScanRelation) =>
        consult(p, rel.output, cond, rel)
    }
    if (landed) firedCount.increment()
    else if (consulted) declinedCount.increment()
    out
  }
}
