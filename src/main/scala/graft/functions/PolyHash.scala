package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** `graft_polyhash(str, base, mod)` — polynomial rolling hash
  * `fold(acc = (acc*base + charAt(i)) % mod)` as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why a custom Expression: the same fold written with `aggregate`/
  * `transform` higher-order functions runs INTERPRETED (HOFs have no
  * codegen), allocates a sequence array per evaluation, and — worse — gets
  * re-inlined by projection collapse at every reference. This expression is
  * a tight generated loop over the string's UTF-16 code units, usable from
  * SQL text and `call_function` alike. Semantics match the HOF formulation
  * for BMP strings (the corpus is ASCII); mirrored by the DuckDB oracle
  * fold in [[graft.ext.TextOps.polyHashSql]].
  */
case class PolyHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, IntegerType, LongType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects (string, int, bigint), got (${actual.mkString(", ")})")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_polyhash"
  // pure function of its inputs => Catalyst may constant-fold literal calls
  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(str: Any, base: Any, mod: Any): Any = {
    val s = str.asInstanceOf[UTF8String].toString
    val b = base.asInstanceOf[Int]
    val m = mod.asInstanceOf[Long]
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * b + s.charAt(i)) % m; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, base, mod) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        java.lang.String $s = $str.toString();
        long $acc = 0L;
        for (int $i = 0; $i < $s.length(); $i++) {
          $acc = ($acc * $base + $s.charAt($i)) % $mod;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_fingerprint(str, k, base, mod)` — minimum polynomial hash over all
  * character k-shingles (the 1-permutation MinHash / winnowing primitive),
  * fused into one codegen'd O(n*k) loop. Replaces
  * `array_min(transform(shingles(text, k), polyhash))`, which materializes a
  * substring String per window and runs the transform interpreted. Matches
  * [[PolyHash]] per window exactly (same UTF-16 fold); null for text shorter
  * than k (the empty-shingle-set case). */
case class ShingleFingerprint(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, IntegerType, IntegerType, LongType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects (string, int, int, bigint), got (${actual.mkString(", ")})")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // text shorter than k
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(str: Any, k: Any, base: Any, mod: Any): Any =
    HashUtil.minPolyShingle(str.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], base.asInstanceOf[Int], mod.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, k, base, mod) => {
      val boxed = ctx.freshName("fp")
      s"""
        java.lang.Long $boxed =
          graft.functions.HashUtil.minPolyShingle($str, $k, $base, $mod);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object PolyHash {
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
    { children: Seq[Expression] =>
      require(children.length == 3, "graft_polyhash(str, base, mod) takes 3 arguments")
      PolyHash(children(0), children(1), children(2))
    })

  /** Imperative registration for an already-built session (tests, REPL).
    * Idempotent — sessions built with `spark.sql.extensions=
    * graft.functions.GraftExtensions` already have it. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("graft_polyhash")) {
      val (id, info, builder) = registryEntry
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * engine's native functions into every session built with the config
  * (SparkSessionExtensions is the public, supported hook). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.entries.foreach(ext.injectFunction)
}
