package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(text, form)` — Unicode normalization (NFC / NFD /
  * NFKC / NFKD) as a native codegen expression. Spark ships no Unicode
  * normalizer, and every large-scale text pipeline needs one before
  * hashing or deduplication: the SAME visible string has multiple byte
  * encodings (composed vs decomposed accents, compatibility ligatures,
  * fullwidth forms), and every byte-level operator in this engine —
  * shingle hashes, winnowing, exact dedup digests — sees them as
  * different documents unless the corpus is normalized first.
  *
  * The form argument must be a FOLDABLE string so the `Normalizer.Form`
  * resolves once at plan time; the generated code references the enum
  * constant directly (`Normalizer.normalize(s, Form.NFC)`) — one branch-
  * free JVM intrinsic call per row inside whole-stage codegen.
  *
  * Reference parity: the reference normalizes row values through its
  * type-coercion layer (SURVEY §1.2); this is the corpus-side analog for
  * text. DuckDB oracle-side mirror: `nfc_normalize` (NFC leg) and
  * `strip_accents` (NFD + strip-marks leg).
  */
case class NormalizeString(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects (string, string), got (${left.dataType}, ${right.dataType})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_normalize's form must be a literal: NFC | NFD | NFKC | NFKD")
    else {
      val f = right.eval(null)
      if (f == null) TypeCheckResult.TypeCheckFailure("form must not be null")
      else scala.util.Try(
          Normalizer.Form.valueOf(f.asInstanceOf[UTF8String].toString.toUpperCase))
        .fold(_ => TypeCheckResult.TypeCheckFailure(
          s"unknown normalization form '$f' (NFC | NFD | NFKC | NFKD)"),
          _ => TypeCheckResult.TypeCheckSuccess)
    }

  private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(
      right.eval(null).asInstanceOf[UTF8String].toString.toUpperCase)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(str: Any, f: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(str.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = form.name // resolved at plan time, constant in codegen
    nullSafeCodeGen(ctx, ev, (str, _) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($str.toString(),
         |    java.text.Normalizer.Form.$formName));""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NormalizeString {
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeString].getName, "graft_normalize"),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_normalize(text, form) takes 2 arguments")
        NormalizeString(children(0), children(1))
      })
}
