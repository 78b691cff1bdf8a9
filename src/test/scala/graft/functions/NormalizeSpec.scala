package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_normalize: the forms the DuckDB oracle can't cross-check (NFKC
  * compatibility folding) plus the plan-time form guard. */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def norm(s: String, f: String): String = {
    GraftFunctions.register(spark)
    Seq(s).toDF("t")
      .select(call_function("graft_normalize", $"t", lit(f)))
      .first.getString(0)
  }

  test("NFC composes decomposed accents, NFD decomposes") {
    assert(norm("Cafe\u0301", "NFC") == "Caf\u00e9")
    assert(norm("Caf\u00e9", "NFD") == "Cafe\u0301")
  }
  test("NFKC folds compatibility forms: ligature, fullwidth, superscript") {
    assert(norm("ﬁnal", "NFKC") == "final")       // fi ligature
    assert(norm("ＡＢＣ", "NFKC") == "ABC") // fullwidth
    assert(norm("x²", "NFKC") == "x2")            // superscript two
    // NFC must NOT fold compatibility forms
    assert(norm("ﬁnal", "NFC") == "ﬁnal")
  }

  test("unknown form is a plan-time error, null text is null") {
    GraftFunctions.register(spark)
    intercept[AnalysisException] {
      Seq("x").toDF("t")
        .select(call_function("graft_normalize", $"t", lit("NFX"))).collect()
    }
    val r = Seq[(String, Int)](null.asInstanceOf[String] -> 1).toDF("t", "i")
      .select(call_function("graft_normalize", $"t", lit("NFC"))).first
    assert(r.isNullAt(0))
  }
}
