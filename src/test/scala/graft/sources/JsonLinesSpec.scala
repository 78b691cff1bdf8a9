package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The permissive-ingest contract: malformed lines are CAPTURED (exact
  * count, original text), never dropped or fatal; type mismatches corrupt
  * the whole record, never a partial row. */
class JsonLinesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("corrupt lines are captured with their text; valid rows parse fully") {
    val root = Files.createTempDirectory("jsonl_spec").toString
    Files.write(Paths.get(root, "part.jsonl"), java.util.List.of(
      """{"id": 1, "name": "ok"}""",
      """{"id": oops""",
      """{"id": "not-a-long", "name": "half"}""",
      """{"id": 2, "name": "also ok"}"""))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    val df = JsonLines.read(spark, root, schema).cache()
    try {
      val corrupt = df.filter(col(JsonLines.CorruptCol).isNotNull)
        .select(col(JsonLines.CorruptCol)).as[String].collect().sorted
      assert(corrupt.length == 2, s"exactly the two bad lines: ${corrupt.toSeq}")
      assert(corrupt.exists(_.contains("oops")) &&
        corrupt.exists(_.contains("not-a-long")))
      // the type-mismatched record must NOT contribute a partial row
      val valid = df.filter(col(JsonLines.CorruptCol).isNull)
        .select($"id", $"name").as[(Long, String)].collect().toSet
      assert(valid == Set((1L, "ok"), (2L, "also ok")), valid.toString)
    } finally df.unpersist()
  }

  test("CSV: corrupt rows are captured; quoted delimiter/quote round-trip") {
    val root = Files.createTempDirectory("csv_spec").toString
    Files.write(Paths.get(root, "part.csv"), java.util.List.of(
      """1,"a, ""quoted"" value"""",  // delimiter + escaped quotes inside
      """not-a-long,half""",          // type mismatch -> corrupt
      """2,plain"""))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    val df = CsvSource.read(spark, root, schema).cache()
    try {
      val corrupt = df.filter(col(CsvSource.CorruptCol).isNotNull)
        .select(col(CsvSource.CorruptCol)).as[String].collect()
      assert(corrupt.length == 1 && corrupt.head.contains("not-a-long"),
        s"the type-mismatched row must be captured: ${corrupt.toSeq}")
      val valid = df.filter(col(CsvSource.CorruptCol).isNull)
        .select($"id", $"name").as[(Long, String)].collect().toSet
      assert(valid == Set((1L, """a, "quoted" value"""), (2L, "plain")),
        valid.toString)
    } finally df.unpersist()
  }

  test("CSV: write-then-read is the identity on edge whitespace") {
    val root = Files.createTempDirectory("csv_ws_spec").toString
    val in = Seq((1L, "trailing "), (2L, "  leading"), (3L, " both "))
      .toDF("id", "name")
    CsvSource.write(in, root)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    val back = CsvSource.read(spark, root, schema)
      .filter(col(CsvSource.CorruptCol).isNull)
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "trailing "), (2L, "  leading"), (3L, " both ")),
      s"whitespace must survive the round-trip: $back")
  }
}
