package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcApplier, ChangeFeed}

object CatalogFixtures {
  // The EXACT F1 catalog-entry JSON from FIXTURES.md.
  val f1Json: String =
    """{"dbName":"mixfs","dbTableName":"student","hbaseTableName":"mixfs:student2",
      | "hbaseNameSpace":"mixfs","sparkTableName":"student2","bytesUtils":"Binary","cols":[
      |  {"dbColumnName":"sn","dbColumnType":"int(11)","hbaseColumnName":"sn","hbaseColumnType":"IntegerType","isPrimaryKey":true,"family":"cf"},
      |  {"dbColumnName":"id","dbColumnType":"int(11)","hbaseColumnName":"id","hbaseColumnType":"IntegerType","isPrimaryKey":true,"family":"cf"},
      |  {"dbColumnName":"score","dbColumnType":"int(11)","hbaseColumnName":"score","hbaseColumnType":"IntegerType","isPrimaryKey":false,"family":"cf"},
      |  {"dbColumnName":"name","dbColumnType":"varchar(10)","hbaseColumnName":"name","hbaseColumnType":"StringType","isPrimaryKey":false,"family":"cf"},
      |  {"dbColumnName":"rem","dbColumnType":"varchar(2)","hbaseColumnName":"rem","hbaseColumnType":"StringType","isPrimaryKey":false,"family":"cf"}]}
      |""".stripMargin
}

/** S15/S16 catalog semantics against the reference's own `student` example
  * (FIXTURES.md F1, `Mysql2HbaseCliDriver.scala:41-48`) and S3 discovery
  * over the F2 typezoo fixture. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val f1Json: String = CatalogFixtures.f1Json

  private def newCatalog(): (Catalog, String) = {
    val dir = Files.createTempDirectory("graft_catalog").toString
    (new Catalog(spark, dir), dir)
  }

  test("F1 JSON round-trips: parse -> toJson -> parse is identity") {
    val m = Catalog.parse(spark, f1Json)
    assert(m.qualifiedName == "mixfs.student")
    assert(m.sparkTableName == "student2")
    assert(m.pkCols == Seq("sn", "id"))
    assert(m.cols.map(_.dbColumnType) ==
      Seq("int(11)", "int(11)", "int(11)", "varchar(10)", "varchar(2)"))
    val again = Catalog.parse(spark, Catalog.toJson(spark, m))
    assert(again == m)
  }

  test("Spark-side schema of the F1 mapping") {
    val m = Catalog.parse(spark, f1Json)
    assert(Catalog.structType(m) == StructType(Seq(
      StructField("sn", IntegerType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("score", IntegerType),
      StructField("name", StringType),
      StructField("rem", StringType))))
  }

  test("add / list / get / delete with reload-on-miss across instances") {
    val (cat, dir) = newCatalog()
    cat.add(f1Json)
    assert(cat.list().map(_.qualifiedName) == Seq("mixfs.student"))
    assert(cat.isReplicated("MIXFS", "Student"))
    intercept[IllegalArgumentException] { cat.add(f1Json) } // duplicate

    // a second catalog over the same store sees the mapping (reload-on-miss)
    val cat2 = new Catalog(spark, dir)
    assert(cat2.get("mixfs.student").isDefined)

    assert(cat.delete("mixfs.student"))
    assert(cat.list().isEmpty)
    assert(!cat.isReplicated("mixfs", "student"))
  }

  test("names are case-insensitive end-to-end (S5 membership must not miss)") {
    val (cat, _) = newCatalog()
    cat.add(f1Json.replace("\"dbName\":\"mixfs\"", "\"dbName\":\"MixFS\""))
    assert(cat.isReplicated("MixFS", "Student"))
    assert(cat.isReplicated("mixfs", "student"))
    assert(cat.get("MIXFS.STUDENT").isDefined)
    assert(cat.delete("Mixfs.Student"))
    assert(!cat.isReplicated("mixfs", "student"))
  }

  test("validation rejects bad mappings") {
    val noPk = f1Json.replace("\"isPrimaryKey\":true", "\"isPrimaryKey\":false")
    intercept[IllegalArgumentException] { Catalog.validate(Catalog.parse(spark, noPk)) }
    val wrongType = f1Json.replace(
      "\"dbColumnType\":\"varchar(10)\",\"hbaseColumnName\":\"name\",\"hbaseColumnType\":\"StringType\"",
      "\"dbColumnType\":\"varchar(10)\",\"hbaseColumnName\":\"name\",\"hbaseColumnType\":\"IntegerType\"")
    intercept[IllegalArgumentException] { Catalog.validate(Catalog.parse(spark, wrongType)) }
    intercept[Exception] { Catalog.parse(spark, "{not json") } // FAILFAST
  }

  test("map makes the table queryable by sparkTableName; unmap drops it (EP2/EP3)") {
    val (cat, _) = newCatalog()
    val m = cat.add(f1Json)

    // build the backing CDC target with the reference's own example rows
    val target = Files.createTempDirectory("graft_catalog_t").toString + "/student"
    val rows = Seq((1, 1, 90, "ann", "a"), (1, 2, 80, "bob", "b"), (2, 1, 70, "cat", "c"))
      .toDF("sn", "id", "score", "name", "rem")
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows, col("sn") * 100 + col("id")),
      target, CdcApplier.Options(m.pkCols))

    cat.map("mixfs.student", target)
    // the SURVEY §7 step-1 flagship query, via plain spark.sql
    val got = spark.sql("SELECT name, score FROM student2 WHERE sn = 1 ORDER BY id")
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("ann", 90), ("bob", 80)))

    cat.unmap("mixfs.student")
    intercept[Exception] { spark.sql("SELECT * FROM student2").collect() }
  }

  test("a mapped view stays live across applyBatch swaps (no stale file listing)") {
    val (cat, _) = newCatalog()
    val m = cat.add(f1Json)
    val target = Files.createTempDirectory("graft_catalog_t").toString + "/student"
    val rows = Seq((1, 1, 90, "ann", "a")).toDF("sn", "id", "score", "name", "rem")
    CdcApplier.applyBatch(spark, ChangeFeed.inserts(rows, lit(10L)),
      target, CdcApplier.Options(m.pkCols))

    cat.map("mixfs.student", target)
    assert(spark.sql("SELECT score FROM student2").as[Int].collect().toSeq == Seq(90))

    // the next batch swaps the bucket files the view's first query read —
    // WITHOUT re-running map, the view must serve the new state, not throw
    // FileNotFound or return stale rows
    CdcApplier.applyBatch(spark,
      ChangeFeed.updates(rows, Map("score" -> lit(95)), lit(20L)),
      target, CdcApplier.Options(m.pkCols))
    assert(spark.sql("SELECT score FROM student2").as[Int].collect().toSeq == Seq(95))
    cat.unmap("mixfs.student")
  }

  test("a mapped MERGE-ON-READ target serves latest-per-key, not every version") {
    val (cat, _) = newCatalog()
    val m = cat.add(f1Json)
    val target = Files.createTempDirectory("graft_catalog_t").toString + "/student_mor"
    val rows = Seq((1, 1, 90, "ann", "a"), (2, 2, 70, "bob", "b"))
      .toDF("sn", "id", "score", "name", "rem")
    val opts = CdcApplier.Options(m.pkCols)
    CdcApplier.applyBatchMor(spark, ChangeFeed.inserts(rows, lit(10L)), target, opts)
    // delta appends: superseded version + a tombstone now coexist on disk
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.updates(rows.filter($"sn" === 1), Map("score" -> lit(95)), lit(20L)),
      target, opts)
    CdcApplier.applyBatchMor(spark,
      ChangeFeed.deletes(rows.filter($"sn" === 2), lit(30L)), target, opts)

    cat.map("mixfs.student", target)
    // the raw tree holds 4 version rows; the mapped name must serve exactly
    // the one live, latest row (the old Catalog.map leaked all non-tombstones)
    assert(spark.read.parquet(target).count() == 4)
    assert(spark.sql("SELECT score FROM student2").as[Int].collect().toSeq == Seq(95))
    cat.unmap("mixfs.student")
  }

  // ---- S3 discovery over the F2 typezoo fixture
  val typezoo: Seq[SourceColumn] = Seq(
    SourceColumn("pk", "bigint", isPrimaryKey = true),
    SourceColumn("c_bit1", "bit(1)"),
    SourceColumn("c_bitn", "bit(8)"),
    SourceColumn("c_tinyint", "tinyint"),
    SourceColumn("c_bool", "boolean"),
    SourceColumn("c_smallu", "smallint unsigned"),
    SourceColumn("c_medium", "mediumint"),
    SourceColumn("c_int", "int(11)"),
    SourceColumn("c_intu", "integer unsigned"),
    SourceColumn("c_bigintu", "bigint unsigned"),
    SourceColumn("c_float", "float"),
    SourceColumn("c_double", "double"),
    SourceColumn("c_varchar", "varchar(255)"),
    SourceColumn("c_decimal", "decimal(18,4)"),
    SourceColumn("c_datetime", "datetime"),
    SourceColumn("c_text", "text"),
    SourceColumn("c_enum", "enum('pending','verified')", Seq("pending", "verified")))

  val discovery = new SyntheticDiscovery(Map("mixfs.typezoo" -> typezoo))

  test("S3: discovery produces the F2 compat schema, PK ordinals, enum labels") {
    val st = discovery.structType("mixfs", "typezoo", compat = true)
    val expect = Map(
      "pk" -> LongType, "c_bit1" -> BooleanType, "c_bitn" -> StringType,
      "c_tinyint" -> IntegerType, "c_bool" -> BooleanType, "c_smallu" -> IntegerType,
      "c_medium" -> IntegerType, "c_int" -> IntegerType, "c_intu" -> LongType,
      "c_bigintu" -> LongType, "c_float" -> FloatType, "c_double" -> DoubleType,
      "c_varchar" -> StringType, "c_decimal" -> StringType, "c_datetime" -> StringType,
      "c_text" -> StringType, "c_enum" -> StringType)
    st.fields.foreach(f => assert(f.dataType == expect(f.name), s"for ${f.name}"))
    assert(discovery.pkOrdinals("mixfs", "typezoo") == Seq(0))
    assert(st("c_enum").metadata.getStringArray("enumValues").toSeq == Seq("pending", "verified"))
    assert(st("pk").metadata.getBoolean("isPrimaryKey"))

    // full mode upgrades the catch-alls
    val full = discovery.structType("mixfs", "typezoo")
    assert(full("c_decimal").dataType == DecimalType(18, 4))
    assert(full("c_datetime").dataType == TimestampType)
    assert(full("c_bigintu").dataType == DecimalType(20, 0))
  }

  test("S3: discovered schema generates a valid, round-trippable mapping") {
    val m = discovery.toMapping("mixfs", "typezoo", "typezoo_spark")
    Catalog.validate(m)
    assert(Catalog.parse(spark, Catalog.toJson(spark, m)) == m)
    assert(m.pkCols == Seq("pk"))
  }
}
