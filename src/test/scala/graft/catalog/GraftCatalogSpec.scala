package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The V2 catalog plugin: DDL + DML on graft tables by multi-part NAME,
  * all through plain SQL text. */
class GraftCatalogSpec extends AnyFunSuite {
  private val warehouse = Files.createTempDirectory("graft_catalog").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.gr", "graft.catalog.GraftCatalog")
    .config("spark.sql.catalog.gr.root", warehouse)
    .getOrCreate()

  import spark.implicits._

  test("CREATE TABLE / INSERT / SELECT / DELETE round-trip by name") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.prod")
    spark.sql("""CREATE TABLE gr.prod.accounts
                 (k BIGINT, grp BIGINT, bal DOUBLE, tag STRING)
                 OPTIONS (pk 'k', buckets '8')""")
    // empty table is readable immediately
    assert(spark.sql("SELECT * FROM gr.prod.accounts").count() == 0)

    spark.sql("""INSERT INTO gr.prod.accounts
                 SELECT id, id % 5, id * 1.5, concat('t', id % 3),
                        CAST(NULL AS BIGINT)
                 FROM range(1, 101)""")
    assert(spark.sql("SELECT count(*) FROM gr.prod.accounts").first.getLong(0) == 100)

    // upsert by name
    spark.sql("""INSERT INTO gr.prod.accounts
                 SELECT 7L, 7L, 777.0, 'x', CAST(NULL AS BIGINT)""")
    val row = spark.sql("SELECT bal, tag FROM gr.prod.accounts WHERE k = 7").collect()
    assert(row.map(r => (r.getDouble(0), r.getString(1))).toSeq == Seq((777.0, "x")))
    assert(spark.sql("SELECT count(*) FROM gr.prod.accounts").first.getLong(0) == 100)

    spark.sql("DELETE FROM gr.prod.accounts WHERE k IN (1, 2, 3)")
    assert(spark.sql("SELECT count(*) FROM gr.prod.accounts").first.getLong(0) == 97)
  }

  test("SHOW TABLES / SHOW NAMESPACES see the warehouse state") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.teamspace")
    spark.sql("""CREATE TABLE gr.teamspace.t1 (k BIGINT, v STRING)
                 OPTIONS (pk 'k')""")
    val tables = spark.sql("SHOW TABLES IN gr.teamspace")
      .select("tableName").as[String].collect().toSet
    assert(tables.contains("t1"))
    val ns = spark.sql("SHOW NAMESPACES IN gr")
      .select("namespace").as[String].collect().toSet
    assert(ns.contains("teamspace"))
  }

  test("ALTER TABLE ADD COLUMN evolves additively; old rows surface NULL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.evo")
    spark.sql("CREATE TABLE gr.evo.t (k BIGINT, v STRING) OPTIONS (pk 'k')")
    spark.sql("INSERT INTO gr.evo.t SELECT 1L, 'a', CAST(NULL AS BIGINT)")
    spark.sql("ALTER TABLE gr.evo.t ADD COLUMN note STRING")
    // the evolved column appends at the END of the served order (q288)
    spark.sql("INSERT INTO gr.evo.t SELECT 2L, 'b', CAST(NULL AS BIGINT), 'hello'")
    val got = spark.sql("SELECT k, note FROM gr.evo.t ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1L, None), (2L, Some("hello"))))
    // DROP COLUMN is supported via column mapping (q259): meta-only, the
    // served schema loses the column immediately
    spark.sql("ALTER TABLE gr.evo.t DROP COLUMN note")
    assert(!spark.table("gr.evo.t").columns.contains("note"))
    // unsupported evolution classes still refuse
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gr.evo.t ALTER COLUMN v COMMENT 'x'")
    }
    assert(e.getMessage.contains("evolve via"), e.getMessage)
  }

  test("ALTER COLUMN TYPE widens losslessly (eager atomic rewrite); " +
      "narrowing, PK, and mor refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.widen")
    spark.sql("CREATE TABLE gr.widen.t (k BIGINT, qty INT) OPTIONS (pk 'k')")
    spark.sql("INSERT INTO gr.widen.t SELECT id, CAST(id * 3 AS INT), CAST(NULL AS BIGINT) FROM range(1, 21)")
    spark.sql("ALTER TABLE gr.widen.t ALTER COLUMN qty TYPE BIGINT")
    // served type is bigint and beyond-int values now fit
    assert(spark.sql("SELECT qty FROM gr.widen.t").schema("qty").dataType ==
      org.apache.spark.sql.types.LongType)
    spark.sql("INSERT INTO gr.widen.t SELECT 100L, 9000000000L, CAST(NULL AS BIGINT)")
    val got = spark.sql("SELECT k, qty FROM gr.widen.t WHERE k IN (5, 100) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((5L, 15L), (100L, 9000000000L)))
    // refusals: narrowing (Spark's analyzer refuses it upstream of the
    // catalog — also correct), cross-family, PK, mor
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE gr.widen.t ALTER COLUMN qty TYPE INT")
    }.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE gr.widen.t ALTER COLUMN qty TYPE STRING")
    }.getMessage.contains("widening"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE gr.widen.t ALTER COLUMN k TYPE DECIMAL(38,0)")
    }.getMessage.contains("PK"))
    spark.sql("""CREATE TABLE gr.widen.m (k BIGINT, qty INT)
                 OPTIONS (pk 'k', storage 'mor')""")
    spark.sql("INSERT INTO gr.widen.m SELECT 1L, 1, CAST(100 AS BIGINT)")
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE gr.widen.m ALTER COLUMN qty TYPE BIGINT")
    }.getMessage.contains("merge-on-read"))
  }

  test("RENAME and DROP; CTAS creates and fills in one statement") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.tmp")
    spark.sql("""CREATE TABLE gr.tmp.src (k BIGINT, v DOUBLE) OPTIONS (pk 'k')""")
    spark.sql("INSERT INTO gr.tmp.src SELECT id, id * 2.0, CAST(NULL AS BIGINT) FROM range(1, 11)")
    // V2 RENAME TO takes a catalog-less destination (same catalog)
    spark.sql("ALTER TABLE gr.tmp.src RENAME TO tmp.renamed")
    assert(spark.sql("SELECT count(*) FROM gr.tmp.renamed").first.getLong(0) == 10)

    spark.sql("""CREATE TABLE gr.tmp.derived OPTIONS (pk 'k') AS
                 SELECT k, v * 10 AS v10, _graft_pos FROM gr.tmp.renamed WHERE k <= 5""")
    assert(spark.sql("SELECT count(*) FROM gr.tmp.derived").first.getLong(0) == 5)

    spark.sql("DROP TABLE gr.tmp.derived")
    val left = spark.sql("SHOW TABLES IN gr.tmp")
      .select("tableName").as[String].collect().toSet
    assert(left == Set("renamed"))
  }

  test("mor tables created by DDL serve change feeds through the path surface") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.morns")
    spark.sql("""CREATE TABLE gr.morns.m (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', storage 'mor')""")
    spark.sql("INSERT INTO gr.morns.m SELECT 1L, 1.0, CAST(100 AS BIGINT)")
    spark.sql("INSERT INTO gr.morns.m SELECT 1L, 2.0, CAST(200 AS BIGINT)")
    // latest-per-key by name
    val v = spark.sql("SELECT v FROM gr.morns.m").as[Double].collect().toSeq
    assert(v == Seq(2.0))
    // the DDL-created table IS an ordinary target dir: the change feed works
    val feed = spark.read.format("graft").option("changesFrom", 150)
      .load(s"$warehouse/morns/m")
    assert(feed.count() == 1)
  }

  test("VERSION AS OF serves the as-of cut by name; cow and below-floor refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.tt")
    spark.sql("""CREATE TABLE gr.tt.m (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', storage 'mor')""")
    spark.sql("INSERT INTO gr.tt.m SELECT 1L, 1.0, CAST(100 AS BIGINT)")
    spark.sql("INSERT INTO gr.tt.m SELECT 1L, 2.0, CAST(200 AS BIGINT)")
    spark.sql("INSERT INTO gr.tt.m SELECT 2L, 5.0, CAST(150 AS BIGINT)")
    val asOf = spark.sql("SELECT k, v FROM gr.tt.m VERSION AS OF 150 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(asOf == Seq((1L, 1.0), (2L, 5.0)))
    // HEAD is unaffected by history reads
    assert(spark.sql("SELECT v FROM gr.tt.m WHERE k = 1")
      .as[Double].collect().toSeq == Seq(2.0))
    // a vacuum collapses history below 150 -> the collapse watermark (100)
    // becomes the floor; reads below it refuse at ANALYSIS
    graft.cdc.CdcApplier.vacuumMor(spark, s"$warehouse/tt/m", 150L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gr.tt.m VERSION AS OF 99")
    }
    assert(e.getMessage.contains("retained history"), e.getMessage)
    // at-or-above the floor still serves
    assert(spark.sql("SELECT k FROM gr.tt.m VERSION AS OF 150").count() == 2)
    // copy-on-write refuses: superseded versions are rewritten away
    spark.sql("CREATE TABLE gr.tt.c (k BIGINT, v DOUBLE) OPTIONS (pk 'k')")
    spark.sql("INSERT INTO gr.tt.c SELECT 1L, 1.0, CAST(100 AS BIGINT)")
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM gr.tt.c VERSION AS OF 100")
    }
    assert(e2.getMessage.contains("mor"), e2.getMessage)
  }

  test("guards: pk required, duplicate create refused, missing table refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.g")
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gr.g.nopk (k BIGINT)")
    }
    assert(e1.getMessage.contains("pk"), e1.getMessage)
    spark.sql("CREATE TABLE gr.g.t (k BIGINT) OPTIONS (pk 'k')")
    intercept[Exception] { spark.sql("CREATE TABLE gr.g.t (k BIGINT) OPTIONS (pk 'k')") }
    intercept[Exception] { spark.sql("SELECT * FROM gr.g.missing") }
  }
}
