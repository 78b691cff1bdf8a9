package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL CALL maintenance procedures: same applier entry points as the
  * Scala API, state-identical before/after, mode-aware compact. */
class GraftProceduresSpec extends AnyFunSuite {
  private val warehouse = Files.createTempDirectory("graft_proc").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.pc", "graft.catalog.GraftCatalog")
    .config("spark.sql.catalog.pc.root", warehouse)
    .getOrCreate()

  import spark.implicits._

  private def state(t: String): Set[(Long, Double)] =
    spark.sql(s"SELECT k, v FROM $t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("optimize + rebucket via CALL: state identical, summary row returned") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pc.ns")
    // mor: each INSERT appends a delta file, so buckets hold multiple
    // small files and optimize has bin-packing work (cow rewrites whole
    // buckets on merge — one file each — and optimize is a no-op there)
    spark.sql("""CREATE TABLE pc.ns.t1 (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', buckets '4', storage 'mor')""")
    spark.sql("INSERT INTO pc.ns.t1 SELECT id, id*1.0, CAST(NULL AS BIGINT) FROM range(1, 51)")
    spark.sql("INSERT INTO pc.ns.t1 SELECT id, id*1.0, CAST(NULL AS BIGINT) FROM range(51, 101)")
    val before = state("pc.ns.t1")
    val opt = spark.sql("CALL pc.system.optimize(table => 'ns.t1')").collect()
    assert(opt.length == 1 && opt(0).getString(0) == "optimize" &&
      opt(0).getInt(2) >= 1, opt.mkString(", "))
    assert(state("pc.ns.t1") == before)
    // rebucket refuses mor trees (the applier's own guard, surfaced
    // through CALL); the happy path runs on a cow table
    val guard = intercept[Exception](
      spark.sql("CALL pc.system.rebucket(table => 'ns.t1', buckets => 2)").collect())
    assert(guard.getMessage.contains("compactMor before rebucket"), guard.getMessage)
    spark.sql("CREATE TABLE pc.ns.t2 (k BIGINT, v DOUBLE) OPTIONS (pk 'k', buckets '4')")
    spark.sql("INSERT INTO pc.ns.t2 SELECT id, id*1.0, CAST(NULL AS BIGINT) FROM range(1, 51)")
    val before2 = state("pc.ns.t2")
    val reb = spark.sql("CALL pc.system.rebucket(table => 'ns.t2', buckets => 2)").collect()
    assert(reb(0).getInt(2) == 2, reb.mkString(", "))
    assert(state("pc.ns.t2") == before2)
  }

  test("compact dispatches on storage mode; vacuum collapses mor history") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pc.ns")
    spark.sql("""CREATE TABLE pc.ns.m (k BIGINT, v DOUBLE)
                 OPTIONS (pk 'k', buckets '2', storage 'mor')""")
    spark.sql("INSERT INTO pc.ns.m SELECT id, id*1.0, 10 FROM range(1, 11)")
    spark.sql("INSERT INTO pc.ns.m SELECT id, id*2.0, 20 FROM range(1, 11)")
    val dir = s"$warehouse/ns/m"
    assert(spark.read.parquet(dir).count() == 20) // two versions per key
    val before = state("pc.ns.m")
    spark.sql("CALL pc.system.compact(table => 'ns.m')").collect()
    assert(spark.read.parquet(dir).count() == 10, "mor compact must collapse versions")
    assert(state("pc.ns.m") == before)

    // cow compact requires horizon_pos
    spark.sql("CREATE TABLE pc.ns.c (k BIGINT, v DOUBLE) OPTIONS (pk 'k', buckets '2')")
    spark.sql("INSERT INTO pc.ns.c SELECT id, id*1.0, 10 FROM range(1, 11)")
    spark.sql("DELETE FROM pc.ns.c WHERE k <= 3")
    val err = intercept[Exception](
      spark.sql("CALL pc.system.compact(table => 'ns.c')").collect())
    assert(err.getMessage.contains("horizon_pos"), err.getMessage)
    spark.sql("CALL pc.system.compact(table => 'ns.c', horizon_pos => 1000)").collect()
    assert(state("pc.ns.c").map(_._1) == (4L to 10L).toSet)
  }

  test("backfill via CALL evolves the schema with a SQL expression") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pc.ns")
    spark.sql("CREATE TABLE pc.ns.b (k BIGINT, v DOUBLE) OPTIONS (pk 'k', buckets '2')")
    spark.sql("INSERT INTO pc.ns.b SELECT id, id*1.0, CAST(NULL AS BIGINT) FROM range(1, 11)")
    spark.sql("CALL pc.system.backfill(table => 'ns.b', column => 'bonus', expression => 'v * 2 + 1')")
    val got = spark.sql("SELECT k, bonus FROM pc.ns.b ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.forall { case (k, b) => b == k * 2.0 + 1.0 }, got.mkString(", "))
  }
}
