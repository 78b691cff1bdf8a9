package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Partition pruning — the other half of the scan-reduction story beside
  * PushedFilters: a table laid out by a partition column must only read the
  * matching directories, visible as PartitionFilters + partition counts in
  * the scan node. */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("year-partitioned layout prunes to the filtered year's directories") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft_part").toString + "/orders_by_year"
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(out)

    val years = spark.read.parquet(out).select("o_year").distinct().count()
    assert(years > 1, "need multiple year partitions for pruning to mean anything")

    val q = spark.read.parquet(out)
      .filter(col("o_year") === 1995)
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the filter must land in PartitionFilters (directory pruning), not as a
    // post-scan data filter
    val pf = formatted.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_year"), s"expected o_year in PartitionFilters, got: $pf\n$formatted")
    assert(pf.contains("= 1995"), pf)

    // pruned result equals the unpartitioned filter
    val expect = Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(q.first().getLong(0) == expect)
  }
}
