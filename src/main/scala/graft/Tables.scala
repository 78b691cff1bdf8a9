package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; here they are
  * plain parquet scans. All query code below goes through these so a future
  * swap to a real catalog (or bucketed layout) is one-line.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
      // parquet reader rejects outright. Preferably set at session build
      // (Bench/Verify do); this defensive set covers ad-hoc sessions. The
      // conf only affects NANOS-precision columns, which exist nowhere else
      // in the testdata.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  // (session identity, dir) pairs whose views are already registered — avoids
  // re-running 10 parquet-footer reads on every SQL-based query invocation.
  private val registered = TrieMap.empty[(Int, String), Boolean]

  /** Register every table as a temp view for spark.sql-based operators
    * (grouping sets, scalar subqueries). Idempotent and cached per session+dir. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    registered.getOrElseUpdate((System.identityHashCode(spark), dir), {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      true
    })
}
