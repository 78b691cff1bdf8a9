package graft

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
      // parquet reader rejects outright. Read nanos as long (legacy conf,
      // runtime-settable, affects only NANOS columns) and convert to a
      // proper TimestampType column at microsecond precision.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view for spark.sql-based operators
    * (grouping sets, scalar subqueries). Idempotent. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
