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
      // parquet reader rejects outright. Preferably set at session build
      // (Bench/Verify do); this defensive set covers ad-hoc sessions. The
      // conf only affects NANOS-precision columns, which exist nowhere else
      // in the testdata.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  // Which dir each session's temp views currently point at. Views are
  // session-global, so the cache must track the LAST dir registered — a
  // (session, dir) membership set would skip re-registration after another
  // dir overwrote the views. Weak keys: a stopped session drops out instead
  // of aliasing a future session via identity-hash reuse.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table as a temp view for spark.sql-based operators
    * (grouping sets, scalar subqueries). Idempotent per (session, dir);
    * re-registers when the session's views point at a different dir. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
}
