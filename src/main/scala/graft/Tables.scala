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
      // events.parquet's ts encoding has drifted across driver regens:
      //  - observed 2026-08 (early): INT64 TIMESTAMP(NANOS) — Spark's reader
      //    rejects NANOS outright unless nanosAsLong=true, which surfaces the
      //    raw nanos as LongType; we convert with timestamp_micros(div 1000).
      //  - observed 2026-08-13 regen: INT64 TIMESTAMP(MICROS, NTZ) — loads
      //    natively as TIMESTAMP_NTZ; we cast to TimestampType (session tz is
      //    UTC at every entry point, so the cast is value-preserving) to keep
      //    every downstream operator on the type it was written against.
      // Branch on the loaded dtype so either encoding works. nanosAsLong stays
      // set defensively — it is a no-op for non-NANOS columns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _                => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Post-[[load]] logical schema each table is expected to present, as
    * (column, acceptable simpleStrings). The driver has regenerated the
    * testdata mid-round before (r7: events.ts TIMESTAMP(NANOS) →
    * TIMESTAMP(MICROS,NTZ), silently breaking 18 queries) — this canary
    * turns the next silent regen into a NAMED failure: [[schemaDrift]] is
    * asserted empty by TablesSpec and printed by Verify/Bench at startup.
    * Date-ish columns accept both timestamp flavors (queries are
    * tz-insensitive there); events.ts must be TimestampType because the
    * load shim guarantees it. */
  private val tsEither = Set("timestamp", "timestamp_ntz")
  private[graft] val expectedSchema: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> tsEither, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> tsEither),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> Set("timestamp"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Compare every table's loaded schema against [[expectedSchema]]; one
    * actionable line per mismatch, empty when nothing drifted. Planning-only
    * (schema inspection), so it is cheap enough to run at every entry. */
  def schemaDrift(spark: SparkSession, dir: String): Seq[String] =
    all.flatMap { t =>
      val exp = expectedSchema(t)
      scala.util.Try(load(spark, dir, t)).fold(
        e => Seq(s"$t: load failed: ${Option(e.getMessage).getOrElse(e).toString.take(160)}"),
        df => {
          val got = df.schema.map(f => f.name -> f.dataType.simpleString)
          if (got.map(_._1) != exp.map(_._1))
            Seq(s"$t: columns [${got.map(_._1).mkString(",")}] != expected [${exp.map(_._1).mkString(",")}]")
          else got.zip(exp).collect {
            case ((n, dt), (_, ok)) if !ok(dt) =>
              s"$t.$n: loaded type $dt not in expected {${ok.mkString("|")}}"
          }
        })
    }

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
