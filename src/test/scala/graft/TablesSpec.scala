package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary over the driver-generated testdata. The driver has
  * regenerated `/root/testdata` mid-round before (round 7: events.ts went
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS,NTZ), which broke 18 queries
  * with one opaque analysis error each) — this spec turns the NEXT regen
  * into a single named failure listing exactly which column drifted. */
class TablesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("testdata matches the expected logical schemas (schema-drift canary)") {
    val drift = Tables.schemaDrift(spark, "/root/testdata/sf0.001")
    assert(drift.isEmpty,
      "testdata schema drifted — update Tables.load/expectedSchema:\n  " +
        drift.mkString("\n  "))
  }

  test("events.ts loads as TimestampType under either parquet encoding") {
    // The load shim's contract: whatever the driver wrote (nanos-as-long or
    // native MICROS), downstream operators see TimestampType.
    val dt = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.TimestampType, s"got $dt")
  }
}
