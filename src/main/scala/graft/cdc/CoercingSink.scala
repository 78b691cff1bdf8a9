package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second sink with the reference's Mongo-path value coercions
  * (SURVEY.md §2.1 S20, `MongoDBApplier.scala:19-119`): replicate the
  * merged state into a secondary store after applying
  *  - enum ordinal -> label, with the 0 ordinal NULL-encoding
  *    (`MongoDBApplier.scala:100-104`; CHANGELOG #9's AIOOBE regression —
  *    out-of-range ordinals also become NULL instead of throwing),
  *  - decimal -> double (`MongoDBApplier.scala:106-110`),
  *  - binary (text bytes) -> UTF-8 string (`MongoDBApplier.scala:112-116`).
  *
  * Coercion is schema-driven: enum columns are identified by the
  * `enumValues` field metadata that [[graft.catalog.SchemaDiscovery]]
  * attaches. The reference's duplicate-key-tolerant insert replay
  * (idempotence) is inherited from [[CdcApplier]]'s position-guarded merge
  * — the second sink just projects the already-converged snapshot.
  */
object CoercingSink {

  /** Apply the S20 value coercions to every column, driven by type +
    * metadata. Pure projection — stays in whole-stage codegen. */
  def coerce(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val coerced: Column =
        if (f.metadata.contains("enumValues")) {
          val labels = f.metadata.getStringArray("enumValues")
          // 1-based ordinal; 0 and out-of-range NULL-encode (CHANGELOG #9)
          when(c >= 1 && c <= labels.length,
            element_at(array(labels.map(lit).toIndexedSeq: _*), c.cast("int"))).otherwise(lit(null))
        } else f.dataType match {
          case _: DecimalType => c.cast(DoubleType)
          case BinaryType => decode(c, "UTF-8")
          case _ => c
        }
      coerced.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Project the converged snapshot through the coercions into a secondary
    * directory — the analog of the deprecated MongoDB applier as a second
    * `foreachBatch` sink. */
  def replicate(spark: SparkSession, targetDir: String, secondaryDir: String): Unit =
    coerce(CdcApplier.snapshot(spark, targetDir))
      .write.mode("overwrite").parquet(secondaryDir)
}
