package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture harness for the optimization rounds: writes
  * `.explain("formatted")` of each named query's RETURNED frame to
  * `<outDir>/<name>_<tag>.txt` (the `plans/r15/` deliverable). Lifecycle
  * gates perform their side effects while the frame is constructed — the
  * captured plan is the one the gate's timed evaluation runs.
  *
  * Usage: sbt "Test/runMain graft.ExplainMain plans/r15 before q03_join_topk ..."
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"unknown query $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"wrote $outDir/${name}_$tag.txt")
      }
    }
    spark.stop()
  }
}
