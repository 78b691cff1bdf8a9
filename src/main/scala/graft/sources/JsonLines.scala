package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.Tables

/** Newline-delimited JSON ingest — the raw-crawl-dump entry point of the
  * training-data pipeline (everything upstream of the `documents` table).
  * Contract: a malformed line lands in `_corrupt_record` (PERMISSIVE
  * capture) — it must neither fail the scan nor silently vanish, because
  * a dropped line is unaccountable corpus loss and a failed scan blocks
  * the whole ingest on one bad shard. A type-mismatched field corrupts
  * its whole record (nulls + capture), never a partial row.
  *
  * Scale shape: the JSON reader is a plain distributed file scan —
  * per-file splits, schema enforced (no inference pass over 100 TB), and
  * the corrupt column prunes away for readers that do not select it.
  *
  * Reference parity: the reference stores its catalog AND its change
  * payloads as JSON strings (`HbaseTableInfo.scala:14-17`, the Mongo
  * path's documents); this is the file-level form of the same contract.
  */
object JsonLines {
  val CorruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
}

/** CSV ingest — the other raw entry format crawl metadata and curation
  * manifests arrive in. Same permissive contract as [[JsonLines]]: a
  * malformed row (type mismatch, token-count drift) lands in
  * `_corrupt_record`, never fails the scan, never silently vanishes.
  *
  * Scale shape: `multiLine` stays FALSE — a quoted embedded newline would
  * force whole-file parsing, losing per-file split parallelism; at 100 TB
  * the ingest contract is "one record per line" and writers must escape
  * newlines. Schema is enforced (no inference pass), header off (a header
  * per 100k-file shard set is a per-file skip cost and a corruption risk
  * when shards are concatenated). Quoting is RFC 4180 (`escape = '"'`,
  * i.e. a quote inside a quoted field is doubled) — Spark's backslash
  * default only round-trips with itself and rejects the CSV every other
  * tool emits. */
object CsvSource {
  val CorruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .option("multiLine", "false")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Whitespace is DATA: Spark's CSV writer trims leading/trailing field
    * whitespace by default (the reader does not), which silently breaks
    * the round-trip on any corpus with edge whitespace — both toggles off
    * so write∘read is the identity on field text. (Null vs empty-string
    * remains CSV's classic ambiguity; this library's ingest contract is
    * non-null text fields, and a null column round-trips as empty.) */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "false")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
}

/** Driver-gated source queries: prove the file-ingest path round-trips
  * the documents table exactly while capturing injected garbage. */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q83: JSONL round-trip — documents encoded to newline JSON
    //      (distributed toJSON projection), two malformed lines injected
    //      (syntactic garbage + a type-mismatched doc_id), read back via
    //      the permissive ingest. Valid rows must equal the source table
    //      bit-for-bit (unicode escapes, longs, every column) — the gate
    //      fails if encode/decode mangles anything or if corrupt capture
    //      leaks a bad row into the output.
    "q83_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // ONE fixed scratch dir per process, overwritten each run — a fresh
      // createTempDirectory per invocation would leak a full-table JSONL
      // copy every time the harness re-runs the query (Bench runs each
      // entry several times)
      val path = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q83_jsonl").toString
      docs.toJSON.write.mode("overwrite").text(path)
      Files.write(Paths.get(path, "corrupt.txt"),
        java.util.List.of("{this is not json", """{"doc_id": "not-a-long"}"""))
      val back = JsonLines.read(s, path, docs.schema)
      // Gate plumbing (sf-sized): the oracle sees only valid rows, so
      // capture must be asserted here or a silent-drop regression stays
      // green. Spark disallows corrupt-column-only queries over a raw
      // scan (pruning reduces any count to exactly that), so use the
      // sanctioned form: cache, count, unpersist before returning (the
      // returned plan re-reads raw files and references real columns).
      back.cache()
      val corrupt = back.filter(col(JsonLines.CorruptCol).isNotNull).count()
      back.unpersist()
      require(corrupt == 2,
        s"expected both injected corrupt lines captured, found $corrupt")
      back
        .filter(col(JsonLines.CorruptCol).isNull)
        .select(docs.columns.map(col).toIndexedSeq: _*)
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q100: CSV round-trip — documents plus a synthesized `csv_note`
    //      column that CONTAINS the delimiter and double quotes (so the
    //      writer must quote/escape and the reader must undo it exactly;
    //      the word-soup text alone would leave the quoting path
    //      untested), written as headerless single-line CSV, two
    //      malformed rows injected (a type-mismatched doc_id and a
    //      truncated row), read back permissively. Valid rows must equal
    //      the source projection bit-for-bit; both corrupt rows must be
    //      captured, not dropped and not leaked.
    "q100_csv_roundtrip" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("csv_note",
          concat(lit("q=\""), col("source"), lit("\", id="),
            col("doc_id").cast("string")))
      // fixed scratch dir, overwritten each run (q83's no-leak rule)
      val path = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q100_csv").toString
      CsvSource.write(docs, path)
      Files.write(Paths.get(path, "corrupt.csv"),
        java.util.List.of("not-a-long,words,en,web,12,note", "7,truncated"))
      val back = CsvSource.read(s, path, docs.schema)
      // Gate plumbing (sf-sized): the oracle compares only VALID rows, so
      // without this check a regression that silently DROPS malformed
      // rows — the exact failure the permissive contract forbids — would
      // stay green. Cache/count/unpersist: see q83's note on the
      // corrupt-column-only restriction.
      back.cache()
      val corrupt = back.filter(col(CsvSource.CorruptCol).isNotNull).count()
      back.unpersist()
      require(corrupt == 2,
        s"expected both injected corrupt rows captured, found $corrupt")
      back
        .filter(col(CsvSource.CorruptCol).isNull)
        .select(docs.columns.map(col).toIndexedSeq: _*)
        .repartition(1).sortWithinPartitions(col("doc_id"))
    }),

    // ---- q102: bucketed co-located join — the storage-layout answer to
    //      the biggest recurring shuffle at 100 TB. Both sides are
    //      written bucketed (and bucket-sorted) on the join key; a join
    //      that would otherwise exchange BOTH relations every run reads
    //      the co-located buckets shuffle-free (PlanSpec locks the
    //      absence of an exchange on either key). Pay the layout cost
    //      once at write time, amortize it over every downstream join —
    //      the fact-table discipline for a table joined daily. The gate
    //      proves co-location changes NOTHING semantically: the result
    //      hashes against the plain DuckDB join.
    "q102_bucketed_join" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      // external-table scratch (fixed dir, overwritten — q83's no-leak
      // rule); the in-memory session catalog holds the bucket metadata
      val scratch = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q102_buckets").toString
      s.sql("DROP TABLE IF EXISTS graft_q102_orders")
      s.sql("DROP TABLE IF EXISTS graft_q102_customer")
      o.write.mode("overwrite").option("path", s"$scratch/orders")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_q102_orders")
      c.write.mode("overwrite").option("path", s"$scratch/customer")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_q102_customer")
      // hint("merge") keeps the small side from broadcasting at this sf —
      // at the target scale BOTH sides are too big to broadcast, which is
      // the regime bucketing exists for
      s.table("graft_q102_orders").hint("merge")
        .join(s.table("graft_q102_customer").hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          graft.util.Sumd.sumd(col("o_totalprice")).as("total"))
        .repartition(1).sortWithinPartitions(col("c_mktsegment"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q83_jsonl_roundtrip" -> """
      SELECT doc_id, text, lang, source, n_chars
      FROM documents
      ORDER BY doc_id""",

    // The logical value of csv_note, independent of any quoting: the gate
    // proves the CSV writer/reader pair is an exact inverse.
    "q100_csv_roundtrip" -> """
      SELECT doc_id, text, lang, source, n_chars,
        'q="' || source || '", id=' || CAST(doc_id AS VARCHAR) AS csv_note
      FROM documents
      ORDER BY doc_id""",

    // The same join+agg over the unbucketed tables: the layout must be
    // semantically invisible.
    "q102_bucketed_join" -> s"""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        ${graft.util.Sumd.SUMD("o_totalprice")} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""
  )
}
