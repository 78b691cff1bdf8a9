package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** Crash-safe small-file publication shared by the high-watermark, the
  * target metadata, and the catalog store: write a dot-prefixed tmp file
  * (hidden from partition discovery), then rename OVER the live path with
  * `Options.Rename.OVERWRITE` — a single atomic op on POSIX and HDFS, so at
  * no point is the live file absent or truncated. (A delete-then-rename
  * publish has a crash window where the file is simply gone.) */
object AtomicFile {
  /** `FileContext.getFileContext` constructs a fresh AbstractFileSystem on
    * EVERY call (no cache, unlike `FileSystem.get`) — ~30 ms apiece, which
    * turned each metadata publish into a constructor storm once the q250
    * sidecars multiplied the writes per publish. One context per
    * (scheme, authority) is safe here: every path is fully qualified, so
    * the context's mutable working-dir state is never consulted. */
  private val fcCache = new java.util.concurrent.ConcurrentHashMap[String, FileContext]
  private def fcFor(q: Path, conf: Configuration): FileContext = {
    val u = q.toUri
    fcCache.computeIfAbsent(s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}",
      _ => FileContext.getFileContext(u, conf))
  }

  def write(conf: Configuration, live: Path, content: String): Unit = {
    val fs = live.getFileSystem(conf)
    fs.mkdirs(live.getParent)
    val q = fs.makeQualified(live)
    val tmp = new Path(q.getParent, "." + q.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fcFor(q, conf).rename(tmp, q, Options.Rename.OVERWRITE)
  }

  /** Read the live file, riding out the two transient windows a CONCURRENT
    * [[write]] exposes on checksummed filesystems (Hadoop's local FS keeps
    * a `.crc` sidecar that renames in a separate step from the data file):
    * a momentarily-absent file mid-rename, and a data/sidecar mismatch
    * (`ChecksumException`). Both windows are a rename wide; a bounded
    * retry is correct because the writer either completes or crashed —
    * and a crashed writer leaves the PREVIOUS consistent (data, crc) pair,
    * which the next attempt reads. HDFS/object stores have no sidecar, so
    * the retry path never triggers there. */
  def read(conf: Configuration, live: Path): Option[String] = {
    val fs = live.getFileSystem(conf)
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(live)) return None
        val in = fs.open(live)
        try return Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
        finally in.close()
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.FileNotFoundException) =>
          attempt += 1
          if (attempt >= 10) throw e
          Thread.sleep(20L * attempt)
      }
    }
    None // unreachable
  }
}

/** Minimal JSON string escaping shared by every hand-rolled JSON emitter
  * (Bench output line, Verify's oracle dump, the status server). Escapes
  * quote, backslash, and ALL control chars (<0x20). */
object Json {
  def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def quote(s: String): String = "\"" + escape(s) + "\""
}

/** The engine-wide decimal-exact aggregation convention (see
  * Relational's scaladoc): per-row arithmetic in double, each term cast to
  * DECIMAL(18,6) before SUM (exact, order-independent — Spark's partial-agg
  * order differs from DuckDB's), final value cast back to double. One
  * definition for the Column form and its DuckDB SQL mirror. */
object Sumd {
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Exact, order-independent sum of a double expression, as double. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** SQL fragment mirroring [[sumd]] in both Spark SQL and DuckDB. */
  def SUMD(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  /** [[sumd]] at DECIMAL(38,18) — for probability-scale terms (PageRank
    * contributions ~1/N/outdeg) where scale 6 would truncate the value
    * away. CAUTION — scale 18 is fragile cross-engine: DuckDB evaluates
    * double->decimal as round(x*10^18) and decimal->double as int128/10^18
    * IN DOUBLE ARITHMETIC, while Spark goes through the shortest string
    * repr (BigDecimal(Double.toString(x))); the two paths agree only while
    * the scaled integers stay well inside double's 2^53 exactness, which
    * scale 18 exceeds for any value >= 1e-2 with a long expansion (q113
    * observed +-1-ulp drift on 24% of docs before moving to [[sumd]]).
    * Use ONLY for short sums of few terms whose gate has been verified at
    * the driver's sf (q111's per-node in-mass sums — a handful of terms —
    * hold; new queries should prefer [[sumd]] and rescale the terms). */
  def sumdHi(c: Column): Column = sum(c.cast(DecimalType(38, 18))).cast("double")

  /** SQL fragment mirroring [[sumdHi]]. */
  def SUMDHI(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DOUBLE)"
}


/** Scoped micro-batch shuffle sizing for the harness-heavy STREAMING gates
  * (bench r11 ask #8): their per-micro-batch applier jobs exchange
  * batch-sized fractions of the table, where the session's 32 shuffle
  * partitions are task-launch overhead, not parallelism (AQE cannot
  * coalesce them — it is disabled inside stateful streaming). The q237
  * gate set this precedent; this helper scopes the same `8` to a gate's
  * lifecycle and restores the session conf before the (oracle-gated)
  * result evaluates. At 100 TB a deployment sizes shuffle partitions to
  * its micro-batch exactly the same way. Semantics are untouched — every
  * wrapped gate's result still hashes against its DuckDB oracle. */
object SmallBatches {
  def apply[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
