package graft.cdc

/** Driver-side envelope-feed memo (bench r11 ask #8). A bench run measures
  * each harness-heavy streaming gate three times (median-of-3); the feed
  * SYNTHESIS — collecting the lifecycle batches to the driver as
  * JSON-image [[EnvelopeRow]]s so a MemoryStream can replay them — is a
  * deterministic pure function of (recipe, sf dir) and identical across
  * samples and across gates sharing a recipe (most lifecycles open with
  * the same `inserts(orders, o_orderkey * 10)` batch). Re-deriving it per
  * sample measured only driver-side row shipping, which is not the
  * operator under test.
  *
  * Scope of what is memoized: the IMMUTABLE row arrays only. Everything
  * the gates actually test — fresh checkpoint/target dirs per sample,
  * micro-batch cadence, applier merges, crash-replay legs — re-runs fully
  * every sample. Bounded: one entry per (recipe, dir); recipes are shared
  * where batches are value-identical, so the dominant full-table insert
  * arrays are held once per process, not once per gate.
  */
object FeedMemo {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Array[EnvelopeRow]]

  /** The memoized rows for `recipe` in `dir`, computing once per process.
    * Callers MUST key distinct batch content with distinct recipes. */
  def rows(recipe: String, dir: String)(mk: => Array[EnvelopeRow]): Array[EnvelopeRow] =
    m.computeIfAbsent((recipe, dir), _ => mk)

  /** THE envelope projection every feed-synthesizing gate uses (ADVICE
    * r11): first-caller-wins memoization is only sound when every producer
    * of a shared recipe is byte-identical, and ONE definition makes that
    * structural — a gate cannot drift its projection while sharing a memo
    * key, because there is no longer a per-gate projection to drift. */
  def toEnvelope(changes: org.apache.spark.sql.DataFrame,
      table: String = "orders"): Array[EnvelopeRow] = {
    import org.apache.spark.sql.functions.{col, lit, to_json}
    changes.select(col("op"), lit(table).as("table"), col("next_position"),
        to_json(col("before")).as("before_json"),
        to_json(col("after")).as("after_json"))
      .as[EnvelopeRow](org.apache.spark.sql.Encoders.product[EnvelopeRow])
      .collect()
  }
}
