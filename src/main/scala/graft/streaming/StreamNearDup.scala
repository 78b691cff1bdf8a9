package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.{CdcApplier, ChangeFeed}
import graft.ext.NearDup

/** Streaming MinHash-LSH near-duplicate ADMISSION: each arriving document
  * is admitted iff no earlier-seen document is a verified near-duplicate
  * (exact shingle Jaccard >= [[NearDup.JaccardT]]); candidates come from
  * the shared 126-permutation / 21-band LSH geometry ([[NearDup.bandKeys]]
  * — the q42 batch operator's banding, verbatim). The streaming form of
  * the q42/q41 family, the way a crawl pipeline actually runs it: admit-
  * or-reject at ingest, not as a corpus-wide batch pass.
  *
  * '''State = applier targets, not executor memory.''' Three graft stores:
  *
  *  - `bands` (pk band,key): each band key's FIRST owner. Ownership is
  *    min-doc_id, encoded through the applier's own last-writer-wins by
  *    writing at position `-doc_id` — a later (larger-id) claimant loses
  *    to the stored owner, and a crash-replayed claim is a no-op. No
  *    read-modify-write, no custom state code.
  *  - `docs` (pk doc_id): every SEEN document's distinct-shingle hash set
  *    (`shh`), the verify side. Rejection is seen-based (a rejected doc
  *    still blocks later members of its cluster), matching the
  *    order-free oracle "reject iff ANY earlier doc has J >= t".
  *  - `admitted` (pk doc_id): the output set.
  *
  * '''Exactly-once without a batch pointer''': every store write is
  * positioned by doc_id (bands by -doc_id), so a crash-replayed
  * micro-batch rewrites identical rows at identical positions — the
  * applier converges the replay to a no-op. Rejection recomputation under
  * replay is also stable: the band store may already hold the batch's own
  * claims, but the join keeps only owners with doc_id strictly below the
  * claimant, and the in-batch self-join contributes the same pairs either
  * way.
  *
  * 100 TB shape: per batch, banding is one codegen'd per-row kernel; the
  * candidate probe is an equi-join of the batch's bands against a
  * PK-bucketed store (co-partitioned on the band key, never all-pairs);
  * verify joins shingle sets for candidate pairs only. Store growth is
  * |seen docs| x 21 band rows + 1 doc row — the same asymptotics as the
  * batch operator's banded self-join, amortized over arrival.
  */
object StreamNearDup {

  private val BandOpts = CdcApplier.Options(Seq("band", "key"), numBuckets = 16)
  private val DocOpts = CdcApplier.Options(Seq("doc_id"), numBuckets = 16)

  def start(src: DataFrame, baseDir: String, checkpointDir: String): StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, batch, baseDir)
      }
      .start()

  /** One micro-batch of (doc_id, text): decide admission against the
    * stores, then fold the batch into them. Decision is materialized
    * (localCheckpoint) BEFORE any store update so the lazily-planned
    * reads cannot observe this batch's own writes. */
  def applyBatch(spark: SparkSession, batch: DataFrame, baseDir: String): Unit = {
    if (batch.isEmpty) return
    // the micro-batch runs on a cloned session — make the shingle/minhash
    // kernels available regardless of what the caller registered
    graft.functions.GraftFunctions.register(spark)
    val bandsDir = s"$baseDir/bands"
    val docsDir = s"$baseDir/docs"
    val admittedDir = s"$baseDir/admitted"
    val hconf = spark.sparkContext.hadoopConfiguration
    def live(d: String) = CdcApplier.bucketIds(
      new org.apache.hadoop.fs.Path(d).getFileSystem(hconf),
      new org.apache.hadoop.fs.Path(d)).nonEmpty

    val hashed = NearDup.hashedShingles(batch).localCheckpoint()
    val banded = NearDup.bandKeys(hashed.filter(col("sz") > 0))

    // candidate pairs, claimant strictly above the owner:
    //  (1) batch bands vs the stored first-owners
    //  (2) the batch's own internal band collisions
    val storeHits =
      if (!live(bandsDir))
        banded.select(col("doc_id"), col("doc_id").as("owner")).limit(0)
      else banded.as("n").join(
          CdcApplier.snapshot(spark, bandsDir)
            .select(col("band"), col("key"), col("doc_id").as("owner")).as("s"),
          Seq("band", "key"))
        .filter(col("owner") < col("n.doc_id"))
        .select(col("n.doc_id").as("doc_id"), col("owner"))
    val batchHits = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("owner"))
    val cand = storeHits.unionByName(batchHits).distinct()

    // verify candidates with exact Jaccard over the stored shingle sets;
    // owners may be prior docs (store) or in-batch partners
    val ownerShh =
      (if (live(docsDir))
         CdcApplier.snapshot(spark, docsDir).select(col("doc_id"), col("shh"))
           .join(hashed.select(col("doc_id")), Seq("doc_id"), "left_anti")
       else hashed.select(col("doc_id"), col("shh")).limit(0))
        .unionByName(hashed.select(col("doc_id"), col("shh")))
    val rejected = cand
      .join(hashed.select(col("doc_id"), col("shh").as("sh_a")), "doc_id")
      .join(ownerShh.select(col("doc_id").as("owner"), col("shh").as("sh_b")), "owner")
      .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("c") / (size(col("sh_a")) + size(col("sh_b")) - col("c"))
        >= NearDup.JaccardT)
      .select(col("doc_id")).distinct()
    val admitted = hashed.select(col("doc_id"))
      .join(rejected, Seq("doc_id"), "left_anti")
      .localCheckpoint() // decide BEFORE the stores change underneath

    // fold the batch into the stores (idempotent by position)
    CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(banded.select(col("band"), col("key"), col("doc_id")),
        -col("doc_id")),
      bandsDir, BandOpts)
    CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(
        // parquet round-trips as array<bigint> with nullable elements; the
        // kernel emits containsNull=false — widen here or the second batch
        // trips the schema-drift guard against the stored schema
        hashed.select(col("doc_id"), col("shh").cast("array<bigint>").as("shh")),
        col("doc_id")),
      docsDir, DocOpts)
    CdcApplier.applyBatch(spark,
      ChangeFeed.inserts(admitted, col("doc_id")), admittedDir, DocOpts)
    ()
  }

  /** The admitted set (final output surface). */
  def admitted(spark: SparkSession, baseDir: String): DataFrame =
    CdcApplier.snapshot(spark, s"$baseDir/admitted")
      .select(col("doc_id")).orderBy(col("doc_id"))
}
