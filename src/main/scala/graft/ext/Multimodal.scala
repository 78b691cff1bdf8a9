package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed metadata travelling with an opaque media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Int)

/** One media object: opaque `payload` bytes + typed metadata — the schema a
  * 100 TB multimodal lake uses (never decode at rest; decode lazily in the
  * pipeline). */
case class MediaItem(media_id: Long, kind: String, uri: String,
    payload: Array[Byte], meta: MediaMeta)

/** Decoded + resized image frame with extracted features. */
case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
    resized_checksum: Long, f0: Long, f1: Long, f2: Long, f3: Long)

/** One sampled frame of a media payload. */
case class MediaFrame(media_id: Long, frame_idx: Int, frame_len: Int, frame_checksum: Long)

/** Multimodal-column plumbing (north-star extension; the reference has no
  * media handling).
  *
  * Images/audio/video are carried as opaque BINARY columns with a typed
  * metadata struct; decode / resize / feature-extract run as plain Scala
  * inside `mapPartitions` — the Scala analog of `mapInPandas`: one
  * iterator pass per partition, per-partition setup done once (the decoder
  * "context" below), no per-row UDF dispatch, rows streamed not
  * materialized. Partitioning (`repartition` on media_id before the
  * CPU-heavy stage) and schemas are production-shaped.
  *
  * STUB NOTE: the container has no imaging/audio libraries, so
  * [[FakeCodec]] stands in for the real decoder. It is a *deterministic
  * fake* — pure integer arithmetic over the payload bytes — so tests and
  * the DuckDB oracle can verify the full pipeline end-to-end. A production
  * build swaps FakeCodec for e.g. javax.imageio / ffmpeg bindings behind
  * the same three function signatures; nothing else changes.
  */
object Multimodal {

  val ResizedDim = 8

  /** Deterministic stand-in for an image/audio codec. */
  object FakeCodec {
    /** "Decode": materialize width*height pixel bytes from the payload
      * (production: actual image decode). Empty payloads decode to black. */
    def decode(payload: Array[Byte], w: Int, h: Int): Array[Int] =
      if (payload.isEmpty) new Array[Int](w * h)
      else Array.tabulate(w * h)(i => payload(i % payload.length) & 0xff)

    /** Nearest-neighbor resize to d x d (real logic, fake pixels). */
    def resize(pixels: Array[Int], w: Int, h: Int, d: Int): Array[Int] =
      Array.tabulate(d * d) { i =>
        val r = i / d; val c = i % d
        pixels((r * h / d) * w + (c * w / d))
      }

    /** 4 integer "features": fixed pseudo-random projections of the resized
      * pixels (production: a real embedding model). */
    def features(resized: Array[Int]): Array[Long] =
      Array.tabulate(4) { k =>
        resized.zipWithIndex.map { case (v, i) => v.toLong * (((k * 64 + i) % 7) - 3) }.sum
      }

    def checksum(resized: Array[Int]): Long =
      resized.foldLeft(0L)((acc, v) => (acc * 31 + v) % TextOps.HashMod)

    /** 60-bit average hash (aHash, the classic perceptual hash): bit i set
      * iff pixel i is above the mean of the resized tile, cross-multiplied
      * (64·p > Σ) so no engine divides. 60 bits (of the 64 pixels) keeps
      * every shift inside a non-negative BIGINT in BOTH engines — q47's
      * 60-bit SimHash convention; the mean still uses all 64 pixels. */
    def ahash(resized: Array[Int]): Long = {
      val sum = resized.foldLeft(0L)(_ + _)
      var acc = 0L
      var i = 0
      while (i < PHashBits) { if (64L * resized(i) > sum) acc |= (1L << i); i += 1 }
      acc
    }
  }

  /** q159 perceptual-Hamming geometry: 60-bit aHash, Hamming threshold 3,
    * blocked into 4 fifteen-bit bands (pigeonhole: ≤3 flipped bits leave
    * at least one band intact, so the candidate equi-join is EXACT). */
  val PHashBits = 60
  val PHamT = 3
  val PHashBlocks = 4

  /** Synthetic media corpus derived from `documents`: payload = UTF-8 text
    * bytes (any bytes would do — they are opaque), metadata derived
    * deterministically from n_chars. */
  def syntheticCorpus(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        concat(lit("synthetic://media/"), col("doc_id")).as("uri"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          (lit(16) + col("n_chars") % 32).cast("int").as("width"),
          (lit(8) + col("n_chars") % 16).cast("int").as("height"),
          (lit(8000) + (col("n_chars") % 3) * 4000).cast("int").as("sampleRate"),
          (col("n_chars") * 10).cast("int").as("durationMs")).as("meta"))
      .as[MediaItem]
  }

  /** decode -> resize -> feature-extract, one iterator pass per partition.
    * The repartition spreads the (CPU-bound) codec work; at real scale the
    * input is already wide and this becomes a no-op coalesce via AQE. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("media_id"))
      .mapPartitions { items =>
        // per-partition decoder context (buffers, model handles) built ONCE
        val codec = FakeCodec
        items.map { m =>
          val pixels = codec.decode(m.payload, m.meta.width, m.meta.height)
          val resized = codec.resize(pixels, m.meta.width, m.meta.height, ResizedDim)
          val Array(f0, f1, f2, f3) = codec.features(resized)
          MediaFeatures(m.media_id, m.kind, m.meta.width, m.meta.height,
            codec.checksum(resized), f0, f1, f2, f3)
        }
      }
  }

  /** Frame sampling: treat the payload as a stream and emit every
    * `stride`-th fixed-size frame — the video keyframe-extraction shape
    * (1 -> N rows via a flatMap inside mapPartitions; at scale the explode
    * happens executor-side with no driver involvement). */
  def frameSample(media: Dataset[MediaItem], frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("media_id"))
      .mapPartitions(_.flatMap { m =>
        val n = m.payload.length
        (0 until (n + frameBytes - 1) / frameBytes by stride).map { i =>
          val start = i * frameBytes
          val frame = java.util.Arrays.copyOfRange(m.payload, start, math.min(start + frameBytes, n))
          val checksum = frame.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % TextOps.HashMod)
          MediaFrame(m.media_id, i, frame.length, checksum)
        }
      })
  }

  /** q202 scene-change threshold over the 0..255 frame signature
    * (frame_checksum mod 256 — the fake codec's "mean luma"); a
    * consecutive-frame jump beyond it opens a new scene. */
  val SceneThresh = 96L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q202: scene detection / keyframe selection — the video-side
    //      curation step between q61's blind stride sampling and q159's
    //      near-dup: cut the frame stream where consecutive frame
    //      signatures jump (content change), emit one row per scene with
    //      its start keyframe — what a video training pipeline stores
    //      instead of every frame. The decode stays the executor-side
    //      mapPartitions pipeline (stride 1 — every frame is examined);
    //      scene cuts are a per-MEDIA lag window over frame_idx (never
    //      global); scenes are the same gaps-and-islands cumsum as q150;
    //      all arithmetic exact integers, so the oracle replays
    //      frame -> signature -> cut -> scene bit-for-bit.
    "q202_scene_detect" -> ((s, dir) => {
      import s.implicits._
      val frames = frameSample(syntheticCorpus(s, dir), frameBytes = 64, stride = 1)
        .toDF()
        .withColumn("sig", col("frame_checksum") % 256)
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("prev_sig", lag(col("sig"), 1).over(w))
        .withColumn("cut",
          when(col("prev_sig").isNull ||
            abs(col("sig") - col("prev_sig")) > SceneThresh, 1L).otherwise(0L))
        .withColumn("scene_idx", sum(col("cut")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("media_id"), col("scene_idx"))
        .agg(min(col("frame_idx")).as("start_frame"),
          count(lit(1)).as("n_frames"),
          min(col("sig")).as("min_sig"), max(col("sig")).as("max_sig"))
        .repartition(1).sortWithinPartitions(col("media_id"), col("scene_idx"))
    }),
    // Full multimodal pipeline: binary column + metadata -> mapPartitions
    // decode/resize/extract -> relational output, oracle-verified because
    // the fake codec is exact integer arithmetic over the payload bytes.
    "q60_multimodal_features" -> ((s, dir) =>
      extractFeatures(syntheticCorpus(s, dir)).toDF().orderBy(col("media_id"))),

    // Frame sampling: every 2nd 64-byte frame of each payload, with exact
    // per-frame checksums the oracle can mirror.
    "q61_frame_sample" -> ((s, dir) =>
      frameSample(syntheticCorpus(s, dir), frameBytes = 64, stride = 2)
        .toDF().orderBy(col("media_id"), col("frame_idx"))),

    // Perceptual media dedup — the multimodal analog of q40's exact text
    // dedup: a re-crawl feed (every media object delivered again under a
    // new id/uri) is deduped on the checksum of the DECODED+RESIZED content
    // (the perceptual-hash shape: survives container-level byte changes,
    // here modeled by the differing uri), keeping the lowest id per group.
    // decode -> hash is the mapPartitions pipeline; dedup is one shuffle on
    // the checksum.
    "q64_media_dedup" -> ((s, dir) => {
      import s.implicits._
      val m = syntheticCorpus(s, dir)
      val feed = m.union(m.map(x => x.copy(media_id = x.media_id + 10000,
        uri = s"synthetic://recrawl/${x.media_id + 10000}")))
      extractFeatures(feed)
        .groupBy(col("kind"), col("resized_checksum"))
        .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("kind"), col("n_copies"), col("resized_checksum"))
        .repartition(1).sortWithinPartitions(col("keep_id"))
    }),

    // ---- q159: perceptual NEAR-dup — q64 catches exact re-encodes (same
    //      decoded checksum); this catches PERTURBED re-crawls (every %5
    //      doc re-arrives with its first payload byte changed — a few
    //      resized pixels move, a few aHash bits flip) by Hamming
    //      distance over the 60-bit average hash, the q47 machinery
    //      applied to the decoded-pixel domain. Candidates come from the
    //      4-band pigeonhole equi-join (EXACT for Hamming ≤ 3 — never
    //      media × media), verified by one bit_count. The decode/resize
    //      pipeline stays executor-side mapPartitions; the oracle replays
    //      decode → resize → aHash → all-pairs ground truth, so a missed
    //      candidate (broken banding) or a wrong bit breaks the gate.
    "q159_media_neardup" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
      val feed = base.unionByName(
        base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("z"), expr("substring(text, 2)")).as("text"), col("n_chars")))
      val media = feed.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (lit(16) + col("n_chars") % 32).cast("int").as("width"),
        (lit(8) + col("n_chars") % 16).cast("int").as("height"))
      val sig = media.as[(Long, Array[Byte], Int, Int)]
        .repartition(col("media_id"))
        .mapPartitions { it =>
          val codec = FakeCodec
          it.map { case (id, payload, w, h) =>
            val resized = codec.resize(codec.decode(payload, w, h), w, h, ResizedDim)
            (id, codec.ahash(resized))
          }
        }.toDF("media_id", "phash")
      val blockWidth = PHashBits / PHashBlocks
      val blocks = sig.select(col("media_id"), col("phash"),
          explode(array((0 until PHashBlocks).map(b =>
            struct(lit(b).as("bi"),
              shiftright(col("phash"), b * blockWidth)
                .bitwiseAND(lit((1L << blockWidth) - 1)).as("bv"))): _*)).as("blk"))
        .select(col("media_id"), col("phash"),
          col("blk.bi").as("bi"), col("blk.bv").as("bv"))
      blocks.as("a").join(blocks.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          col("a.phash").as("pa"), col("b.phash").as("pb"))
        .distinct()
        .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
        .filter(col("hamming") <= PHamT)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .repartition(1).sortWithinPartitions(col("id_a"), col("id_b"))
    }),

    // ---- q166: cross-modal PAIR curation (LAION-style composition —
    //      Schuhmann et al. 2021's public pipeline shape) — the gate that
    //      composes the pieces a multimodal corpus actually ships through:
    //      image-text pairs flow in crawl order, and a pair survives iff
    //      (a) NO earlier pair's image is a perceptual near-dup (q159's
    //      aHash + 4-band pigeonhole equi-join, exact for Hamming <= 3 —
    //      candidates NEVER media x media, PlanSpec-locked) and (b) NO
    //      earlier pair has the same canonicalized caption (lower + strip
    //      punctuation + collapse whitespace — canonical equality covers
    //      exact duplicates AND the case/punct near-dup variants, one
    //      digest groupBy, q141's election shape). Survivors carry their
    //      q96-canonicalized host (lowercase authority, www/default-port
    //      stripped) and a per-source kept-count. The synthetic feed
    //      plants all three drop classes (perturbed image re-crawls %5,
    //      verbatim-caption re-posts %7, shouting-caption re-posts %11)
    //      over a shared algebra the oracle replays. Scale shape: the
    //      decode/hash pipeline is executor-side mapPartitions; drops are
    //      a banded self-equi-join + a digest groupBy, both linear in
    //      pairs; the "earlier pair wins" rule is deterministic greedy
    //      (crawl-order id), never a connected-components pass.
    "q166_pair_curation" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"), col("source"))
      def arm(idOff: Long, modK: Int, img: Column, caption: Column) =
        (if (modK == 0) base else base.filter(col("doc_id") % modK === 0))
          .select((col("doc_id") + idOff).as("pair_id"), col("source"),
            img.as("img"), caption.as("caption"), col("n_chars"))
      val cap0 = expr("substring(text, 1, 60)")
      val pairs = arm(0L, 0, col("text"), cap0)
        // perturbed image re-crawl: near-dup IMAGE, fresh caption
        .unionByName(arm(100000L, 5,
          concat(lit("z"), expr("substring(text, 2)")),
          concat(lit("copy: "), cap0)))
        // verbatim caption re-post under a genuinely different image
        .unionByName(arm(200000L, 7, reverse(col("text")), cap0))
        // shouting re-post: caption differs only by case/punctuation
        .unionByName(arm(300000L, 11, concat(lit("Q"), col("text")),
          concat(upper(cap0), lit("!!"))))
        .localCheckpoint() // one synthesis feeds hashes, captions, output
      val sig = pairs
        .select(col("pair_id"), encode(col("img"), "UTF-8").as("payload"),
          (lit(16) + col("n_chars") % 32).cast("int").as("w"),
          (lit(8) + col("n_chars") % 16).cast("int").as("h"))
        .as[(Long, Array[Byte], Int, Int)]
        .repartition(col("pair_id"))
        .mapPartitions { it =>
          val codec = FakeCodec
          it.map { case (id, payload, w, h) =>
            (id, codec.ahash(codec.resize(codec.decode(payload, w, h), w, h, ResizedDim)))
          }
        }.toDF("pair_id", "phash")
      val blockWidth = PHashBits / PHashBlocks
      val blocks = sig.select(col("pair_id"), col("phash"),
          explode(array((0 until PHashBlocks).map(b =>
            struct(lit(b).as("bi"),
              shiftright(col("phash"), b * blockWidth)
                .bitwiseAND(lit((1L << blockWidth) - 1)).as("bv"))): _*)).as("blk"))
        .select(col("pair_id"), col("phash"),
          col("blk.bi").as("bi"), col("blk.bv").as("bv"))
      val imgDrop = blocks.as("a").join(blocks.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
            col("a.pair_id") < col("b.pair_id"))
        .filter(expr("bit_count(a.phash ^ b.phash)") <= PHamT)
        .select(col("b.pair_id").as("pair_id")).distinct()
      val canon = pairs.select(col("pair_id"),
        trim(regexp_replace(lower(col("caption")), "[^a-z0-9]+", " ")).as("c"))
      val capDrop = canon
        .join(canon.groupBy(col("c")).agg(min(col("pair_id")).as("keep")), Seq("c"))
        .filter(col("pair_id") > col("keep"))
        .select(col("pair_id"))
      val host = regexp_replace(
        regexp_extract(lower(concat(lit("HTTPS://"),
          when(col("pair_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.COM"),
          when(col("pair_id") % 2 === 0, lit(":443")).otherwise(lit("")),
          lit("/i/"), col("pair_id"))), "://([^/:]+)", 1),
        "^www\\.", "")
      pairs
        .join(imgDrop, Seq("pair_id"), "left_anti")
        .join(capDrop, Seq("pair_id"), "left_anti")
        .select(col("pair_id"), col("source"), host.as("host"))
        .withColumn("n_src_kept",
          count(lit(1)).over(Window.partitionBy(col("source"))))
        .repartition(1).sortWithinPartitions(col("pair_id"))
    })
  )

  val oracles: Map[String, String] = {
    // DuckDB mirror of FakeCodec over the UTF-8 payload (ASCII corpus).
    val w = "(16 + n_chars % 32)"
    val h = "(8 + n_chars % 16)"
    val d = ResizedDim
    // pixel i (0-based) = byte at (i mod len), 1-based substring
    def pix(i: String) = s"ord(substring(text, ($i) % length(text) + 1, 1))"
    val resized =
      s"""list_transform(range(0, ${d * d}), i ->
            ${pix(s"((i // $d) * $h // $d) * $w + ((i % $d) * $w // $d)")})"""
    def feat(k: Int) =
      s"""CAST(list_sum(list_transform(range(0, ${d * d}),
            i -> rs[i + 1] * ((($k * 64 + i) % 7) - 3))) AS BIGINT)"""
    Map(
      // q61's frame replay at stride 1, then the same signature, per-media
      // lag cut, and gaps-and-islands scene assembly.
      "q202_scene_detect" -> s"""
      WITH f AS (
        SELECT doc_id AS media_id, g.i AS frame_idx,
          substring(text, g.i * 64 + 1, 64) AS frame
        FROM documents,
          LATERAL (SELECT unnest(range(0, (length(text) + 63) // 64)) AS i) g),
      sigf AS (
        SELECT media_id, frame_idx,
          list_reduce(
            list_prepend(0::BIGINT,
              list_transform(range(1, length(frame)+1),
                j -> ord(substring(frame, j, 1))::BIGINT)),
            (acc, c) -> (acc*31 + c) % ${TextOps.HashMod}) % 256 AS sig
        FROM f),
      cuts AS (
        SELECT media_id, frame_idx, sig,
          CASE WHEN lag(sig, 1) OVER wm IS NULL
            OR abs(sig - lag(sig, 1) OVER wm) > $SceneThresh
            THEN 1 ELSE 0 END AS cut
        FROM sigf
        WINDOW wm AS (PARTITION BY media_id ORDER BY frame_idx)),
      scenes AS (
        SELECT media_id, frame_idx, sig,
          sum(cut) OVER (PARTITION BY media_id ORDER BY frame_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_idx
        FROM cuts)
      SELECT media_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        CAST(min(frame_idx) AS INT) AS start_frame,
        CAST(count(*) AS BIGINT) AS n_frames,
        CAST(min(sig) AS BIGINT) AS min_sig, CAST(max(sig) AS BIGINT) AS max_sig
      FROM scenes GROUP BY media_id, scene_idx
      ORDER BY media_id, scene_idx""",

      "q61_frame_sample" -> s"""
      WITH f AS (
        SELECT doc_id AS media_id, g.i AS frame_idx,
          substring(text, g.i * 64 + 1, 64) AS frame
        FROM documents,
          LATERAL (SELECT unnest(range(0, (length(text) + 63) // 64)) AS i) g
        WHERE g.i % 2 = 0)
      SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        CAST(length(frame) AS INT) AS frame_len,
        list_reduce(
          list_prepend(0::BIGINT,
            list_transform(range(1, length(frame)+1), j -> ord(substring(frame, j, 1))::BIGINT)),
          (acc, c) -> (acc*31 + c) % ${TextOps.HashMod}) AS frame_checksum
      FROM f
      ORDER BY media_id, frame_idx""",

      "q60_multimodal_features" -> s"""
      WITH m AS (
        SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
          $w AS width, $h AS height, $resized AS rs
        FROM documents)
      SELECT media_id, kind, width, height,
        list_reduce(list_prepend(0::BIGINT, rs),
          (acc, v) -> (acc * 31 + v) % ${TextOps.HashMod}) AS resized_checksum,
        ${feat(0)} AS f0, ${feat(1)} AS f1, ${feat(2)} AS f2, ${feat(3)} AS f3
      FROM m
      ORDER BY media_id""",

      "q159_media_neardup" -> s"""
      WITH d2 AS (
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 100000, 'z' || substring(text, 2), n_chars
        FROM documents WHERE doc_id % 5 = 0),
      m AS (SELECT doc_id AS media_id, $resized AS rs FROM d2),
      ah AS (
        SELECT media_id,
          CAST(list_sum(list_transform(range(0, $PHashBits),
            i -> CASE WHEN 64 * rs[CAST(i AS INT) + 1] > list_sum(rs)
                 THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS ph
        FROM m)
      SELECT a.media_id AS id_a, b.media_id AS id_b,
        bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
      FROM ah a JOIN ah b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.ph, b.ph)) <= $PHamT
      ORDER BY id_a, id_b""",

      // Declarative replay of the composed curation decision: the same
      // four-arm synthesis, the same aHash (ground-truth all-pairs here —
      // the banding is exact for Hamming <= PHamT, q159's theorem), the
      // same canonical-caption election, the same host canonicalization.
      "q166_pair_curation" -> s"""
      WITH pairs AS (
        SELECT doc_id AS pair_id, source, text AS img,
          substring(text, 1, 60) AS caption, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 100000, source, 'z' || substring(text, 2),
          'copy: ' || substring(text, 1, 60), n_chars
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 200000, source, reverse(text),
          substring(text, 1, 60), n_chars
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 300000, source, 'Q' || text,
          upper(substring(text, 1, 60)) || '!!', n_chars
        FROM documents WHERE doc_id % 11 = 0),
      m AS (
        SELECT pair_id, source, img AS text, n_chars FROM pairs),
      r AS (SELECT pair_id, $resized AS rs FROM m),
      ah AS (
        SELECT pair_id,
          CAST(list_sum(list_transform(range(0, $PHashBits),
            i -> CASE WHEN 64 * rs[CAST(i AS INT) + 1] > list_sum(rs)
                 THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS ph
        FROM r),
      imgdrop AS (
        SELECT DISTINCT b.pair_id FROM ah a JOIN ah b ON a.pair_id < b.pair_id
        WHERE bit_count(xor(a.ph, b.ph)) <= $PHamT),
      canon AS (
        SELECT pair_id,
          trim(regexp_replace(lower(caption), '[^a-z0-9]+', ' ', 'g')) AS c
        FROM pairs),
      capdrop AS (
        SELECT pair_id FROM canon
        JOIN (SELECT c, min(pair_id) AS keep FROM canon GROUP BY c) k USING (c)
        WHERE pair_id > keep),
      kept AS (
        SELECT p.pair_id, p.source,
          regexp_replace(
            regexp_extract(
              lower('HTTPS://' ||
                CASE WHEN p.pair_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
                p.source || '.Example.COM' ||
                CASE WHEN p.pair_id % 2 = 0 THEN ':443' ELSE '' END ||
                '/i/' || CAST(p.pair_id AS VARCHAR)),
              '://([^/:]+)', 1),
            '^www\\.', '') AS host
        FROM pairs p
        WHERE NOT EXISTS (SELECT 1 FROM imgdrop d WHERE d.pair_id = p.pair_id)
          AND NOT EXISTS (SELECT 1 FROM capdrop d WHERE d.pair_id = p.pair_id))
      SELECT pair_id, source, host,
        count(*) OVER (PARTITION BY source) AS n_src_kept
      FROM kept ORDER BY pair_id""",

      "q64_media_dedup" -> s"""
      WITH d2 AS (
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 10000, text, n_chars FROM documents),
      m AS (
        SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
          $resized AS rs
        FROM d2),
      mm AS (
        SELECT media_id, kind,
          list_reduce(list_prepend(0::BIGINT, rs),
            (acc, v) -> (acc * 31 + v) % ${TextOps.HashMod}) AS resized_checksum
        FROM m)
      SELECT min(media_id) AS keep_id, kind,
        CAST(count(*) AS BIGINT) AS n_copies, resized_checksum
      FROM mm
      GROUP BY kind, resized_checksum
      ORDER BY keep_id""")
  }
}
