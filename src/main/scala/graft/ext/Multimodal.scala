package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing here is real and tested — schema, partition-wise
  * batch processing (`mapPartitions` over a typed `Dataset`, the Scala
  * analog of `mapInPandas` batches), deterministic output shape. The actual
  * media decoding is STUBBED (this container has no image/audio codecs):
  * [[FakeCodec]] derives dimensions/frames/features from the payload bytes
  * deterministically, and is clearly marked as the seam where a real codec
  * (JavaCV, TwelveMonkeys, ffmpeg-cli) plugs in.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String,                // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String,
      declared_bytes: Long)

  /** Extracted features: fixed-shape per kind. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** ======== STUB — deterministic fake codec ========
    * Replace with a real decoder at the marked points; everything else
    * (schema, batching, partitioning) is production-shaped. */
  object FakeCodec {
    private def mix(bytes: Array[Byte], seed: Long): Long = {
      var h = seed
      var i = 0
      // a null payload (undecodable/missing media) hashes like an empty
      // one — the codec seam must never throw on a single bad row
      if (bytes == null) return h
      while (i < bytes.length) { h = h * 6364136223846793005L + bytes(i); i += 1 }
      h
    }
    /** STUB for image decode (would return real pixel dims). */
    def dims(payload: Array[Byte]): (Int, Int) = {
      val h = mix(payload, 0x9e3779b97f4a7c15L)
      (64 + math.floorMod(h, 512).toInt, 64 + math.floorMod(h >> 16, 512).toInt)
    }
    /** STUB for video frame sampling (would demux + sample). */
    def frameCount(payload: Array[Byte], kind: String): Int =
      if (kind == "video") 1 + math.floorMod(mix(payload, 77L), 32).toInt
      else 1
    /** STUB for the embedding model (would run a real encoder). */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = mix(payload, 0xc2b2ae3d27d4eb4fL)
      var i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 11).toFloat / (1L << 53).toFloat) - 0.5f
        i += 1
      }
      out
    }
  }

  /** Synthesize a media table from the `documents` fixture (payload = text
    * bytes) — the environment has no binary fixtures; the schema is the
    * real contract. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"),
      col("n_chars").cast("long").as("declared_bytes"))

  /** Decode + featurize, batched per partition (the `mapInPandas` shape:
    * one iterator pass per partition, no per-row JVM round trips beyond the
    * codec call). Deterministic given payloads. */
  def extractFeatures(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = FakeCodec.dims(r.payload)
        MediaFeatures(
          r.media_id, r.kind, w, h,
          FakeCodec.frameCount(r.payload, r.kind),
          FakeCodec.features(r.payload, featureDim))
      }
    }.toDF()
  }

  /** A resized media row: original + target dims, preserved aspect ratio. */
  case class ResizedMedia(
      media_id: Long,
      kind: String,
      orig_width: Int,
      orig_height: Int,
      width: Int,
      height: Int,
      scale: Double,
      payload: Array[Byte])

  /** Resize stage: fit every image/video frame inside `maxDim`×`maxDim`
    * preserving aspect ratio (no upscaling). The geometry (scale factor,
    * rounded target dims) is the real contract a training pipeline keys
    * on; the pixel resample itself is part of the STUBBED codec — here the
    * payload passes through untouched where a real decoder would re-encode.
    * Audio rows pass through with scale 1 (nothing spatial to resize). */
  def resize(media: DataFrame, maxDim: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = FakeCodec.dims(r.payload)
        val s =
          if (r.kind == "audio") 1.0
          else math.min(1.0, maxDim.toDouble / math.max(w, h))
        // STUB: a real codec would resample pixels here; geometry is real
        ResizedMedia(
          r.media_id, r.kind, w, h,
          math.max(1, math.round(w * s).toInt),
          math.max(1, math.round(h * s).toInt),
          s, r.payload)
      }
    }.toDF()
  }

  /** Frame sampling for videos: every k-th fake frame index — STUB for the
    * demux step; the explode shape (one row per sampled frame) is the real
    * downstream contract. */
  def sampleFrames(features: DataFrame, everyK: Int = 4): DataFrame =
    features
      .where(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(everyK))).as("frame_idx"))

  // ----------------------------------------------------- byte-level dedup

  /** 64-bit SimHash over the payload's DISTINCT byte 4-grams — media
    * near-dup that needs NO codec (unlike the stubbed decode stages, this
    * operator is genuinely correct in any environment): a re-muxed or
    * metadata-tweaked copy shares most of its byte windows, so its
    * fingerprint lands within a few bits of the original's.
    *
    * Portability (what buys the full DuckDB oracle, as
    * [[Dedup.portableTokenHash]] did for token SimHash): grams are taken
    * over the HEX encoding of the payload — an 8-hex-char substring at
    * every byte offset ≙ one byte 4-gram — because `hex` and `md5` are
    * defined identically in every engine, while raw-byte slicing is not.
    * Each gram string feeds the md5-derived 64-bit hash and the standard
    * SimHash vote. A production variant would hash raw bytes directly
    * (half the scan width); the vote/band/verify pipeline is identical.
    *
    * Distinct grams (the set, not the multiset) keep the per-row cost
    * linear in CONTENT, not in repetition — a zero-padded payload doesn't
    * vote its padding 10⁶ times — and make the fingerprint a pure
    * set-signature both engines reproduce. */
  /** `hx` must be a MATERIALIZED `hex(payload)` column (an attribute, not
    * the inline expression): the gram lambda reads it per element, and
    * higher-order functions run interpreted — an inline hex would re-hex
    * the whole payload for every gram window (the O(n²) trap
    * [[graft.ext.TextAnalysis.bigramTopK]] documents). */
  def byteSimhash64(hx: Column): Column = {
    val nGrams = (length(hx) / 2 - 3).cast("int")
    val grams = when(nGrams >= 1,
      array_distinct(transform(sequence(lit(1), nGrams),
        i => substr(hx, (i - 1) * 2 + 1, lit(8)))))
      .otherwise(array().cast("array<string>"))
    // md5 materialized in its OWN transform pass: higher-order functions
    // run interpreted (no codegen CSE), so inlining portableTokenHash —
    // which reads the digest twice — would compute every md5 twice
    // (the same trap [[Dedup.simhash64]] documents for token hashing)
    graft.expr.SimHash64(
      transform(transform(grams, g => md5(g)),
        m => shiftleft(conv(substring(m, 1, 8), 16, 10).cast("long"), 32)
          .bitwiseOR(conv(substring(m, 9, 8), 16, 10).cast("long"))))
  }

  /** Media near-dup pairs: byte-4-gram SimHash fingerprints through the
    * same 4×16-bit banding + hamming verify as the token-level
    * [[Dedup.nearDupSimhash]] ([[Dedup.hammingPairs64]]). Payloads shorter
    * than 4 bytes have no grams and never pair. Output: (doc_a, doc_b,
    * hamming) keyed by media_id. */
  def mediaNearDup(media: DataFrame, maxHamming: Int = 8): DataFrame =
    Dedup.hammingPairs64(
      // scanParallel: the gram lambda runs interpreted, so a single-file
      // scan would serialize ~|payload| substr calls per row on one core
      TextOps.scanParallel(media.where(length(col("payload")) >= 4))
        // hex materialized behind its own projection boundary — see
        // byteSimhash64 (the alias is read 3+ times, so CollapseProject
        // keeps the boundary)
        .select(col("media_id").as("doc_id"), hex(col("payload")).as("__hx"))
        .select(col("doc_id"), byteSimhash64(col("__hx")).as("fp")),
      maxHamming)
}
