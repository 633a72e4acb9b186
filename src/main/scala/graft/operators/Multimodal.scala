package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; heavy decode work runs
  * per-partition in batches.
  *
  * The payload is a GENUINE binary column — a per-modality magic header
  * (non-UTF8 bytes, e.g. PNG's \x89PNG) prepended to the content bytes —
  * written to parquet as BINARY ([[writeMediaTable]]), so the at-rest
  * format, schema, and scan path are exactly what a real media corpus
  * uses. Only the decode KERNEL is stubbed (this container has no media
  * libraries): [[StubDecoder.decode]] produces deterministic fake
  * metadata from the bytes. Everything Spark-side — schema, typed
  * Dataset plumbing, per-partition batching, partition sizing — is real
  * and tested, so swapping in a JNI/ffmpeg decoder is a one-function
  * change.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], n_bytes: Long)

  /** Decoded features (what a real image/audio decoder would emit). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int, checksum: Long)

  /** 4-byte modality magics — real container signatures (PNG / RIFF /
    * MPEG-PS pack header), so the payloads are unambiguously NOT text
    * and a future real decoder can sniff them.
    */
  val Magic: Map[String, Array[Byte]] = Map(
    "image" -> Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
    "audio" -> Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte),
    "video" -> Array(0x00.toByte, 0x00.toByte, 0x01.toByte, 0xBA.toByte))
  val MagicLen = 4

  /** Deterministic fake decoder standing in for libjpeg/ffmpeg/etc.
    * Real system: replace the body, keep the signature — it consumes a
    * batch iterator so a native decoder can amortize init per partition.
    */
  object StubDecoder {
    def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { r =>
        // ??? <- real decode goes here; deterministic fake below.
        val cs = r.payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
        MediaFeatures(r.media_id, r.kind, r.n_bytes,
          width = (math.abs(cs) % 1920).toInt + 1,
          height = (math.abs(cs >> 16) % 1080).toInt + 1,
          n_frames = if (r.kind == "video") (math.abs(cs >> 32) % 300).toInt + 1 else 1,
          checksum = cs)
      }
  }

  private def kindOf(id: Column): Column =
    when(id % 3 === 0, "image").when(id % 3 === 1, "audio").otherwise("video")

  /** Build a media table from `documents`: the content bytes behind a
    * real container magic, as a true `binary` payload.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val magic = when(col("doc_id") % 3 === 0, lit(Magic("image")))
      .when(col("doc_id") % 3 === 1, lit(Magic("audio")))
      .otherwise(lit(Magic("video")))
    documents.select(
      col("doc_id").as("media_id"),
      kindOf(col("doc_id")).as("kind"),
      concat(magic, col("text").cast("binary")).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .as[MediaRecord]
  }

  /** Materialize the media corpus as parquet — payload lands as a real
    * BINARY column (verified in the spec), the at-rest shape every
    * downstream decode/feature job scans.
    */
  def writeMediaTable(documents: DataFrame, path: String): Unit =
    mediaFromDocuments(documents).write.mode("overwrite").parquet(path)

  /** The decode pipeline: typed Dataset → per-partition batch decode.
    * `mapPartitions` (not `map`) so a real decoder initializes once per
    * partition; repartition bound keeps each decode task's working set
    * small enough for executor memory at scale.
    */
  def decodePipeline(media: Dataset[MediaRecord], partitions: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(StubDecoder.decode _)
  }

  /** Post-resize metadata (what the pixel stage hands the encoder). */
  case class ResizedMedia(media_id: Long, kind: String, width: Int, height: Int,
                          target_w: Int, target_h: Int, scale_micro: Long)

  /** Resize stage: aspect-preserving fit into (maxW, maxH), never
    * upscaling — the standard pre-encoder contract. The pixel work is
    * the stub (no media libs here); the CONTRACT — scale =
    * min(maxW/w, maxH/h, 1), integer floor of the scaled dims, micro-
    * unit scale factor for downstream bookkeeping — is the real one,
    * and it runs as a pure column transform at scan speed (no shuffle,
    * composes behind [[decodePipeline]]'s partitioning).
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      ResizedMedia(f.media_id, f.kind, f.width, f.height,
        target_w = math.max(1, math.floor(f.width * scale).toInt),
        target_h = math.max(1, math.floor(f.height * scale).toInt),
        scale_micro = math.floor(scale * 1e6 + 0.5).toLong)
    }
  }

  /** One sampled frame to feed a per-frame encoder. */
  case class FrameRef(media_id: Long, kind: String, frame_idx: Int)

  /** Frame-sampling stage: every `everyN`-th frame of each video
    * (frame 0 always included); images/audio pass through as a single
    * frame 0. Output cardinality is Σ ceil(n_frames / everyN) — the
    * fan-out a planner needs to size the per-frame encode stage; rows
    * stay (id, kind, idx) triples so the explode shuffles no payload
    * bytes (frames are re-fetched by the encoder from the store).
    */
  def frameSample(features: Dataset[MediaFeatures], everyN: Int): Dataset[FrameRef] = {
    require(everyN >= 1, "everyN must be >= 1")
    val spark = features.sparkSession
    import spark.implicits._
    features.flatMap { f =>
      if (f.kind == "video") (0 until f.n_frames by everyN)
        .map(i => FrameRef(f.media_id, f.kind, i))
      else Seq(FrameRef(f.media_id, f.kind, 0))
    }
  }

  /** C12 `multimodal_meta` — the SQL-checkable face of the pipeline:
    * byte accounting OVER THE BINARY PAYLOAD ITSELF (header + content)
    * plus fixed-size chunk counts (how many 256-byte tiles a decoder
    * would touch). Input is the materialized media table
    * ([[writeMediaTable]]), so the numbers witness a genuine
    * binary-column round trip through parquet.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id").as("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      ceil(octet_length(col("payload")) / lit(256.0)).cast("long").as("n_chunks"),
      col("kind"))
      .orderBy(col("doc_id"))
}
