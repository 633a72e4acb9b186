package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; heavy decode work runs
  * per-partition in batches.
  *
  * The decode kernel itself is STUBBED (this container has no media
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

  /** Build a media table from `documents`: UTF-8 bytes as the opaque
    * payload (a stand-in for image bytes), `source` as the modality tag.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

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

  /** C12 `multimodal_meta` — the SQL-checkable face of the pipeline:
    * payload byte accounting + fixed-size chunk counts (how many 256-byte
    * tiles a decoder would touch). Oracle-friendly (pure arithmetic on
    * byte lengths).
    */
  def mediaMeta(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      ceil(octet_length(col("text")) / lit(256.0)).cast("long").as("n_chunks"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"))
      .orderBy(col("doc_id"))
}
