package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; heavy decode work runs
  * per-partition in batches.
  *
  * The payload is a GENUINE container file prefix — a full PNG signature
  * + IHDR chunk (with a correct CRC-32), a complete RIFF/WAVE header
  * with a PCM `fmt ` chunk, or MPEG-PS pack headers with MPEG-2 SCR
  * marker bits — followed by the document's content bytes, written to
  * parquet as BINARY ([[writeMediaTable]]). The decoder
  * ([[HeaderDecoder]]) sees ONLY the bytes: it sniffs the magic, walks
  * the container structure, and reads width/height (PNG IHDR,
  * big-endian), sample rate/channels/duration (WAVE fmt + data chunks,
  * little-endian), and frame count (MPEG-PS pack start-code scan) out
  * of the headers. The header VALUES are deterministic functions of
  * `doc_id` chosen at write time, so the driver's DuckDB oracle can
  * replay the arithmetic independently — if the byte-level parse were
  * wrong, the hash check would go red. Pixel/sample DATA decode (libpng
  * / libav territory; no media libraries in this container) is out of
  * scope: the content bytes after the header are opaque, as they would
  * be to any header-only probe (`ffprobe`-style).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], n_bytes: Long)

  /** Header-derived features (what an ffprobe-style header scan emits).
    * Fields not defined for a modality are 0: images have no
    * sample_rate, WAVE audio has no width, MPEG-PS pack headers carry
    * no frame dimensions (those live in the ES layer, which is content,
    * not header).
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           sample_rate: Int, channels: Int, duration_ms: Long,
                           checksum: Long)

  /** 4-byte modality magics — real container signatures (PNG / RIFF /
    * MPEG-PS pack header) used by [[HeaderDecoder]] to sniff modality.
    */
  val Magic: Map[String, Array[Byte]] = Map(
    "image" -> Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
    "audio" -> Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte),
    "video" -> Array(0x00.toByte, 0x00.toByte, 0x01.toByte, 0xBA.toByte))
  val MagicLen = 4

  // ---- deterministic header parameters (the write-time contract the
  // ---- DuckDB oracle replays; the DECODER never sees these formulas) --

  /** PNG width for a doc: 16..1920. */
  def imageWidth(docId: Long): Int = (docId * 7 % 1905).toInt + 16
  /** PNG height for a doc: 16..1080. */
  def imageHeight(docId: Long): Int = (docId * 13 % 1065).toInt + 16
  /** WAVE sample rate for a doc — standard rates. Indexed by
    * (doc_id / 3) % 6 so every rate occurs among the doc_id % 3 == 1
    * audio docs (doc_id % 6 would hit only two residues there).
    */
  val SampleRates: Array[Int] = Array(8000, 11025, 16000, 22050, 44100, 48000)
  def audioSampleRate(docId: Long): Int = SampleRates((docId / 3 % 6).toInt)
  /** WAVE channel count for a doc: 1 or 2. */
  def audioChannels(docId: Long): Int = (docId % 2).toInt + 1
  /** MPEG-PS pack count for a doc: 1..30. */
  def videoPacks(docId: Long): Int = (docId % 30).toInt + 1

  /** PNG fixed overhead: 8-byte signature + IHDR chunk (4 len + 4 type
    * + 13 data + 4 CRC).
    */
  val PngOverhead = 33
  /** RIFF/WAVE fixed overhead: RIFF(12) + fmt(24) + data header(8). */
  val WavOverhead = 44
  /** MPEG-2 program-stream pack header length. */
  val PackLen = 14

  // ----------------------------- writers ------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** A structurally valid PNG prefix: signature + IHDR (8-bit RGB,
    * deflate, no interlace) with a correct CRC-32 over type+data, then
    * the content bytes standing in for the compressed stream.
    */
  def pngPayload(docId: Long, content: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdrData = be32(imageWidth(docId)) ++ be32(imageHeight(docId)) ++
      Array(8.toByte, 2.toByte, 0.toByte, 0.toByte, 0.toByte)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ ihdrData
    val crc = new java.util.zip.CRC32
    crc.update(typeAndData)
    sig ++ be32(ihdrData.length) ++ typeAndData ++ be32(crc.getValue) ++ content
  }

  /** A complete RIFF/WAVE header (PCM s16) followed by the content
    * bytes as the `data` chunk payload.
    */
  def wavPayload(docId: Long, content: Array[Byte]): Array[Byte] = {
    val rate = audioSampleRate(docId)
    val ch = audioChannels(docId)
    val blockAlign = ch * 2            // 16-bit PCM
    val byteRate = rate * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36L + content.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(ch) ++ le32(rate) ++ le32(byteRate) ++
      le16(blockAlign) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(content.length) ++ content
  }

  /** MPEG-2 PS pack header (14 bytes): start code 000001BA, '01' SCR
    * marker prefix with correct marker bits, program mux rate, no
    * stuffing. SCR base encodes the pack index at 90 kHz so the packs
    * carry a real (monotone) clock.
    */
  def packHeader(packIdx: Int): Array[Byte] = {
    val scrBase = packIdx.toLong * 3600L          // 90 kHz ticks, 25 fps spacing
    val b = new Array[Byte](PackLen)
    b(0) = 0x00; b(1) = 0x00; b(2) = 0x01; b(3) = 0xBA.toByte
    // '01' + SCR[32..30] + marker + SCR[29..15] + marker + SCR[14..0] + marker + ext(9) + marker
    b(4) = (0x44 | (((scrBase >> 30) & 0x7) << 3) | ((scrBase >> 28) & 0x3)).toByte
    b(5) = ((scrBase >> 20) & 0xFF).toByte
    b(6) = (0x04 | (((scrBase >> 15) & 0x1F) << 3) | ((scrBase >> 13) & 0x3)).toByte
    b(7) = ((scrBase >> 5) & 0xFF).toByte
    b(8) = (0x04 | ((scrBase & 0x1F) << 3) | 0x3).toByte
    b(9) = 0x01.toByte                            // SCR ext low bits + marker
    b(10) = 0x00; b(11) = 0x01.toByte; b(12) = 0x83.toByte  // mux rate + markers
    b(13) = 0xF8.toByte                           // reserved + stuffing length 0
    b
  }

  /** MPEG-PS payload: content split across `videoPacks(docId)` packs,
    * each slice preceded by a pack header. UTF-8 content can never
    * contain the 00 00 01 BA start code (0x00 only encodes NUL), so a
    * start-code scan over the whole payload counts exactly the packs.
    */
  def mpegPayload(docId: Long, content: Array[Byte]): Array[Byte] = {
    val n = videoPacks(docId)
    val out = new java.io.ByteArrayOutputStream(content.length + n * PackLen)
    var i = 0
    while (i < n) {
      out.write(packHeader(i))
      val from = (content.length.toLong * i / n).toInt
      val to = (content.length.toLong * (i + 1) / n).toInt
      out.write(content, from, to - from)
      i += 1
    }
    out.toByteArray
  }

  /** Build a media table from `documents`: the content bytes inside a
    * real container structure, as a true `binary` payload. Header
    * construction is a per-row pure function — map-only, no shuffle.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)].map { case (docId, text) =>
      val content = text.getBytes("UTF-8")
      val (kind, payload) = (docId % 3) match {
        case 0 => ("image", pngPayload(docId, content))
        case 1 => ("audio", wavPayload(docId, content))
        case _ => ("video", mpegPayload(docId, content))
      }
      MediaRecord(docId, kind, payload, payload.length.toLong)
    }
  }

  /** Materialize the media corpus as parquet — payload lands as a real
    * BINARY column (verified in the spec), the at-rest shape every
    * downstream decode/feature job scans.
    */
  def writeMediaTable(documents: DataFrame, path: String): Unit =
    mediaFromDocuments(documents).write.mode("overwrite").parquet(path)

  // ----------------------------- decoder ------------------------------

  /** Header decoder: consumes ONLY the payload bytes (never doc_id),
    * sniffs the container magic, and parses the real structure. Strict:
    * a malformed header throws, so corruption fails loudly instead of
    * emitting fabricated metadata.
    */
  object HeaderDecoder {
    private def beU32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    private def leU32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    private def leU16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Parse a PNG: verify the 8-byte signature and the IHDR chunk
      * (type and CRC-32), return (width, height) from the big-endian
      * IHDR fields.
      */
    def parsePng(b: Array[Byte]): (Int, Int) = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
      require(b.length >= PngOverhead && b.take(8).sameElements(sig), "bad PNG signature")
      val len = beU32(b, 8)
      require(len == 13 && fourcc(b, 12) == "IHDR", "first chunk must be IHDR")
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      require(crc.getValue == beU32(b, 29), "IHDR CRC mismatch")
      (beU32(b, 16).toInt, beU32(b, 20).toInt)
    }

    /** Walk a RIFF/WAVE file's chunk list; return (sampleRate,
      * channels, durationMs) where duration = dataBytes * 1000 /
      * byteRate (integer ms, floor).
      */
    def parseWav(b: Array[Byte]): (Int, Int, Long) = {
      require(b.length >= WavOverhead && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE",
        "bad RIFF/WAVE header")
      var off = 12
      var rate = 0; var ch = 0; var byteRate = 0L; var dataBytes = -1L
      while (off + 8 <= b.length && (rate == 0 || dataBytes < 0)) {
        val id = fourcc(b, off)
        val size = leU32(b, off + 4)
        if (id == "fmt ") {
          require(size >= 16 && leU16(b, off + 8) == 1, "expect PCM fmt chunk")
          ch = leU16(b, off + 10)
          rate = leU32(b, off + 12).toInt
          byteRate = leU32(b, off + 16)
        } else if (id == "data") dataBytes = size
        off += 8 + size.toInt + (size.toInt & 1)  // chunks are word-aligned
      }
      require(rate > 0 && byteRate > 0 && dataBytes >= 0, "missing fmt /data chunk")
      (rate, ch, dataBytes * 1000L / byteRate)
    }

    /** Count MPEG-PS pack start codes (00 00 01 BA) by scanning the
      * byte stream — the pack count a demuxer would report.
      */
    def countPacks(b: Array[Byte]): Int = {
      var n = 0; var i = 0
      while (i + 3 < b.length) {
        if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 && b(i + 3) == 0xBA.toByte) {
          n += 1; i += PackLen   // skip the fixed-length pack header
        } else i += 1
      }
      require(n > 0, "no MPEG-PS pack start code")
      n
    }

    /** Decode a batch: per-partition so a native decoder could amortize
      * init; FNV-1a checksum over the full payload for integrity.
      */
    def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { r =>
        val cs = r.payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
        r.payload.take(MagicLen).toSeq match {
          case m if m == Magic("image").toSeq =>
            val (w, h) = parsePng(r.payload)
            MediaFeatures(r.media_id, r.kind, r.n_bytes, w, h, 1, 0, 0, 0L, cs)
          case m if m == Magic("audio").toSeq =>
            val (rate, ch, durMs) = parseWav(r.payload)
            MediaFeatures(r.media_id, r.kind, r.n_bytes, 0, 0, 0, rate, ch, durMs, cs)
          case m if m == Magic("video").toSeq =>
            MediaFeatures(r.media_id, r.kind, r.n_bytes, 0, 0, countPacks(r.payload), 0, 0, 0L, cs)
          case other => throw new IllegalArgumentException(
            s"unknown container magic ${other.map(b => f"${b & 0xFF}%02x").mkString}")
        }
      }
  }

  private def kindOf(id: Column): Column =
    when(id % 3 === 0, "image").when(id % 3 === 1, "audio").otherwise("video")

  /** The decode pipeline: typed Dataset → per-partition batch decode.
    * `mapPartitions` (not `map`) so a real decoder initializes once per
    * partition; repartition bound keeps each decode task's working set
    * small enough for executor memory at scale.
    */
  def decodePipeline(media: Dataset[MediaRecord], partitions: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(HeaderDecoder.decode _)
  }

  /** Post-resize metadata (what the pixel stage hands the encoder). */
  case class ResizedMedia(media_id: Long, kind: String, width: Int, height: Int,
                          target_w: Int, target_h: Int, scale_micro: Long)

  /** Resize stage: aspect-preserving fit into (maxW, maxH), never
    * upscaling — the standard pre-encoder contract. Applies to media
    * with known frame dimensions (images here; WAVE audio and PS packs
    * carry none in their headers), which it filters to. The CONTRACT —
    * scale = min(maxW/w, maxH/h, 1), integer floor of the scaled dims,
    * micro-unit scale factor for downstream bookkeeping — runs as a
    * pure column transform at scan speed (no shuffle, composes behind
    * [[decodePipeline]]'s partitioning).
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(f => f.width > 0 && f.height > 0).map { f =>
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
    * (frame 0 always included); images pass through as a single
    * frame 0, audio has no frames. Output cardinality is
    * Σ ceil(n_frames / everyN) — the fan-out a planner needs to size
    * the per-frame encode stage; rows stay (id, kind, idx) triples so
    * the explode shuffles no payload bytes (frames are re-fetched by
    * the encoder from the store).
    */
  def frameSample(features: Dataset[MediaFeatures], everyN: Int): Dataset[FrameRef] = {
    require(everyN >= 1, "everyN must be >= 1")
    val spark = features.sparkSession
    import spark.implicits._
    features.flatMap { f =>
      if (f.kind == "video") (0 until f.n_frames by everyN)
        .map(i => FrameRef(f.media_id, f.kind, i))
      else if (f.kind == "image") Seq(FrameRef(f.media_id, f.kind, 0))
      else Seq.empty
    }
  }

  /** C12 `multimodal_meta` — the SQL-checkable face of the pipeline:
    * byte accounting OVER THE BINARY PAYLOAD ITSELF (container headers
    * + content) plus fixed-size chunk counts (how many 256-byte tiles a
    * decoder would touch). Input is the materialized media table
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

  /** C12b `multimodal_decode` — the hash-checked face of the DECODER:
    * header-derived metadata parsed from the payload bytes alone
    * ([[HeaderDecoder]]), checked against a DuckDB oracle that replays
    * the write-time header arithmetic from doc_id. A parse bug (wrong
    * endianness, wrong offset, bad chunk walk) goes red here.
    */
  def mediaDecode(media: Dataset[MediaRecord], partitions: Int): DataFrame =
    decodePipeline(media, partitions)
      .toDF()
      .select(
        col("media_id").as("doc_id"), col("kind"),
        col("width"), col("height"), col("n_frames"),
        col("sample_rate"), col("channels"), col("duration_ms"))
      .orderBy(col("doc_id"))
}
