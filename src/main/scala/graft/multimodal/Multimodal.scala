package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media blob. */
case class MediaMeta(kind: String, width: Int, height: Int, sample_rate: Int)

/** One multimodal record: content as opaque bytes + typed metadata. */
case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)

/** Extracted per-blob features (what a real decoder would emit). */
case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
                         byte_hist: Array[Long], frames: Array[Array[Byte]])

/** SURVEY §2.11 — multimodal columns: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The decode step is STUBBED (no image/audio libs in this container): a
  * real deployment swaps [[decodeStub]] for an actual codec; everything
  * around it — schema, partitioning, per-partition batch shape, feature
  * and frame-sampling plumbing — is real and tested (MultimodalSpec).
  *
  * Scale notes: blobs never shuffle unless a later op groups on them (ops
  * here are per-row/per-partition, so a 100 TB media table streams through
  * scan→map with zero shuffle); features are small fixed-size vectors, so
  * downstream joins/aggs shuffle features, not bytes. */
object Multimodal {

  /** Deterministic fake media table derived from documents (test fixture
    * surface: utf-8 bytes stand in for encoded media). */
  def attachMedia(documents: DataFrame): Dataset[MediaRecord] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRecord(id, text.getBytes("UTF-8"),
          MediaMeta(kind, (nChars % 640).toInt, (nChars % 480).toInt, 16000))
      }
  }

  /** REAL DECODER GOES HERE. Deliberately unimplemented — callers use
    * [[fakeDecode]] in this container. Typed failure (not `???`) so an
    * accidental wiring surfaces as a clear message, not NotImplementedError. */
  def decodeStub(media: Array[Byte], meta: MediaMeta): Array[Byte] =
    throw new UnsupportedOperationException(
      s"media decode for kind=${meta.kind}: no codec libs in this image; use fakeDecode")

  /** Deterministic stand-in for decode: identity on bytes. */
  def fakeDecode(media: Array[Byte], meta: MediaMeta): Array[Byte] = media

  /** Feature extraction: 16-bucket byte histogram + every-nth-slice "frame"
    * sampling, processed with mapPartitions so a real decoder can amortize
    * per-batch init (model load, codec context) exactly like a Pandas-UDF
    * batch would. */
  def extractFeatures(records: Dataset[MediaRecord], frameCount: Int = 4): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init happens here (decoder/codec context)
      it.map { r =>
        val decoded = fakeDecode(r.media, r.meta)
        val hist = new Array[Long](16)
        decoded.foreach(b => hist((b & 0xff) >> 4) += 1)
        val n = decoded.length
        val frames =
          if (n == 0 || frameCount == 0) Array.empty[Array[Byte]]
          else {
            val step = math.max(1, n / frameCount)
            (0 until math.min(frameCount, n)).map { i =>
              decoded.slice(i * step, math.min(i * step + 8, n))
            }.toArray
          }
        MediaFeatures(r.id, r.meta.kind, n.toLong, hist, frames)
      }
    }
  }

  /** Feature table ready for relational ops (arrays exposed as columns). */
  def featureFrame(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(attachMedia(documents))
      .select($"id", $"kind", $"n_bytes", $"byte_hist", size($"frames").as("n_frames"))
  }

  /** Sniffed container metadata: format + dimensions/sample-rate parsed
    * from the blob's own header bytes. */
  case class SniffedMeta(format: String, width: Int, height: Int, sample_rate: Int)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** REAL (not stubbed) container-format metadata sniffing — the step a
    * media pipeline runs at scan time to validate/route blobs by
    * dimensions WITHOUT decoding them, and it needs no codec libraries,
    * only the published container layouts:
    *
    *  - PNG (ISO 15948 §5.2/§11.2.2): 8-byte signature, IHDR is always
    *    the first chunk → width/height big-endian at offsets 16/20.
    *  - JPEG (ITU T.81 §B.2.2): FF D8 then marker segments; height/width
    *    big-endian inside the first SOFn frame header (C0-CF except the
    *    non-frame C4/C8/CC), skipping other segments by their length.
    *  - GIF (87a/89a): logical screen width/height little-endian at 6/8.
    *  - WAV (RIFF): "RIFF....WAVE", then chunk walk to "fmt " → sample
    *    rate little-endian at fmt-data offset 4 (after format + channels).
    *
    * Anything else (or a truncated header) is "unknown" with zeroed
    * fields — malformed blobs classify, they never throw. */
  def sniffMeta(b: Array[Byte]): SniffedMeta = {
    def ascii(i: Int, s: String): Boolean =
      b.length >= i + s.length && s.indices.forall(j => (b(i + j) & 0xff) == s(j))
    try {
      if (b.length >= 24 &&
          (b(0) & 0xff) == 0x89 && ascii(1, "PNG") &&
          ascii(12, "IHDR"))
        SniffedMeta("png", be32(b, 16), be32(b, 20), 0)
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        // <= : a prefix ending exactly after the SOF width bytes (i+8)
        // must still parse — media pipelines sniff fixed-length prefixes
        while (i + 9 <= b.length) {
          if ((b(i) & 0xff) != 0xff) return SniffedMeta("unknown", 0, 0, 0)
          val marker = b(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return SniffedMeta("jpeg", be16(b, i + 7), be16(b, i + 5), 0)
          i += 2 + be16(b, i + 2)
        }
        SniffedMeta("unknown", 0, 0, 0)
      }
      else if (ascii(0, "GIF87a") || ascii(0, "GIF89a"))
        SniffedMeta("gif", le16(b, 6), le16(b, 8), 0)
      else if (ascii(0, "RIFF") && ascii(8, "WAVE")) {
        var i = 12
        while (i + 8 <= b.length) {
          val sz = le32(b, i + 4)
          if (ascii(i, "fmt ") && i + 16 <= b.length)
            return SniffedMeta("wav", 0, 0, le32(b, i + 12))
          // a corrupt negative chunk size would make the increment ≤ 0
          // and loop forever — malformed blobs must CLASSIFY, never hang
          if (sz < 0) return SniffedMeta("unknown", 0, 0, 0)
          i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
        }
        SniffedMeta("unknown", 0, 0, 0)
      }
      else SniffedMeta("unknown", 0, 0, 0)
    } catch { case _: IndexOutOfBoundsException => SniffedMeta("unknown", 0, 0, 0) }
  }

  /** Deterministic synthetic blobs with REAL container headers (the test
    * fixture has no media files): doc_id picks the format, dimensions /
    * sample rate derive integer-exactly from the id, and the header bytes
    * are assembled per the specs above — so [[sniffMeta]] parses genuine
    * layouts, not a private echo format. */
  def syntheticBlob(id: Long): Array[Byte] = {
    def be32a(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16a(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le16a(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32a(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val w = (id % 640 + 1).toInt; val h = (id % 480 + 1).toInt
    (id % 4) match {
      case 0 =>
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          be32a(13) ++ "IHDR".getBytes ++ be32a(w) ++ be32a(h) ++
          Array[Byte](8, 2, 0, 0, 0)
      case 1 =>
        // SOI, APP0 (len 4, payload 2), SOF0: len 11, precision, H, W, 1 comp
        Array[Byte](0xff.toByte, 0xd8.toByte,
          0xff.toByte, 0xe0.toByte, 0, 4, 'J', 'F') ++
          Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8) ++
          be16a(h) ++ be16a(w) ++ Array[Byte](1, 0x11, 0)
      case 2 =>
        "GIF89a".getBytes ++ le16a(w) ++ le16a(h) ++ Array[Byte](0, 0, 0)
      case _ =>
        val rate = (8000 + id % 40000).toInt
        "RIFF".getBytes ++ le32a(36) ++ "WAVE".getBytes ++
          "fmt ".getBytes ++ le32a(16) ++ le16a(1) ++ le16a(1) ++
          le32a(rate) ++ le32a(rate * 2) ++ le16a(2) ++ le16a(16)
    }
  }
}
