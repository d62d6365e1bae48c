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
}
