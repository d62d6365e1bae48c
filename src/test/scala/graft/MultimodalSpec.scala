package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** SURVEY §2.11 — multimodal binary-column plumbing (decode stubbed). */
class MultimodalSpec extends BaseSpec {
  import spark.implicits._

  test("media attach: every doc gets bytes + typed metadata") {
    val docs = Tables(spark, sf, "documents")
    val media = Multimodal.attachMedia(docs)
    assert(media.count() == docs.count())
    val kinds = media.map(_.meta.kind).distinct().collect().sorted.toList
    assert(kinds == List("audio", "image", "video"))
    assert(media.filter(r => r.media.isEmpty).count() == 0)
  }

  test("feature extraction: histogram sums to byte count, frames bounded") {
    val docs = Tables(spark, sf, "documents")
    val feats = Multimodal.extractFeatures(Multimodal.attachMedia(docs), frameCount = 4)
    val bad = feats.filter(f => f.byte_hist.sum != f.n_bytes).count()
    assert(bad == 0, "histogram must cover every byte")
    assert(feats.filter(f => f.frames.length > 4).count() == 0)
    assert(feats.filter(f => f.frames.exists(_.length > 8)).count() == 0)
  }

  test("feature frame is relational and join-ready") {
    val docs = Tables(spark, sf, "documents")
    val ff = Multimodal.featureFrame(spark, docs)
    assert(ff.columns.toList == List("id", "kind", "n_bytes", "byte_hist", "n_frames"))
    val joined = ff.join(Tables(spark, sf, "embeddings"), ff("id") === col("vec_id"))
    assert(joined.count() == docs.count())
  }

  test("decodeStub is the marked extension point") {
    val e = intercept[UnsupportedOperationException] {
      Multimodal.decodeStub(Array[Byte](1, 2), graft.multimodal.MediaMeta("image", 1, 1, 0))
    }
    assert(e.getMessage.contains("no codec libs"),
      "the seam must explain why decode is unavailable in this image")
  }

  test("sniffMeta parses real-world reference headers exactly") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // the canonical 1×1 PNG header (signature + IHDR), byte-for-byte
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, 0x08, 0x06, 0x00, 0x00, 0x00)
    assert(Multimodal.sniffMeta(png) == Multimodal.SniffedMeta("png", 1, 1, 0))
    // typical JFIF stream: SOI, APP0(len 16), DQT(len 4, skipped), SOF0 320×240
    val jpeg = bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xdb, 0x00, 0x04, 0, 0,
      0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 0xf0, 0x01, 0x40, 1, 0x11, 0)
    assert(Multimodal.sniffMeta(jpeg) == Multimodal.SniffedMeta("jpeg", 320, 240, 0))
    // GIF89a 320×240 little-endian screen descriptor
    val gif = "GIF89a".getBytes ++ bytes(0x40, 0x01, 0xf0, 0x00, 0, 0, 0)
    assert(Multimodal.sniffMeta(gif) == Multimodal.SniffedMeta("gif", 320, 240, 0))
    // canonical 44.1 kHz mono 16-bit WAV header
    val wav = "RIFF".getBytes ++ bytes(36, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0, 1, 0, 1, 0,
        0x44, 0xac, 0x00, 0x00, 0x88, 0x58, 0x01, 0x00, 2, 0, 16, 0)
    assert(Multimodal.sniffMeta(wav) == Multimodal.SniffedMeta("wav", 0, 0, 44100))
  }

  test("sniffMeta classifies malformed bytes as unknown, never throws") {
    val cases = Seq[Array[Byte]](
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      "GIF".getBytes, // truncated signature
      // PNG signature but truncated before IHDR dims
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0, 0),
      // JPEG SOI then garbage (no valid marker)
      Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x42),
      // RIFF but not WAVE
      "RIFFxxxxAVI LIST".getBytes,
      // RIFF/WAVE with a CORRUPT NEGATIVE chunk size — the chunk-walk
      // increment would be 0 without the guard (hang, not a throw)
      "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++ "WAVE".getBytes ++
        "datb".getBytes ++ Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
    for (c <- cases)
      assert(Multimodal.sniffMeta(c).format == "unknown", c.mkString(","))
  }

  test("sniffMeta parses a fixed-length JPEG prefix ending exactly at the SOF width") {
    // media pipelines sniff bounded prefixes; a buffer that ends
    // immediately after the SOF0 dimension bytes must still parse
    val prefix = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc0.toByte, 0x00, 0x0b, 8, 0x00, 0xf0.toByte, 0x01, 0x40)
    assert(Multimodal.sniffMeta(prefix) == Multimodal.SniffedMeta("jpeg", 320, 240, 0))
  }

  test("synthetic blobs round-trip their planted metadata through the parser") {
    for (id <- 0L until 64L) {
      val m = Multimodal.sniffMeta(Multimodal.syntheticBlob(id))
      (id % 4) match {
        case 0 => assert(m == Multimodal.SniffedMeta("png",
          (id % 640 + 1).toInt, (id % 480 + 1).toInt, 0), s"id=$id: $m")
        case 1 => assert(m == Multimodal.SniffedMeta("jpeg",
          (id % 640 + 1).toInt, (id % 480 + 1).toInt, 0), s"id=$id: $m")
        case 2 => assert(m == Multimodal.SniffedMeta("gif",
          (id % 640 + 1).toInt, (id % 480 + 1).toInt, 0), s"id=$id: $m")
        case _ => assert(m == Multimodal.SniffedMeta("wav",
          0, 0, (8000 + id % 40000).toInt), s"id=$id: $m")
      }
    }
  }
}
