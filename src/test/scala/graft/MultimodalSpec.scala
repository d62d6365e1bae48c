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
}
