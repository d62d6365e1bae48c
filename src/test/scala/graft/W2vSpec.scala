package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.Word2Vec

/** m_text_w2v has no SQL oracle (iterative trained model), so this spec
  * is its correctness contract: seed stability of the declared key, and
  * the learning property itself — a planted co-occurrence pair must be
  * recovered as nearest neighbours while unrelated words rank below. */
class W2vSpec extends BaseSpec {
  import spark.implicits._

  test("m_text_w2v: seed-stable output, 3×5 neighbour rows, vocab matches the corpus") {
    val run1 = SparkEntry.queries("m_text_w2v")(spark, sf).collect().toList
    val run2 = SparkEntry.queries("m_text_w2v")(spark, sf).collect().toList
    assert(run1 == run2, "fixed seed + numPartitions=1 must be run-to-run identical")
    assert(run1.size == 15, s"3 probes × 5 neighbours, got ${run1.size}")
    val want = Tables(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("w")).distinct().count()
    assert(run1.head.getAs[Long]("vocab_size") == want,
      s"vocab ${run1.head.getAs[Long]("vocab_size")} vs corpus distinct $want")
    run1.groupBy(_.getAs[String]("probe")).foreach { case (p, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted == List(1, 2, 3, 4, 5), s"ranks for $p")
      assert(!rows.map(_.getAs[String]("word")).contains(p),
        "a probe is never its own neighbour")
    }
  }

  test("planted distributional similarity: words sharing a context rank first") {
    // skip-gram learns DISTRIBUTIONAL similarity (same contexts → close
    // vectors), so the plant pairs two words through identical context
    // words: red/crimson share (stop, warm), blue/azure share (go, cold)
    // — each must be the other's top synonym, never a cross-pair word
    val docs = (Seq.fill(200)("red stop warm") ++ Seq.fill(200)("crimson stop warm") ++
                Seq.fill(200)("blue go cold") ++ Seq.fill(200)("azure go cold"))
      .toDF("text").select(split($"text", " ").as("tokens"))
    val model = new Word2Vec().setInputCol("tokens").setOutputCol("v")
      .setVectorSize(8).setMinCount(1).setMaxIter(5)
      .setNumPartitions(1).setSeed(7L)
      .fit(docs)
    def top(w: String): String =
      model.findSynonyms(w, 1).select($"word").as[String].head()
    assert(top("red") == "crimson", s"crimson should top red, got ${top("red")}")
    assert(top("blue") == "azure", s"azure should top blue, got ${top("blue")}")
  }
}
