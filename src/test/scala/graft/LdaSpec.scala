package graft

import org.apache.spark.sql.functions._

/** m_text_lda / Ml.ldaTopics — planted-structure recovery (the property a
  * topic model exists to have) plus same-seed refit stability and
  * distribution sanity on the fixture corpus. */
class LdaSpec extends BaseSpec {
  import spark.implicits._

  private val vocabA = Vector("apple", "banana", "cherry", "date")
  private val vocabB = Vector("wolf", "fox", "bear", "lynx")

  /** 60 docs, each drawn ENTIRELY from one planted vocabulary — the
    * cleanest possible two-topic structure. Word choice varies by integer
    * arithmetic on the doc id (deterministic, no RNG). */
  private def plantedDocs = (0L until 60L).map { i =>
    val v = if (i % 2 == 0) vocabA else vocabB
    val words = (0 until 12).map(j => v(((i * 7 + j * 3) % 4).toInt))
    (i, words.mkString(" "))
  }.toDF("doc_id", "text")

  test("planted two-vocabulary corpus: each topic's top terms come from ONE vocabulary") {
    val topics = graft.queries.Ml.ldaTopics(spark, plantedDocs, k = 2, seed = 7L)
      .as[(Int, Int, String, Double)].collect().toList
    assert(topics.size == 10) // 2 topics x top-5, but vocab is 8 -> describeTopics(5) still 5
    val byTopic = topics.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byTopic.keySet == Set(0, 1))
    // the separation property: the top-4 terms of each topic (the planted
    // vocab size) live entirely in one vocabulary, and the two topics
    // recover DIFFERENT vocabularies
    def vocabOf(terms: Seq[String]): Option[Vector[String]] = {
      val top = terms.take(4).toSet
      if (top.subsetOf(vocabA.toSet)) Some(vocabA)
      else if (top.subsetOf(vocabB.toSet)) Some(vocabB)
      else None
    }
    val v0 = vocabOf(byTopic(0)); val v1 = vocabOf(byTopic(1))
    assert(v0.isDefined && v1.isDefined, s"mixed topics: $byTopic")
    assert(v0.get != v1.get, s"both topics recovered the same vocabulary: $byTopic")
  }

  test("same-seed refit reproduces the top-term lists; weights are a valid distribution slice") {
    val a = graft.queries.Ml.ldaTopics(spark, plantedDocs, k = 2, seed = 7L)
      .as[(Int, Int, String, Double)].collect().toList
    val b = graft.queries.Ml.ldaTopics(spark, plantedDocs, k = 2, seed = 7L)
      .as[(Int, Int, String, Double)].collect().toList
    assert(a == b, "same seed, same corpus, different topics")
    a.foreach { case (_, _, _, w) => assert(w > 0.0 && w < 1.0) }
    // within a topic, weights are non-increasing by rank
    a.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).map(_._4).sliding(2).foreach {
        case Seq(x, y) => assert(y <= x)
        case _ => ()
      }
    }
  }

  test("fixture corpus: 3 topics x 5 ranked terms, every term from the real vocabulary") {
    val got = SparkEntry.queries("m_text_lda")(spark, sf)
      .as[(Int, Int, String, Double)].collect().toList
    assert(got.size == 15)
    assert(got.map(_._1).toSet == Set(0, 1, 2))
    val vocab = Tables(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .filter(length($"t") > 0).distinct().as[String].collect().toSet
    got.foreach { case (_, _, term, _) => assert(vocab(term), term) }
  }
}
