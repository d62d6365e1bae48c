package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** m_text_bpe has no SQL oracle (iterative merge training), so this spec
  * IS its correctness contract: an independent driver-side reference
  * trainer (list-walk merges, no regex) must produce the identical merge
  * sequence on the fixture corpus, plus the algebraic invariants —
  * greedy left-to-right overlap handling, deterministic tie-breaks, and
  * non-increasing merge counts.
  */
class BpeSpec extends BaseSpec {
  import spark.implicits._

  /** Reference BPE: symbols as lists, pair counts in a map, merges by an
    * explicit left-to-right walk — deliberately shares no code (or regex)
    * with operators/Bpe. Symbols are CODE POINTS (surrogate pairs stay
    * whole, as Spark's empty-regex split keeps them) and ties compare in
    * code-point order (≡ Spark's UTF8-binary string ordering) — NOT Java
    * String UTF-16 order, which diverges on supplementary-plane chars. */
  private def codePointSyms(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private val cpOrdering: Ordering[String] = (x: String, y: String) => {
    val a = x.codePoints().toArray; val b = y.codePoints().toArray
    val n = math.min(a.length, b.length)
    var i = 0; var r = 0
    while (i < n && r == 0) { r = Integer.compare(a(i), b(i)); i += 1 }
    if (r != 0) r else Integer.compare(a.length, b.length)
  }

  private def referenceTrain(words: Seq[(String, Long)], numMerges: Int,
                             minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (codePointSyms(w) :+ "</w>", f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _         =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, cpOrdering, cpOrdering))
        .headOption
      best.filter(_._2 >= minCount) match {
        case None => done = true
        case Some(((a, b), c)) =>
          step += 1
          out += ((step, a, b, c))
          vocab = vocab.map { case (syms, f) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                nb += (a + b); i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), f)
          }
      }
    }
    out.result()
  }

  private def run(df: org.apache.spark.sql.DataFrame): List[(Int, String, String, Long)] =
    df.as[(Int, String, String, Long)].collect().toList.sortBy(_._1)

  test("m_text_bpe equals the driver reference trainer on the fixture corpus") {
    val got = run(SparkEntry.queries("m_text_bpe")(spark, sf))
    val words = Tables(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toSeq
    val want = referenceTrain(words, numMerges = 8)
    assert(got == want.toList, s"merge sequences differ:\n got $got\nwant $want")
    assert(got.size == 8, "fixture corpus supports all 8 merges")
    // merge counts are non-increasing: a merge only creates pairs whose
    // count is bounded by its own, so the running max cannot rise
    got.map(_._4).sliding(2).foreach {
      case List(c1, c2) => assert(c1 >= c2, s"counts rose: $c1 -> $c2")
      case _            =>
    }
    assert(Bpe.lastIterations == 8)
  }

  test("greedy overlap and lexicographic ties: the 'aaa' trace") {
    val words = Seq(("aaa", 5L)).toDF("word", "freq")
    val got = Bpe.train(spark, words, numMerges = 8)
      .map(m => (m.step, m.left, m.right, m.cnt))
    // round 1: (a,a) appears twice per word (greedy pairs of "a a a </w>")
    //          → cnt 10, merged left-to-right: "aa a </w>" (NOT "a aa")
    // round 2: (a,</w>) and (aa,a) tie at 5 → lexicographic: "a" < "aa"
    // round 3: the only pair left
    assert(got == Seq((1, "a", "a", 10L), (2, "a", "</w>", 5L),
                      (3, "aa", "a</w>", 5L)))
    assert(Bpe.lastIterations == 3, "training stops when no pair remains")
  }

  test("supplementary-plane corpus: surrogate pairs stay whole, ties break by code point") {
    // U+FF01 (！) sorts BELOW U+1F600 (😀) by code point but ABOVE it in
    // Java UTF-16 unit order — the exact divergence the reference trainer
    // must mirror (Spark's orderBy is UTF8-binary ≡ code-point order).
    val corpus = Seq(("😀", 2L), ("！", 2L))
    val got = Bpe.train(spark, corpus.toDF("word", "freq"), numMerges = 2)
      .map(m => (m.step, m.left, m.right, m.cnt))
    val want = referenceTrain(corpus, numMerges = 2).toList
    assert(got == want, s"merge sequences diverge on emoji corpus:\n got $got\nwant $want")
    assert(got.head == ((1, "！", "</w>", 2L)),
      s"code-point tie-break must pick U+FF01 first, got ${got.head}")
  }

  test("minCount floors training: singleton pairs are never merged") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    assert(Bpe.train(spark, words, numMerges = 4).isEmpty)
    assert(Bpe.lastIterations == 0)
  }

  test("training is deterministic across runs") {
    val a = run(SparkEntry.queries("m_text_bpe")(spark, sf))
    val b = run(SparkEntry.queries("m_text_bpe")(spark, sf))
    assert(a == b)
  }
}
