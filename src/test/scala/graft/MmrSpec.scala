package graft

import graft.operators.Mmr

/** q_sim_mmr has no SQL oracle (greedy recursion), so this spec is its
  * contract: the planted twin-demotion property, the argmax-rel first
  * pick, permutation/determinism invariants, and the declared key's
  * shape on the fixture. */
class MmrSpec extends BaseSpec {

  private def v(xs: Double*): Array[Double] = xs.toArray

  test("planted twins: the near-duplicate of an already-picked hit is demoted") {
    // a and b are near-identical high-rel hits; c is diverse, slightly
    // lower rel. Pure relevance ranks (a, b, c); MMR at λ=0.7 must pick
    // a, then c (b's similarity-to-a penalty beats its rel edge), then b.
    val cands = Seq(
      (1L, 0.95, v(1.0, 0.0, 0.01)),
      (2L, 0.94, v(1.0, 0.0, 0.02)),
      (3L, 0.80, v(0.0, 1.0, 0.0)))
    val got = Mmr.rerank(cands, k = 3, lambda = 0.7).map(_._1)
    assert(got == Seq(1L, 3L, 2L), s"expected twin demotion, got $got")
  }

  test("first pick is argmax relevance; ids tie-break ascending; output is a permutation") {
    val cands = Seq(
      (5L, 0.5, v(1.0, 0.0)), (2L, 0.9, v(0.0, 1.0)),
      (9L, 0.9, v(0.0, 1.0)), (7L, 0.7, v(0.5, 0.5)))
    val got = Mmr.rerank(cands, k = 4, lambda = 0.7)
    assert(got.head._1 == 2L, "argmax rel with smaller id wins the first pick")
    assert(got.map(_._1).toSet == cands.map(_._1).toSet)
    assert(got == Mmr.rerank(cands, k = 4, lambda = 0.7), "deterministic")
    // λ = 1 degenerates to pure relevance order (rel desc, id asc)
    val pure = Mmr.rerank(cands, k = 4, lambda = 1.0).map(_._1)
    assert(pure == Seq(2L, 9L, 7L, 5L), s"λ=1 must be pure relevance, got $pure")
  }

  test("q_sim_mmr: 10 ranked rows, rank 1 = nearest neighbour, no duplicate ids, stable") {
    val run1 = SparkEntry.queries("q_sim_mmr")(spark, sf).collect().toList
    assert(run1.size == 10)
    assert(run1.map(_.getAs[Long]("rank")) == (1L to 10L).toList)
    val ids = run1.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct == ids, "no candidate picked twice")
    // rank 1 carries the maximum rel of the returned set
    assert(run1.head.getAs[Double]("rel") == run1.map(_.getAs[Double]("rel")).max)
    val run2 = SparkEntry.queries("q_sim_mmr")(spark, sf).collect().toList
    assert(run1 == run2)
  }
}
