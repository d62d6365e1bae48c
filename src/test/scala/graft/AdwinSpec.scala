package graft

import graft.operators.Adwin

/** ADWIN kernel (Bifet & Gavaldà, SDM 2007) — false-positive behavior on a
  * stationary stream, fast detection of a planted mean shift, the
  * exponential-histogram invariants, and window-content accounting. */
class AdwinSpec extends BaseSpec {

  private def drive(xs: Seq[Double]): (Vector[Adwin.B], Seq[Int]) = {
    var bs = Vector.empty[Adwin.B]
    val hits = Seq.newBuilder[Int]
    xs.zipWithIndex.foreach { case (x, i) =>
      val st = Adwin.add(bs, x)
      bs = st.buckets
      if (st.drift) hits += i
    }
    (bs, hits.result())
  }

  test("stationary stream: no drift in 2000 elements; histogram invariants hold") {
    // deterministic bounded wobble around 1.0 (variance ~0.25)
    val xs = (0 until 2000).map(i => if (i % 2 == 0) 0.5 else 1.5)
    val (bs, hits) = drive(xs)
    assert(hits.isEmpty, s"false drifts on a stationary stream: $hits")
    // window holds every element seen
    assert(bs.map(_.n).sum == 2000L)
    // dyadic sizes, ≤ 5 buckets per size class, oldest-first descending
    assert(bs.forall(b => (b.n & (b.n - 1)) == 0L), "non-dyadic bucket")
    bs.groupBy(_.n).foreach { case (sz, g) =>
      assert(g.length <= 5, s"size class $sz over-full: ${g.length}")
    }
    assert(bs.map(_.n).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "buckets not oldest-largest-first")
    // logarithmic state: well under the 2000 raw elements
    assert(bs.length <= 5 * 12, s"state not logarithmic: ${bs.length} buckets")
  }

  test("planted mean shift: detected within 100 elements, window shrinks to the new regime") {
    val xs = (0 until 600).map(i =>
      (if (i % 2 == 0) 0.5 else 1.5) + (if (i >= 400) 5.0 else 0.0))
    val (bs, hits) = drive(xs)
    assert(hits.nonEmpty, "mean shift missed entirely")
    assert(hits.head >= 400, s"drift before the shift: ${hits.head}")
    assert(hits.head <= 500, s"drift too slow: ${hits.head}")
    // after the stream ends, the surviving window's mean is the NEW regime
    val mean = bs.map(_.sum).sum / bs.map(_.n).sum
    assert(math.abs(mean - 6.0) < 0.5, s"window mean still mixed: $mean")
    // and the window no longer spans the whole stream
    assert(bs.map(_.n).sum < 600L)
  }

  test("drift detection is arrival-order deterministic: same input, same hits") {
    val xs = (0 until 300).map(i => (i * 2654435761L % 97).toDouble / 97.0) ++
      (0 until 300).map(i => 3.0 + (i * 40503L % 89).toDouble / 89.0)
    val (b1, h1) = drive(xs)
    val (b2, h2) = drive(xs)
    assert(h1 == h2 && b1 == b2, "nondeterministic kernel")
    assert(h1.nonEmpty && h1.head >= 300)
  }
}
