package graft.operators

/** ADWIN — ADaptive WINdowing change detector (Bifet & Gavaldà, SDM 2007):
  * maintains a variable-length window over a value stream and SHRINKS it
  * whenever two adjacent sub-windows have means that differ beyond the
  * Hoeffding/Bernstein bound ε_cut — i.e., the window itself adapts to the
  * newest distribution, and every shrink IS a detected drift. The
  * exponential-histogram compression (≤ `maxPerSize` buckets per dyadic
  * size) keeps state at O(M·log n) buckets for an n-element window, which
  * is what makes it a STREAMING detector: memory is logarithmic in stream
  * length and every element costs amortized O(log n).
  *
  * This core is a PURE function over an immutable bucket vector — the same
  * code runs inside the streaming `StatefulProcessor` (state = the bucket
  * vector) and the spec's driver mirror, so streamed detections are
  * bit-identical to a driver fold over the same arrival order by
  * construction (the HoltWintersProcessor discipline). Buckets are stored
  * OLDEST-FIRST; merging always combines the two oldest buckets of an
  * over-full size, and the cut scan walks boundaries oldest-first —
  * deterministic for a fixed arrival order, no randomness anywhere.
  *
  * The cut test is the paper's normal-approximation variant (ADWIN2, §3.2):
  * with m = harmonic mean of the two sub-window sizes, δ' = δ/n and σ²_W
  * the whole-window variance,
  *   ε_cut = √((2/m)·σ²_W·ln(2/δ')) + (2/(3m))·ln(2/δ').
  */
object Adwin {

  /** One exponential-histogram bucket: `n` elements (a power of two)
    * summarized by (sum, sum of squares). */
  final case class B(sum: Double, sumSq: Double, n: Long)

  /** Outcome of one element: the new bucket vector, whether any old
    * buckets were dropped (= drift detected), and the post-cut window
    * (n, mean). */
  final case class Step(buckets: Vector[B], drift: Boolean, n: Long, mean: Double)

  /** Compress so at most `maxPerSize` buckets exist per dyadic size —
    * merging the two OLDEST of an over-full size into one of double size
    * (cascades upward). Buckets are oldest-first and sizes ascend toward
    * the front (oldest = largest), so each size class is contiguous. */
  private def compress(bs: Vector[B], maxPerSize: Int): Vector[B] = {
    var v = bs
    var size = 1L
    var maxSize = v.iterator.map(_.n).max
    while (size <= maxSize) {
      val idx = v.indices.filter(i => v(i).n == size)
      if (idx.length > maxPerSize) {
        // classes are contiguous (sizes descend from the oldest end), so
        // the two oldest of this size are adjacent; the merged 2s bucket
        // lands exactly at the class boundary
        val i = idx.head
        val merged = B(v(i).sum + v(i + 1).sum, v(i).sumSq + v(i + 1).sumSq, size * 2)
        v = (v.take(i) :+ merged) ++ v.drop(i + 2)
        maxSize = math.max(maxSize, size * 2)
        // recheck the same size — the class may still be over-full
      } else {
        size *= 2
      }
    }
    v
  }

  /** Feed one element; returns the updated window and whether it shrank. */
  def add(buckets: Vector[B], x: Double,
          delta: Double = 0.002, maxPerSize: Int = 5): Step = {
    var v = compress(buckets :+ B(x, x * x, 1L), maxPerSize)
    var drift = false
    // repeatedly try to drop the oldest bucket while some boundary cuts;
    // the whole-window stats (and with them σ²_W and δ') refresh after
    // every drop — the shrunken window is the new W
    var cutting = true
    while (cutting && v.length > 1) {
      cutting = false
      val nAll = v.iterator.map(_.n).sum
      val sAll = v.iterator.map(_.sum).sum
      val qAll = v.iterator.map(_.sumSq).sum
      val mu = sAll / nAll
      val varW = math.max(0.0, qAll / nAll - mu * mu)
      val dp = delta / math.max(1L, nAll)
      val ln2dp = math.log(2.0 / dp)
      var n0 = 0L
      var s0 = 0.0
      var i = 0
      while (!cutting && i < v.length - 1) {
        n0 += v(i).n; s0 += v(i).sum
        val n1 = nAll - n0
        val m = 1.0 / (1.0 / n0 + 1.0 / n1)
        val eps = math.sqrt(2.0 / m * varW * ln2dp) + 2.0 / (3.0 * m) * ln2dp
        if (math.abs(s0 / n0 - (sAll - s0) / n1) >= eps) {
          v = v.tail // drop the oldest bucket; rescan the shrunken window
          drift = true
          cutting = true
        }
        i += 1
      }
    }
    val n = v.iterator.map(_.n).sum
    Step(v, drift, n, v.iterator.map(_.sum).sum / n)
  }
}
