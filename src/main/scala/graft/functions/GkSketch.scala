package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Greenwald-Khanna ε-approximate quantile summary (Greenwald & Khanna,
  * "Space-Efficient Online Computation of Quantile Summaries", SIGMOD 2001)
  * — the insertable face of the sketch family whose MERGEABLE face the
  * batch path already uses (`percentile_approx`, `m_agg_quantile`). This
  * implementation backs the streaming twin ([[graft.streaming
  * .GkQuantileProcessor]]): per-key state is the summary's tuple list, so
  * state size is O((1/ε)·log(εn)) — independent of stream length — while
  * any requested quantile is answered with rank error ≤ εn.
  *
  * Tuples (v, g, Δ) are kept sorted by v; rmin(i) = Σ_{j≤i} g_j and
  * rmax(i) = rmin(i) + Δ_i bracket v_i's true rank. The simplified
  * band-free compress (merge neighbor i into i+1 whenever
  * g_i + g_{i+1} + Δ_{i+1} ≤ 2εn) preserves the query-correctness
  * invariant max(g_i + Δ_i) ≤ 2εn — the band structure of the full paper
  * only tightens the SPACE constant, not the error bound, which is the
  * right trade for a state-store-resident summary (FunctionsSpec pins both
  * the rank error and the size bound empirically).
  *
  * Not thread-safe; one instance per state-store key per batch.
  */
final class GkSummary(val eps: Double) extends Serializable {
  val vs = new ArrayBuffer[Double]()
  val gs = new ArrayBuffer[Long]()
  val ds = new ArrayBuffer[Long]()
  var n: Long = 0L
  private var sinceCompress = 0
  private val compressEvery = math.max(1, (1.0 / (2.0 * eps)).toInt)

  /** First index whose value is ≥ v (binary search; insertion point). */
  private def lowerBound(v: Double): Int = {
    var lo = 0
    var hi = vs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def insert(v: Double): Unit = {
    val idx = lowerBound(v)
    val delta =
      if (idx == 0 || idx == vs.length) 0L
      else math.max(0L, (2.0 * eps * n).toLong - 1L)
    vs.insert(idx, v)
    gs.insert(idx, 1L)
    ds.insert(idx, delta)
    n += 1
    sinceCompress += 1
    if (sinceCompress >= compressEvery) { compress(); sinceCompress = 0 }
  }

  /** Merge mergeable neighbors right-to-left; the min tuple (index 0) and
    * the max tuple (merge target only) always survive. */
  def compress(): Unit = {
    val thresh = (2.0 * eps * n).toLong
    var i = vs.length - 2
    while (i >= 1) {
      if (i + 1 < vs.length && gs(i) + gs(i + 1) + ds(i + 1) <= thresh) {
        gs(i + 1) += gs(i)
        vs.remove(i); gs.remove(i); ds.remove(i)
      }
      i -= 1
    }
  }

  /** Value whose rank is within εn of ceil(φ·n). NaN on an empty summary. */
  def query(phi: Double): Double = {
    if (n == 0L || vs.isEmpty) return Double.NaN
    val r = math.ceil(phi * n).toLong
    val e = math.ceil(eps * n).toLong
    var rmin = 0L
    var i = 0
    while (i < vs.length) {
      rmin += gs(i)
      if (rmin + ds(i) > r + e) return vs(math.max(0, i - 1))
      i += 1
    }
    vs(vs.length - 1)
  }

  def tupleCount: Int = vs.length
}
