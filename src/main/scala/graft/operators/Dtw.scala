package graft.operators

/** Dynamic time warping distance (Sakoe & Chiba, IEEE TASSP 1978) between
  * two fixed-length profiles, L1 local cost, no warping-window constraint:
  * the elastic-alignment similarity the time-series keys' lock-step
  * measures (q_time_xcorr's Pearson at fixed lags, q_traj_sim) cannot
  * express — two identical shapes offset by an hour read FAR in lock-step
  * but near under warping.
  *
  * Standard O(|a|·|b|) rolling-row DP. Driver-sized BY CONTRACT: callers
  * feed bounded profiles (the 24-slot clock, a PAA sketch), never raw
  * series — the m_time_dtw key collects a ≤|types|×24 matrix (the MMR /
  * AnnPQ probe-sized-collect discipline) after the one data-sized
  * distributed aggregation. For data-sized alignment workloads the right
  * tool is a banded DP over keyed pairs, out of scope by declaration. */
object Dtw {

  def dist(a: Array[Double], b: Array[Double]): Double = {
    require(a.nonEmpty && b.nonEmpty, "DTW over an empty profile")
    var prev = new Array[Double](b.length)
    var cur = new Array[Double](b.length)
    var j = 0
    prev(0) = math.abs(a(0) - b(0))
    j = 1
    while (j < b.length) { prev(j) = prev(j - 1) + math.abs(a(0) - b(j)); j += 1 }
    var i = 1
    while (i < a.length) {
      cur(0) = prev(0) + math.abs(a(i) - b(0))
      j = 1
      while (j < b.length) {
        cur(j) = math.abs(a(i) - b(j)) +
          math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length - 1)
  }
}
