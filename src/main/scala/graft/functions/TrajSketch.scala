package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType}

/** Cell-sketch kernels that make the track-DP family scale past the U²·cap²
  * wall (SURVEY §2.10, round-15): per-fix 2.5° lattice cells turn the LCSS
  * and EDR DPs into EXACT sparse-match algorithms, and give Hausdorff (and
  * through it Fréchet) a cheap EXACT lower bound for threshold pruning.
  *
  * WHY NOT THE DOCUMENTED MinHash-LSH TIER: round-15 measured the premise
  * and the fixture refutes it. The visited-cell Jaccard of the true top-10
  * pairs is statistically indistinguishable from random pairs (sf0.01:
  * top-10 Fréchet J ∈ [0, 0.063] vs all-pairs median 0.033 — one top-10
  * pair shares ZERO cells, so NO Jaccard-LSH family can emit it as a
  * candidate except by hash accident). Banding aggressive enough to reach
  * those pairs admits essentially every pair; banding that filters loses
  * true top-10 rows. MinHash-LSH remains the right tool for the
  * THRESHOLD/corridor form (see [[graft.operators.TrajLsh]], where planted
  * corridors have J ≥ 0.5 and OR-amplification is sound) — but the top-10
  * NEAREST form needs bounds that are exact, not probabilistic. These are.
  *
  * The cell lattice: 2.5° × 2.5°, row = floor((lat+90)/2.5) ∈ [0,71],
  * col = floor((lon+180)/2.5) ∈ [0,143], id = row·256 + col (SHIFT-
  * decodable — the ×10 probe measured the div/mod decode as a real cost
  * at 10⁸ pairs × thousands of decodes) — integer-
  * exact from the 0.1°-resolution fixture coordinates (2.5-degree
  * boundaries are exact binary doubles, so the floor can never split on an
  * ulp). The one geometric primitive is an exact LOWER bound on the
  * great-circle distance between any two points of two cells:
  *
  *   d ≥ 2R·asin √( sin²(Δφ_min/2) + cosφ̂₁·cosφ̂₂·sin²(Δλ_min/2) )
  *
  * with Δφ_min the row gap, Δλ_min the circular column gap, and cosφ̂ the
  * cosine at each cell's most-polar edge — every haversine term minimized
  * independently, so the bound is ≤ the true distance for ANY point
  * placement (including the polar shrink of lon arcs that breaks naive
  * "neighbor cells" heuristics). All row/gap terms come from tiny static
  * tables; comparisons run in the monotone haversine-sq domain and only a
  * final value pays an asin (the TrajSim chord² discipline).
  *
  * PER-PAIR COST DISCIPLINE (the round-15 probe lesson — the first cut of
  * these kernels copied both arrays and re-sorted B's cells per pair, and
  * the ×10 scan got SLOWER than the DPs it replaced): every kernel here
  * reads its inputs through ArrayData getters (zero copies), the sorted
  * cell structures are computed ONCE PER USER by the caller (the packed
  * `(cell << 32 | fixIdx)` array and the distinct sorted cell array are
  * `tracks()` columns), and all per-pair working memory comes from a
  * thread-local scratch (bounded by TrackCap² — never grows, never
  * allocates on the hot path).
  *
  * Exactness arguments, pinned by TrajectorySpec:
  *  - LCSS = longest strictly-monotone chain over the ε-match set
  *    (Hunt & Szymanski, CACM 1977): matches are found by cell-range
  *    lookup (a superset by the bound above — any pair within ε lies
  *    within the tabled cell radius), verified by the exact chord² test,
  *    then chained by patience LIS with per-i snapshots (strict i AND j
  *    increase — the 1-1 matching LCSS requires). Identical to the full
  *    DP on every input; cost O(n·bands + P log P) instead of O(n·m).
  *  - EDR: any alignment decomposes into its matched pairs (a monotone
  *    chain) plus gap segments, and a p-vs-q gap with no free match costs
  *    exactly max(p, q) (min(p,q) substitutions + |p−q| indels) — so
  *    EDR = min over chains of Σ max-gap, a DP over the sparse match set
  *    (O(P²), falling back to the full-matrix kernel when P is dense —
  *    both paths exact, the fallback merely faster at high match density).
  *  - Hausdorff lower bound: dH ≥ max over cells of one track of the
  *    min cell-bound to the other's cells — exact because every fix lies
  *    in its cell and the cell bound under-estimates every point pair.
  *    The threshold form ([[TrajSketch.hausLbExceeds]]) needs only
  *    "lb > thr?", so the scan exits at the FIRST cell proving it —
  *    ~|cells| table lookups for a far pair, not |cells|². Fréchet
  *    inherits the bound (every coupling matches each fix of A to some
  *    fix of B, so dF ≥ directed Hausdorff both ways), though on this
  *    fixture the endpoint bound dominates and stays the Fréchet pruner. */
object TrajSketch {

  private[graft] val CellDeg = 2.5
  private[graft] val NLon = 144 // 360 / 2.5
  private[graft] val NRow = 72  // 180 / 2.5
  private val R = HaversineDist.EarthRadiusKm

  /** sin²(Δφ_min/2) by row gap |r1−r2| (gap 0 for adjacent/overlapping). */
  private val rowGapHav: Array[Double] = Array.tabulate(NRow) { dr =>
    val gapDeg = math.max(0, dr - 1) * CellDeg
    val s = math.sin(math.toRadians(gapDeg) / 2.0)
    s * s
  }

  /** sin²(Δλ_min/2) by circular column gap (gap 0 for adjacent/same). */
  private val colGapHav: Array[Double] = Array.tabulate(NLon / 2 + 1) { dc =>
    val gapDeg = math.max(0, dc - 1) * CellDeg
    val s = math.sin(math.toRadians(gapDeg) / 2.0)
    s * s
  }

  /** cos(lat) at the most-polar edge of each row. */
  private val cosEdge: Array[Double] = Array.tabulate(NRow) { r =>
    val lo = -90.0 + r * CellDeg
    val hi = lo + CellDeg
    math.cos(math.toRadians(math.max(math.abs(lo), math.abs(hi))))
  }

  /** Haversine-sq lower bound between two cells (monotone in distance). */
  @inline private def cellHavLb(c1: Int, c2: Int): Double = {
    val r1 = c1 >>> 8; val r2 = c2 >>> 8
    val dr = math.abs(r1 - r2)
    var dc = math.abs((c1 & 0xff) - (c2 & 0xff))
    if (dc > NLon / 2) dc = NLon - dc
    rowGapHav(dr) + cosEdge(r1) * cosEdge(r2) * colGapHav(dc)
  }

  private def havSqToKm(h: Double): Double =
    2.0 * R * math.asin(math.min(1.0, math.sqrt(h)))

  @inline private def kmToHavSq(km: Double): Double = {
    val s = math.sin(km / (2.0 * R))
    s * s
  }

  /** Per-row table: max column gap dc such that two cells (r1, ·), (r2, ·)
    * at that gap can still hold points within `epsKm` — the cell-range
    * radius of the ε-match lookup. Computed once per (eps, r1, r2-band). */
  private final class MatchGeom(epsKm: Double) {
    val epsHav: Double = kmToHavSq(epsKm)
    // row band: |r1-r2| beyond which the row gap alone exceeds eps
    val maxDr: Int = {
      var dr = 0
      while (dr < NRow - 1 && rowGapHav(dr + 1) <= epsHav) dr += 1
      dr
    }
    // dcMax(r1)(r2 - r1 + maxDr): widest admissible column gap per row pair
    val dcMax: Array[Array[Int]] = Array.tabulate(NRow, 2 * maxDr + 1) { (r1, k) =>
      val r2 = r1 + k - maxDr
      if (r2 < 0 || r2 >= NRow) -1
      else {
        var dc = NLon / 2
        while (dc > 0 &&
          rowGapHav(math.abs(r1 - r2)) +
            cosEdge(r1) * cosEdge(r2) * colGapHav(dc) > epsHav) dc -= 1
        dc
      }
    }
  }

  // eps is a per-key constant (MatchEpsKm); memoize the tables per value
  private val geoms = new java.util.concurrent.ConcurrentHashMap[Double, MatchGeom]
  private def geom(epsKm: Double): MatchGeom = {
    val g = geoms.get(epsKm)
    if (g != null) g
    else { val ng = new MatchGeom(epsKm); geoms.putIfAbsent(epsKm, ng); geoms.get(epsKm) }
  }

  /** Per-thread working memory, bounded by TrackCap² = 4096 — no hot-path
    * allocation (the round-15 probe lesson in the file scaladoc). */
  private final class Scratch {
    val matches = new Array[Long](4096)
    val tails = new Array[Int](64)
    val snap = new Array[Int](64)
    val dp = new Array[Long](4096)
    // per-pair bulk copies of the small sketch arrays: ONE getter loop
    // per pair instead of thousands of megamorphic ArrayData accesses
    // inside the search loops (measured 3-10× per-pair at the ×10 probe)
    val pbufA = new Array[Long](64)
    val pbufB = new Array[Long](64)
    val cbufA = new Array[Int](64)
    val cbufB = new Array[Int](64)
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Squared chord distance between track points, via ArrayData getters. */
  @inline private def chordSqAD(a: ArrayData, i: Int, b: ArrayData, j: Int): Double = {
    val dx = a.getDouble(3 * i) - b.getDouble(3 * j)
    val dy = a.getDouble(3 * i + 1) - b.getDouble(3 * j + 1)
    val dz = a.getDouble(3 * i + 2) - b.getDouble(3 * j + 2)
    dx * dx + dy * dy + dz * dz
  }

  private def checkAligned(pb: ArrayData, xs: ArrayData, name: String): Unit =
    if (pb.numElements() * 3 != xs.numElements())
      throw new IllegalArgumentException(
        s"$name: packed cell array (${pb.numElements()}) must align 1:1 with " +
          s"the interleaved track (${xs.numElements() / 3} points)")

  /** The ε-match set {(i, j) : d(a_i, b_j) ≤ eps}, exact, written packed
    * i·2³²+j into `out` sorted ascending; returns the count. Both packed
    * inputs are (cell << 32 | fixIdx) sorted ascending (a `tracks()`
    * column — computed once per user, never per pair). */
  private def findMatches(pa: Array[Long], nA: Int, ta: ArrayData,
                          pb: Array[Long], nB: Int, tb: ArrayData,
                          epsKm: Double, out: Array[Long]): Int = {
    val g = geom(epsKm)
    val s = 2.0 * math.sin(epsKm / (2.0 * R))
    val epsC2 = s * s
    var cnt = 0
    var p = 0
    while (p < nA) {
      val packed = pa(p)
      val c = (packed >>> 32).toInt
      val i = (packed & 0xffffffffL).toInt
      val r1 = c >>> 8
      val col = c & 0xff
      var k = 0
      while (k < 2 * g.maxDr + 1) {
        val r2 = r1 + k - g.maxDr
        if (r2 >= 0 && r2 < NRow) {
          val dcm = g.dcMax(r1)(k)
          if (dcm >= 0) {
            // circular column window [col−dcm, col+dcm] → 1 or 2 linear runs
            val width = 2 * dcm + 1
            val lo0 = ((col - dcm) % NLon + NLon) % NLon
            val nRuns = if (width >= NLon || lo0 + width <= NLon) 1 else 2
            var run = 0
            while (run < nRuns) {
              val (lo, hi) =
                if (width >= NLon) (0, NLon - 1)
                else if (nRuns == 2) {
                  if (run == 0) (lo0, NLon - 1) else (0, lo0 + width - 1 - NLon)
                } else (lo0, lo0 + width - 1)
              val loKey = ((r2.toLong << 8) + lo) << 32
              val hiKey = (((r2.toLong << 8) + hi) << 32) | 0xffffffffL
              var q = lowerBound(pb, nB, loKey)
              while (q < nB && pb(q) <= hiKey) {
                val jj = (pb(q) & 0xffffffffL).toInt
                if (chordSqAD(ta, i, tb, jj) <= epsC2) {
                  out(cnt) = (i.toLong << 32) | jj.toLong
                  cnt += 1
                }
                q += 1
              }
              run += 1
            }
          }
        }
        k += 1
      }
      p += 1
    }
    java.util.Arrays.sort(out, 0, cnt) // i-major, j-minor (both non-negative)
    cnt
  }

  @inline private def lowerBound(a: Array[Long], n: Int, key: Long): Int = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  @inline private def copyLongs(src: ArrayData, buf: Array[Long]): Array[Long] = {
    val n = src.numElements()
    val out = if (n > buf.length) new Array[Long](n) else buf
    var i = 0
    while (i < n) { out(i) = src.getLong(i); i += 1 }
    out
  }

  @inline private def copyInts(src: ArrayData, buf: Array[Int]): Array[Int] = {
    val n = src.numElements()
    val out = if (n > buf.length) new Array[Int](n) else buf
    var i = 0
    while (i < n) { out(i) = src.getInt(i); i += 1 }
    out
  }

  /** Exact LCSS match count via sparse matches + patience LIS (strict
    * chain in both i and j; per-i snapshot keeps same-i matches from
    * chaining each other). ≡ [[LcssMatches.compute]] on every input. */
  def lcssSparse(pa: ArrayData, a: ArrayData, pb: ArrayData, b: ArrayData,
                 epsKm: Double): Long = {
    checkAligned(pa, a, "lcss_sparse"); checkAligned(pb, b, "lcss_sparse")
    if (pa.numElements() == 0 || pb.numElements() == 0)
      throw new IllegalArgumentException("lcss_sparse: empty track")
    // declared size crossover (probe-measured): below ~40×40 the plain
    // matrix (3 flops/cell, branch-predictable) beats the banded search's
    // fixed overhead; both paths exact, so the gate is pure cost
    if (pa.numElements().toLong * pb.numElements() <= 1600)
      return LcssMatches.compute(a, b, epsKm)
    val sc = scratch.get()
    // scratch is sized for the TrackCap contract; oversized ad-hoc inputs
    // (spec-only) fall back to fresh arrays rather than overflowing
    val big = pa.numElements().toLong * pb.numElements() > sc.matches.length
    val ms = if (big) new Array[Long](pa.numElements() * pb.numElements()) else sc.matches
    val paB = copyLongs(pa, sc.pbufA)
    val pbB = copyLongs(pb, sc.pbufB)
    val nM = findMatches(paB, pa.numElements(), a, pbB, pb.numElements(), b, epsKm, ms)
    val tMax = math.min(pa.numElements(), pb.numElements())
    val tails = if (tMax > sc.tails.length) new Array[Int](tMax) else sc.tails
    val snap = if (tMax > sc.snap.length) new Array[Int](tMax) else sc.snap
    var len = 0
    var k = 0
    while (k < nM) {
      val i0 = (ms(k) >>> 32).toInt
      var e = k
      while (e < nM && (ms(e) >>> 32).toInt == i0) e += 1
      // snapshot: binary searches for this i-group see only pre-group state
      System.arraycopy(tails, 0, snap, 0, len)
      val snapLen = len
      var t = k
      while (t < e) {
        val j = (ms(t) & 0xffffffffL).toInt
        val pos = lbInt(snap, snapLen, j)
        if (pos == len) { tails(len) = j; len += 1 }
        else if (j < tails(pos)) tails(pos) = j
        t += 1
      }
      k = e
    }
    len.toLong
  }

  @inline private def lbInt(a: Array[Int], n: Int, key: Int): Int = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Exact EDR via the sparse-chain gap DP (file scaladoc); falls back to
    * the full-matrix kernel when the match set is dense enough that O(P²)
    * would lose to O(n·m). ≡ [[EdrDist.compute]] on every input. */
  def edrSparse(pa: ArrayData, a: ArrayData, pb: ArrayData, b: ArrayData,
                epsKm: Double): Long = {
    checkAligned(pa, a, "edr_sparse"); checkAligned(pb, b, "edr_sparse")
    val n = pa.numElements()
    val m = pb.numElements()
    if (n == 0 || m == 0)
      throw new IllegalArgumentException("edr_sparse: empty track")
    // same declared size crossover as lcssSparse
    if (n.toLong * m <= 1600) return EdrDist.compute(a, b, epsKm)
    val sc = scratch.get()
    val big = n.toLong * m > sc.matches.length
    val ms = if (big) new Array[Long](n * m) else sc.matches
    val paB = copyLongs(pa, sc.pbufA)
    val pbB = copyLongs(pb, sc.pbufB)
    val nM = findMatches(paB, n, a, pbB, m, b, epsKm, ms)
    if (nM.toLong * nM > 4L * n * m) return EdrDist.compute(a, b, epsKm)
    // dp(t) = cheapest cost of an alignment prefix ending in match t
    var best = math.max(n, m).toLong // the no-match alignment
    val dp = if (nM > sc.dp.length) new Array[Long](nM) else sc.dp
    var t = 0
    while (t < nM) {
      val it = (ms(t) >>> 32).toInt
      val jt = (ms(t) & 0xffffffffL).toInt
      var c = math.max(it, jt).toLong // head gap
      var s = 0
      while (s < t) {
        val is = (ms(s) >>> 32).toInt
        val js = (ms(s) & 0xffffffffL).toInt
        if (is < it && js < jt) {
          val v = dp(s) + math.max(it - is - 1, jt - js - 1).toLong
          if (v < c) c = v
        }
        s += 1
      }
      dp(t) = c
      val tail = math.max(n - 1 - it, m - 1 - jt).toLong
      if (c + tail < best) best = c + tail
      t += 1
    }
    best
  }

  /** Exact lower bound on the symmetric Hausdorff distance (km) from the
    * two DISTINCT SORTED cell arrays (a `tracks()` column). Max-min in
    * the monotone haversine-sq domain with the classic cutoff. Used by
    * TrajectorySpec's bound axiom; the pruned key uses the cheaper
    * threshold form [[hausLbExceeds]]. */
  def hausLbKm(ca: ArrayData, cb: ArrayData): Double = {
    val nA = ca.numElements()
    val nB = cb.numElements()
    if (nA == 0 || nB == 0)
      throw new IllegalArgumentException("haus_lb_km: empty cell array")
    val sc = scratch.get()
    val a = copyInts(ca, sc.cbufA)
    val b = copyInts(cb, sc.cbufB)
    math.max(directedLb(a, nA, b, nB), directedLb(b, nB, a, nA))
  }

  private def directedLb(p: Array[Int], np: Int, q: Array[Int], nq: Int): Double = {
    var best = 0.0
    var i = 0
    while (i < np) {
      var minH = Double.MaxValue
      var j = 0
      val ci = p(i)
      while (j < nq && minH > best) {
        val h = cellHavLb(ci, q(j))
        if (h < minH) minH = h
        j += 1
      }
      if (minH > best) best = minH
      i += 1
    }
    havSqToKm(best)
  }

  /** TRUE iff the exact Hausdorff lower bound exceeds `thrKm` — i.e. the
    * pair is provably NOT within the threshold and the pruned key may
    * drop it without running the kernel. Early-exit both ways: one cell
    * of either track with no counterpart cell within thr proves it, so a
    * far pair costs ~|cells| table lookups (the stage-1 scan is the ×10
    * wall — this form is what keeps it ns-scale per pair). */
  def hausLbExceeds(ca: ArrayData, cb: ArrayData, thrKm: Double): Boolean = {
    val nA = ca.numElements()
    val nB = cb.numElements()
    if (nA == 0 || nB == 0)
      throw new IllegalArgumentException("haus_lb_exceeds: empty cell array")
    val thrHav = kmToHavSq(math.min(thrKm, math.Pi * R))
    val sc = scratch.get()
    val a = copyInts(ca, sc.cbufA)
    val b = copyInts(cb, sc.cbufB)
    directedExceeds(a, nA, b, nB, thrHav) || directedExceeds(b, nB, a, nA, thrHav)
  }

  private def directedExceeds(p: Array[Int], np: Int, q: Array[Int], nq: Int,
                              thrHav: Double): Boolean = {
    var i = 0
    while (i < np) {
      val ci = p(i)
      var ok = false
      var j = 0
      while (j < nq && !ok) {
        if (cellHavLb(ci, q(j)) <= thrHav) ok = true
        j += 1
      }
      if (!ok) return true // this cell alone proves lb > thr
      i += 1
    }
    false
  }

  /** Shared-cell count of two DISTINCT SORTED cell arrays — the cheap
    * (one merge pass) closeness PROXY the pruned keys use to SEED their
    * threshold: any ≥10-pair subset gives a valid (≥ d₁₀) threshold, so
    * the proxy only affects how TIGHT the prune is, never correctness. */
  def cellOverlap(ca: ArrayData, cb: ArrayData): Int = {
    val nA = ca.numElements()
    val nB = cb.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < nA && j < nB) {
      val a = ca.getInt(i)
      val b = cb.getInt(j)
      if (a == b) { cnt += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    cnt
  }

  /** Cell id for (lat, lon) — the tracks() fc formula, shared so no
    * second derivation of the encoding can drift. Domain edges are
    * CLOSED: lat = 90 would floor to row 72 (off the 72-entry
    * rowGapHav/cosEdge tables and the 162-word dilation bitmap) and
    * lon = 180 to col 144 — row clamps to NRow-1 and col wraps mod NLon
    * (the antimeridian IS cell 0), so every real-world coordinate maps
    * to a valid cell. The tracks() fc SQL derivation applies the same
    * clamp/wrap. */
  def cellId(lat: Double, lon: Double): Int = {
    val row = math.min(NRow - 1,
      math.max(0, math.floor((lat + 90.0) / CellDeg).toInt))
    val col0 = math.floor((lon + 180.0) / CellDeg).toInt % NLon
    val col = if (col0 < 0) col0 + NLon else col0
    (row << 8) | col
  }

  /** Bitmap word count for the dilation bitmaps: NRow × NLon cells packed
    * by word = (row·NLon + col) ÷ 64 — DENSE row-major (not the shifted
    * cell-id space, which would waste 44% of the bits). */
  private[graft] val DilWords = NRow * NLon / 64 // 162

  /** The ε-DILATION BITMAP of a cell set: bit (row·NLon + col) is set iff
    * some input cell's ε-range (the findMatches dcMax tables — the same
    * superset geometry) covers (row, col). Computed ONCE PER USER as a
    * tracks() column (the round-15 probe lesson, round 2: the per-pair
    * band-search near-test measured 10 µs/pair — precomputing the
    * dilation turns the pair-time bound into one bit test per fix). */
  def dilatedBitmap(cells: ArrayData, epsKm: Double): Array[Long] = {
    val g = geom(epsKm)
    val out = new Array[Long](DilWords)
    val n = cells.numElements()
    var i = 0
    while (i < n) {
      val c = cells.getInt(i)
      val r1 = c >>> 8
      val col = c & 0xff
      var k = 0
      while (k < 2 * g.maxDr + 1) {
        val r2 = r1 + k - g.maxDr
        if (r2 >= 0 && r2 < NRow) {
          val dcm = g.dcMax(r1)(k)
          if (dcm >= 0) {
            var dc = -dcm
            while (dc <= dcm) {
              val cc = ((col + dc) % NLon + NLon) % NLon
              val bit = r2 * NLon + cc
              out(bit >>> 6) |= 1L << (bit & 63)
              dc += 1
            }
          }
        }
        k += 1
      }
      i += 1
    }
    out
  }

  /** Per-side counts of fixes with ANY possible ε-match on the other
    * side, packed nearA·2³² + nearB — the shared bound kernel of the
    * LCSS/EDR prune tiers:
    *  - LCSS matches are 1-1, so n_match ≤ min(nearA, nearB) (a matched
    *    fix is by definition within ε of a counterpart, hence inside the
    *    other side's dilation bitmap — the findMatches superset
    *    argument);
    *  - an EDR alignment must edit every fix that can never match, so
    *    n_edits ≥ max(|nA−nB|, nA−nearA, nB−nearB).
    * Both bounds are EXACT (never wrong-side), so threshold pruning on
    * them preserves the true top-10 — same proof shape as the endpoint
    * and Hausdorff-cell bounds. Cost: ONE bitmap word test per fix. */
  def nearCounts(pa: ArrayData, dilB: ArrayData, pb: ArrayData, dilA: ArrayData): Long =
    (nearCount(pa, dilB).toLong << 32) | nearCount(pb, dilA).toLong

  /** min(nearA, nearB) — the LCSS match upper bound as ONE call (join
    * conditions get no common-subexpression elimination, so the packed
    * form would run the kernel twice per pair). */
  def lcssUb(pa: ArrayData, dilB: ArrayData, pb: ArrayData, dilA: ArrayData): Int =
    math.min(nearCount(pa, dilB), nearCount(pb, dilA))

  private def nearCount(p: ArrayData, dil: ArrayData): Int = {
    val np = p.numElements()
    var cnt = 0
    var i = 0
    while (i < np) {
      val c = (p.getLong(i) >>> 32).toInt
      val bit = (c >>> 8) * NLon + (c & 0xff)
      if ((dil.getLong(bit >>> 6) & (1L << (bit & 63))) != 0L) cnt += 1
      i += 1
    }
    cnt
  }
}

/** lcss_sparse(pbA, trackA, pbB, trackB) with the per-key eps baked by the
  * caller via [[TrajSketchFns]] (the eps is a key-level constant, so it
  * rides the registered closure instead of a fifth child). */
case class LcssSparseExpr(first: Expression, second: Expression,
                          third: Expression, fourth: Expression, epsKm: Double)
  extends QuaternaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(DoubleType),
    ArrayType(LongType), ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def nullSafeEval(fa: Any, a: Any, fb: Any, b: Any): Any =
    TrajSketch.lcssSparse(fa.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData],
      fb.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], epsKm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fa, a, fb, b) =>
      s"${ev.value} = graft.functions.TrajSketch.lcssSparse($fa, $a, $fb, $b, $epsKm);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)

  override def prettyName: String = "lcss_sparse"
}

case class EdrSparseExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression, epsKm: Double)
  extends QuaternaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(DoubleType),
    ArrayType(LongType), ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def nullSafeEval(fa: Any, a: Any, fb: Any, b: Any): Any =
    TrajSketch.edrSparse(fa.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData],
      fb.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], epsKm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fa, a, fb, b) =>
      s"${ev.value} = graft.functions.TrajSketch.edrSparse($fa, $a, $fb, $b, $epsKm);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)

  override def prettyName: String = "edr_sparse"
}

case class HausLbKmExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(fa: Any, fb: Any): Any =
    TrajSketch.hausLbKm(fa.asInstanceOf[ArrayData], fb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fa, fb) =>
      s"${ev.value} = graft.functions.TrajSketch.hausLbKm($fa, $fb);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "haus_lb_km"
}

case class HausLbExceedsExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType), DoubleType)

  override def dataType: DataType = BooleanType

  override def nullSafeEval(fa: Any, fb: Any, thr: Any): Any =
    TrajSketch.hausLbExceeds(fa.asInstanceOf[ArrayData], fb.asInstanceOf[ArrayData],
      thr.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fa, fb, thr) =>
      s"${ev.value} = graft.functions.TrajSketch.hausLbExceeds($fa, $fb, $thr);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "haus_lb_exceeds"
}

case class NearCountsExpr(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
  extends QuaternaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType),
    ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(pa: Any, db: Any, pb: Any, da: Any): Any =
    TrajSketch.nearCounts(pa.asInstanceOf[ArrayData], db.asInstanceOf[ArrayData],
      pb.asInstanceOf[ArrayData], da.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pa, db, pb, da) =>
      s"${ev.value} = graft.functions.TrajSketch.nearCounts($pa, $db, $pb, $da);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)

  override def prettyName: String = "traj_near_counts"
}

case class LcssUbExpr(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
  extends QuaternaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType),
    ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(pa: Any, db: Any, pb: Any, da: Any): Any =
    TrajSketch.lcssUb(pa.asInstanceOf[ArrayData], db.asInstanceOf[ArrayData],
      pb.asInstanceOf[ArrayData], da.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pa, db, pb, da) =>
      s"${ev.value} = graft.functions.TrajSketch.lcssUb($pa, $db, $pb, $da);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "lcss_ub"
}

/** dilate_cells(cells) → the ε-dilation bitmap (array of DilWords longs),
  * computed once per user in tracks() — the pair-time near test is then a
  * single bit lookup. */
case class DilateCellsExpr(child: Expression, epsKm: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(ca: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TrajSketch.dilatedBitmap(ca.asInstanceOf[ArrayData], epsKm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ca =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TrajSketch.dilatedBitmap($ca, $epsKm));")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "dilate_cells"
}

case class CellOverlapExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(fa: Any, fb: Any): Any =
    TrajSketch.cellOverlap(fa.asInstanceOf[ArrayData], fb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fa, fb) =>
      s"${ev.value} = graft.functions.TrajSketch.cellOverlap($fa, $fb);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "cell_overlap"
}

object TrajSketchFns {
  /** eps-binding registration: the sparse names carry their key's eps
    * constant (the function registry passes only column expressions). */
  def register(spark: SparkSession, epsKm: Double): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("lcss_sparse",
      exprs => LcssSparseExpr(exprs(0), exprs(1), exprs(2), exprs(3), epsKm), "scala_udf")
    reg.createOrReplaceTempFunction("edr_sparse",
      exprs => EdrSparseExpr(exprs(0), exprs(1), exprs(2), exprs(3), epsKm), "scala_udf")
    reg.createOrReplaceTempFunction("haus_lb_km",
      exprs => HausLbKmExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("haus_lb_exceeds",
      exprs => HausLbExceedsExpr(exprs(0), exprs(1), exprs(2)), "scala_udf")
    reg.createOrReplaceTempFunction("cell_overlap",
      exprs => CellOverlapExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("traj_near_counts",
      exprs => NearCountsExpr(exprs(0), exprs(1), exprs(2), exprs(3)), "scala_udf")
    reg.createOrReplaceTempFunction("dilate_cells",
      exprs => DilateCellsExpr(exprs(0), epsKm), "scala_udf")
    reg.createOrReplaceTempFunction("lcss_ub",
      exprs => LcssUbExpr(exprs(0), exprs(1), exprs(2), exprs(3)), "scala_udf")
  }

  def lcssSparse(pa: Column, a: Column, pb: Column, b: Column): Column =
    call_function("lcss_sparse", pa, a, pb, b)

  def edrSparse(pa: Column, a: Column, pb: Column, b: Column): Column =
    call_function("edr_sparse", pa, a, pb, b)

  def hausLbKm(ca: Column, cb: Column): Column = call_function("haus_lb_km", ca, cb)

  def hausLbExceeds(ca: Column, cb: Column, thrKm: Column): Column =
    call_function("haus_lb_exceeds", ca, cb, thrKm)

  def cellOverlap(ca: Column, cb: Column): Column =
    call_function("cell_overlap", ca, cb)

  def nearCounts(pa: Column, dilB: Column, pb: Column, dilA: Column): Column =
    call_function("traj_near_counts", pa, dilB, pb, dilA)

  def dilateCells(cells: Column): Column = call_function("dilate_cells", cells)

  def lcssUb(pa: Column, dilB: Column, pb: Column, dilA: Column): Column =
    call_function("lcss_ub", pa, dilB, pb, dilA)
}
