package graft

import org.apache.spark.sql.functions._
import graft.functions.{FrechetDist, HaversineDist, LcssMatches}
import org.apache.spark.sql.catalyst.util.ArrayData

/** SURVEY §2.10 — track-level trajectory similarity (m_traj_frechet,
  * m_traj_lcss): kernel axioms + equality vs an independent recursive-memo
  * reference computed in PLAIN HAVERSINE km (proving the kernels' chord²
  * monotone-transform rewrite exact up to libm ulps), planted-corridor
  * geometry, and key-level equality against an exact all-pairs driver
  * recomputation at fixture scale. */
class TrajectorySpec extends BaseSpec {
  import spark.implicits._

  private def arr(xs: Array[Double]): ArrayData = ArrayData.toArrayData(xs)

  /** Interleaved lat/lon track. */
  private def trk(pts: (Double, Double)*): Array[Double] =
    pts.flatMap(p => Seq(p._1, p._2)).toArray

  /** lat/lon interleaved → unit-vector interleaved (the kernels' input
    * layout; same Math.cos/sin the codegen'd SQL transform compiles to). */
  private def xyz(ll: Array[Double]): Array[Double] =
    ll.grouped(2).flatMap { case Array(lat, lon) =>
      val (la, lo) = (math.toRadians(lat), math.toRadians(lon))
      Seq(math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
    }.toArray

  /** Independent reference: textbook recursive-memo discrete Fréchet
    * (Eiter & Mannila 1994) DIRECTLY in haversine km — different recursion
    * shape AND different distance path than the rolling-row chord² kernel. */
  private def refFrechet(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length / 2; val m = b.length / 2
    val memo = Array.fill(n, m)(-1.0)
    def d(i: Int, j: Int) =
      HaversineDist.km(a(2 * i), a(2 * i + 1), b(2 * j), b(2 * j + 1))
    def c(i: Int, j: Int): Double = {
      if (memo(i)(j) >= 0) return memo(i)(j)
      val v =
        if (i == 0 && j == 0) d(0, 0)
        else if (i == 0) math.max(c(0, j - 1), d(0, j))
        else if (j == 0) math.max(c(i - 1, 0), d(i, 0))
        else math.max(d(i, j),
          math.min(c(i - 1, j), math.min(c(i - 1, j - 1), c(i, j - 1))))
      memo(i)(j) = v; v
    }
    c(n - 1, m - 1)
  }

  /** Independent reference: full-matrix LCSS in haversine km. */
  private def refLcss(a: Array[Double], b: Array[Double], eps: Double): Long = {
    val n = a.length / 2; val m = b.length / 2
    val t = Array.ofDim[Long](n + 1, m + 1)
    for (i <- 1 to n; j <- 1 to m) {
      val d = HaversineDist.km(a(2 * (i - 1)), a(2 * (i - 1) + 1),
        b(2 * (j - 1)), b(2 * (j - 1) + 1))
      t(i)(j) = if (d <= eps) t(i - 1)(j - 1) + 1
                else math.max(t(i - 1)(j), t(i)(j - 1))
    }
    t(n)(m)
  }

  private def frechet(a: Array[Double], b: Array[Double]): Double =
    FrechetDist.compute(arr(xyz(a)), arr(xyz(b)))

  private def hausdorff(a: Array[Double], b: Array[Double]): Double =
    graft.functions.HausdorffKm.compute(arr(xyz(a)), arr(xyz(b)))

  /** Independent reference: brute-force symmetric Hausdorff directly in
    * haversine km (no cutoff, no chord² rewrite). */
  private def refHausdorff(a: Array[Double], b: Array[Double]): Double = {
    def directed(p: Array[Double], q: Array[Double]): Double =
      (0 until p.length / 2).map { i =>
        (0 until q.length / 2).map { j =>
          HaversineDist.km(p(2 * i), p(2 * i + 1), q(2 * j), q(2 * j + 1))
        }.min
      }.max
    math.max(directed(a, b), directed(b, a))
  }

  private def lcss(a: Array[Double], b: Array[Double], eps: Double): Long =
    LcssMatches.compute(arr(xyz(a)), arr(xyz(b)), eps)

  private def edr(a: Array[Double], b: Array[Double], eps: Double): Long =
    graft.functions.EdrDist.compute(arr(xyz(a)), arr(xyz(b)), eps)

  /** Independent reference: full-matrix EDR in haversine km (Chen et al.
    * SIGMOD 2005, Def. 5 — unit-cost edits, ε-match). */
  private def refEdr(a: Array[Double], b: Array[Double], eps: Double): Long = {
    val n = a.length / 2; val m = b.length / 2
    val t = Array.ofDim[Long](n + 1, m + 1)
    for (i <- 0 to n) t(i)(0) = i
    for (j <- 0 to m) t(0)(j) = j
    for (i <- 1 to n; j <- 1 to m) {
      val d = HaversineDist.km(a(2 * (i - 1)), a(2 * (i - 1) + 1),
        b(2 * (j - 1)), b(2 * (j - 1) + 1))
      t(i)(j) = if (d <= eps) t(i - 1)(j - 1)
                else 1 + math.min(t(i - 1)(j - 1), math.min(t(i - 1)(j), t(i)(j - 1)))
    }
    t(n)(m)
  }

  test("frechet kernel: axioms + equality with independent haversine recursive reference") {
    val rnd = new scala.util.Random(421)
    def randTrack(len: Int): Array[Double] =
      trk(Seq.fill(len)((rnd.nextDouble() * 160 - 80, rnd.nextDouble() * 340 - 170)): _*)
    for (_ <- 1 to 40) {
      val a = randTrack(1 + rnd.nextInt(12))
      val b = randTrack(1 + rnd.nextInt(12))
      val f = frechet(a, b)
      val ref = refFrechet(a, b)
      // chord²-DP + one asin vs per-cell haversine: same math, different FP
      // path — equal to libm ulps (≪ the round(4) every consumer applies)
      assert(math.abs(f - ref) < 1e-6, s"chord² DP $f != haversine reference $ref")
      assert(frechet(b, a) == f, "not symmetric")
      assert(frechet(a, a) == 0.0, "identity not 0")
      // endpoint lower bound: both leashes start and end attached
      val ep = math.max(
        HaversineDist.km(a(0), a(1), b(0), b(1)),
        HaversineDist.km(a(a.length - 2), a(a.length - 1),
          b(b.length - 2), b(b.length - 1)))
      // this endpoint bound IS m_traj_frechet's prune tier (the key drops
      // pairs whose endpoint lb exceeds a proven ≥ d₁₀ threshold) — the
      // axiom here is what makes the pruned top-10 exact
      assert(f >= ep - 1e-6, s"frechet $f below endpoint bound $ep")
      // LCSS reference equality on the same pair (integer counts — a flip
      // needs a distance within ulps of the 800 km threshold)
      assert(lcss(a, b, 800.0) == refLcss(a, b, 800.0), "lcss != reference")
      assert(lcss(a, b, 800.0) == lcss(b, a, 800.0), "lcss not symmetric")
      // EDR reference equality + axioms on the same pair
      assert(edr(a, b, 800.0) == refEdr(a, b, 800.0), "edr != reference")
      assert(edr(a, b, 800.0) == edr(b, a, 800.0), "edr not symmetric")
      assert(edr(a, a, 800.0) == 0L, "edr identity not 0")
      // length-difference lower bound, longer-length upper bound
      val (la, lb) = (a.length / 2, b.length / 2)
      assert(edr(a, b, 800.0) >= math.abs(la - lb) &&
             edr(a, b, 800.0) <= math.max(la, lb), "edr out of bounds")
      // Hausdorff: reference equality (pins both the chord² rewrite and the
      // best-so-far cutoff output-invisible), symmetry/identity, and the
      // dominance axiom — the Fréchet leash admits only forward moves, so
      // the unconstrained nearest-fix max can never exceed it
      val h = hausdorff(a, b)
      assert(math.abs(h - refHausdorff(a, b)) < 1e-6,
        s"hausdorff $h != brute-force reference ${refHausdorff(a, b)}")
      assert(hausdorff(b, a) == h, "hausdorff not symmetric")
      assert(hausdorff(a, a) == 0.0, "hausdorff identity not 0")
      assert(h <= f + 1e-6, s"hausdorff $h above frechet $f")
    }
  }

  test("EDR: one wild fix costs exactly one edit; detours penalized where LCSS forgives") {
    val base = trk((0 until 20).map(i => (0.0, i.toDouble)): _*)
    val spiked = trk((0 until 20).map(i =>
      if (i == 10) (60.0, 120.0) else (0.0, i.toDouble)): _*)
    assert(edr(base, spiked, 60.0) == 1L, "one wild fix must cost one edit")
    // detour: second track shares the corridor but inserts 10 far fixes —
    // LCSS (normalized by the SHORTER track) reads them near-identical,
    // EDR charges every detour fix. The gap-awareness that motivates
    // carrying all three DPs.
    val detour = trk(((0 until 10).map(i => (0.0, i.toDouble)) ++
      (0 until 10).map(i => (50.0, 60.0 + i)) ++
      (10 until 20).map(i => (0.0, i.toDouble))): _*)
    val lcssSim = lcss(base, detour, 60.0).toDouble / 20 // shorter = 20
    assert(lcssSim == 1.0, s"LCSS must forgive the detour (got $lcssSim)")
    assert(edr(base, detour, 60.0) == 10L,
      s"EDR must charge all 10 detour fixes (got ${edr(base, detour, 60.0)})")
  }

  test("planted corridors: parallel offset reads ~offset; reversal reads far; LCSS outlier-robust") {
    // corridor along the equator, one-degree steps; lat offset 0.5° ≈ 55.6 km
    val base = trk((0 until 20).map(i => (0.0, i.toDouble)): _*)
    val shifted = trk((0 until 20).map(i => (0.5, i.toDouble)): _*)
    val offKm = HaversineDist.km(0.0, 0.0, 0.5, 0.0)
    assert(math.abs(frechet(base, shifted) - offKm) < 0.5,
      s"parallel corridor: ${frechet(base, shifted)} vs offset $offKm")
    // reversed corridor: same cells, opposite order — Fréchet sees it, the
    // cell-Jaccard key cannot (the whole point of the track-level measure);
    // the leash must span the full corridor length (~2100 km) at the turn
    val reversed = trk((0 until 20).map(i => (0.0, (19 - i).toDouble)): _*)
    assert(frechet(base, reversed) > 10 * offKm,
      s"reversal should read far: ${frechet(base, reversed)}")
    // one wild fix: Fréchet jumps to ~the outlier distance; LCSS loses ≤ 1
    val spiked = trk((0 until 20).map(i =>
      if (i == 10) (60.0, 120.0) else (0.0, i.toDouble)): _*)
    assert(frechet(base, spiked) > 5000.0, "outlier must cap frechet from below")
    assert(lcss(base, spiked, 60.0) >= 19, "LCSS must lose at most one match")
    assert(lcss(base, base, 60.0) == 20)
    // the diagnostic pair: a REVERSED corridor is the same point set, so
    // Hausdorff reads 0 where Fréchet spans the corridor — "same route,
    // which direction?" needs both measures side by side
    assert(hausdorff(base, reversed) == 0.0,
      s"reversed corridor must be Hausdorff-0: ${hausdorff(base, reversed)}")
    assert(frechet(base, reversed) > 2000.0)
  }

  /** lat/lon interleaved → per-fix 2.5° cell ids (the tracks() fc column's
    * derivation, driver-side). */
  private def fcArr(ll: Array[Double]): Array[Int] =
    ll.grouped(2).map { case Array(lat, lon) =>
      graft.functions.TrajSketch.cellId(lat, lon)
    }.toArray

  test("sparse LCSS/EDR kernels == full-matrix DPs on random, dense, polar and corridor tracks") {
    import graft.functions.TrajSketch
    val rnd = new scala.util.Random(1517)
    def randTrack(len: Int, latRange: Double = 160, latOff: Double = -80): Array[Double] =
      trk(Seq.fill(len)((rnd.nextDouble() * latRange + latOff,
        rnd.nextDouble() * 340 - 170)): _*)
    // the tracks() sketch columns, driver-side: packed (cell<<32|idx)
    // ascending and distinct sorted cells
    def pbArr(fc: Array[Int]): ArrayData = ArrayData.toArrayData(
      fc.zipWithIndex.map { case (c, i) => (c.toLong << 32) | i.toLong }.sorted)
    def cellsArr(fc: Array[Int]): ArrayData = ArrayData.toArrayData(fc.distinct.sorted)
    def check(a: Array[Double], b: Array[Double], eps: Double): Unit = {
      val (fca, fcb) = (fcArr(a), fcArr(b))
      val (pa, pb) = (pbArr(fca), pbArr(fcb))
      val (xa, xb) = (arr(xyz(a)), arr(xyz(b)))
      assert(TrajSketch.lcssSparse(pa, xa, pb, xb, eps) ==
        LcssMatches.compute(xa, xb, eps), s"lcss sparse != DP (eps=$eps)")
      assert(TrajSketch.edrSparse(pa, xa, pb, xb, eps) ==
        graft.functions.EdrDist.compute(xa, xb, eps), s"edr sparse != DP (eps=$eps)")
      // capped Fréchet: exact at/above the true value, MaxValue below it
      val f = FrechetDist.compute(xa, xb)
      assert(FrechetDist.computeCapped(xa, xb, f + 1.0) == f,
        "capped kernel must be exact when dF <= cap")
      if (f > 1.0)
        assert(FrechetDist.computeCapped(xa, xb, f - 1.0) == Double.MaxValue,
          "capped kernel must poison when dF > cap")
      // the Hausdorff cell bound must never exceed the true distance, and
      // the threshold form must agree with the bound on BOTH sides of it
      val hl = TrajSketch.hausLbKm(cellsArr(fca), cellsArr(fcb))
      val h = graft.functions.HausdorffKm.compute(xa, xb)
      assert(hl <= h + 1e-6, s"hausLb $hl above true hausdorff $h")
      assert(!TrajSketch.hausLbExceeds(cellsArr(fca), cellsArr(fcb), hl + 1e-9),
        "exceeds(thr just above lb) must be false")
      if (hl > 1e-9)
        assert(TrajSketch.hausLbExceeds(cellsArr(fca), cellsArr(fcb), hl - 1e-9),
          "exceeds(thr just below lb) must be true")
    }
    for (_ <- 1 to 60) {
      val a = randTrack(1 + rnd.nextInt(20))
      val b = randTrack(1 + rnd.nextInt(20))
      check(a, b, 500.0)
      check(a, b, 150.0)
      check(a, b, 2000.0)
    }
    // dense-match regime (identical-corridor pairs): every cell pair is an
    // ε-match, exercising the EDR O(P²)-vs-DP fallback and the LIS at
    // full density
    val base = trk((0 until 30).map(i => (0.0, i * 0.2)): _*)
    val near = trk((0 until 30).map(i => (0.05, i * 0.2 + 0.03)): _*)
    check(base, near, 500.0)
    check(base, base, 500.0)
    // polar tracks: the lon dilation radius blows up toward the poles —
    // the per-row dcMax table must stay a superset of true ε-matches
    for (_ <- 1 to 20) {
      val a = randTrack(1 + rnd.nextInt(12), latRange = 9.0, latOff = 75.0)
      val b = randTrack(1 + rnd.nextInt(12), latRange = 9.0, latOff = 75.0)
      check(a, b, 500.0)
    }
    // cross-antimeridian: circular column windows must wrap, not clip
    val west = trk((0 until 10).map(i => (10.0, 179.0 + i * 0.2 - (if (179.0 + i * 0.2 >= 180) 360 else 0))): _*)
    val east = trk((0 until 10).map(i => (10.1, -179.9 + i * 0.2)): _*)
    check(west, east, 500.0)
  }

  test("forced prune branches == direct all-pairs top-10 at fixture scale (hausdorff/lcss/edr)") {
    val tr = queries.Trajectory.tracks(spark, sf)
    val directH = SparkEntry.queries("m_traj_hausdorff")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val prunedHDs = queries.Trajectory.hausdorffPruned(spark, tr)
      .as[(Long, Long, Long, Long, Double)]
    val prunedH = prunedHDs.collect().toSeq
    assert(prunedH == directH, s"pruned hausdorff top-10:\n got=$prunedH\nwant=$directH")
    // the survivors count is an observe() metric on the EXECUTED dataset
    // (each as[]/select creates its own queryExecution — read the one
    // that ran)
    val survH = prunedHDs.queryExecution.observedMetrics.get("prune")
      .map(_.getLong(0))
    assert(survH.exists(v => v > 0 && v <= 105), s"observe survivors $survH")
    val directL = SparkEntry.queries("m_traj_lcss")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val prunedL = queries.Trajectory.lcssPruned(spark, tr)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(prunedL == directL, s"pruned lcss top-10:\n got=$prunedL\nwant=$directL")
    // EDR's round-16 tier: the free length-difference bound (the r15
    // negative result stands for the EXPENSIVE match-UB bound only). On
    // this uniform fixture the bound prunes nothing — the equality below
    // pins the no-op case is still exact; the skew case is probed in
    // PREFLIGHT_r16.
    val directE = SparkEntry.queries("m_traj_edr")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val prunedE = queries.Trajectory.edrPruned(spark, tr)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(prunedE == directE, s"pruned edr top-10:\n got=$prunedE\nwant=$directE")
    // the telemetry the ×10 probe logs must be recorded by every tier
    for (k <- Seq("m_traj_hausdorff", "m_traj_lcss", "m_traj_edr")) {
      val (cand, _) = queries.Trajectory.lastPrune(k)
      assert(cand > 0, s"$k prune telemetry pairs=$cand")
    }
  }

  test("m_traj_frechet / m_traj_lcss: keys match exact all-pairs driver DP at fixture scale") {
    // rebuild the downsampled tracks independently: same derivation SQL,
    // driver-side stride arithmetic and unit-vector conversion
    val cap = 64
    val fixes = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("lat", (col("event_id") * 37L % 1700L) / 10.0 - 85.0)
      .withColumn("lon", (col("event_id") * 131L % 3600L) / 10.0 - 180.0)
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .select($"user_id", $"ts_us", $"event_id", $"lat", $"lon")
      .as[(Long, Long, Long, Double, Double)].collect()
    val tracks = fixes.groupBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val stride = math.max(1, (ordered.length + cap - 1) / cap)
      val kept = ordered.zipWithIndex.collect { case (r, i) if i % stride == 0 => (r._4, r._5) }
      (u, (ordered.length.toLong, xyz(trk(kept.toIndexedSeq: _*))))
    }
    val users = tracks.keys.toSeq.sorted
    val allPairs = for {
      i <- users.indices; j <- (i + 1) until users.size
    } yield {
      val (u1, u2) = (users(i), users(j))
      val (ta, tb) = (arr(tracks(u1)._2), arr(tracks(u2)._2))
      (u1, u2, math.rint(FrechetDist.compute(ta, tb) * 10000) / 10000,
        LcssMatches.compute(ta, tb, 500.0),
        graft.functions.EdrDist.compute(ta, tb, 500.0),
        math.rint(graft.functions.HausdorffKm.compute(ta, tb) * 10000) / 10000)
    }

    val wantF = allPairs.sortBy(p => (p._3, p._1, p._2)).take(10)
      .map(p => (p._1, p._2, tracks(p._1)._1, tracks(p._2)._1, p._3))
    val gotF = SparkEntry.queries("m_traj_frechet")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotF == wantF, s"frechet top-10:\n got=$gotF\nwant=$wantF")
    // the large-U prune branch, forced on the same fixture: the
    // endpoint-lb threshold prune must be output-invisible
    val gotFP = queries.Trajectory
      .frechetPruned(spark, queries.Trajectory.tracks(spark, sf))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotFP == wantF, s"pruned frechet top-10:\n got=$gotFP\nwant=$wantF")

    val wantL = allPairs.map { p =>
      val nMin = math.min(math.min(tracks(p._1)._1, tracks(p._2)._1), cap.toLong)
      (p._1, p._2, tracks(p._1)._1, tracks(p._2)._1, p._4,
        math.rint(p._4 * 10000.0 / nMin) / 10000)
    }.sortBy(p => (-p._6, p._1, p._2)).take(10)
    val gotL = SparkEntry.queries("m_traj_lcss")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotL == wantL, s"lcss top-10:\n got=$gotL\nwant=$wantL")

    val wantE = allPairs.map { p =>
      val nMax = math.max(tracks(p._1)._2.length, tracks(p._2)._2.length) / 3
      (p._1, p._2, tracks(p._1)._1, tracks(p._2)._1, p._5,
        math.rint(p._5 * 10000.0 / nMax) / 10000)
    }.sortBy(p => (p._6, p._1, p._2)).take(10)
    val gotE = SparkEntry.queries("m_traj_edr")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotE == wantE, s"edr top-10:\n got=$gotE\nwant=$wantE")

    val wantH = allPairs.sortBy(p => (p._6, p._1, p._2)).take(10)
      .map(p => (p._1, p._2, tracks(p._1)._1, tracks(p._2)._1, p._6))
    val gotH = SparkEntry.queries("m_traj_hausdorff")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotH == wantH, s"hausdorff top-10:\n got=$gotH\nwant=$wantH")
  }
}
