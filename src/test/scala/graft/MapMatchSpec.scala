package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{HaversineDist, MapMatchExpr}

/** [[MapMatchExpr]] — HMM/Viterbi lattice map-matching: kernel ≡ an
  * independent brute-force all-paths Viterbi on small instances,
  * noise-free identity, planted-noisy-walk recovery, the gross-outlier
  * case the transition term corrects, and the key's end-to-end recovery
  * at fixture scale. */
class MapMatchSpec extends BaseSpec {
  import spark.implicits._

  // the key's parameters: sigma matches the declared jitter's ~2.9 km
  // per-axis std; beta is SOFT (the lattice road graph is complete, so
  // emission should decide and the route prior only regularize)
  private val Sigma = 3.0
  private val Beta = 30.0

  private def snap(ll: Array[Double], sigma: Double = Sigma,
                   beta: Double = Beta): Array[Int] =
    MapMatchExpr.compute(ArrayData.toArrayData(ll), sigma, beta)
      .toIntArray()

  /** Independent reference: enumerate ALL 9^T candidate paths (T small)
    * and score with the same emission/transition model — a different
    * algorithm (no DP), so agreement pins the Viterbi recursion and its
    * lowest-index tie rule. */
  private def bruteViterbi(ll: Array[Double], sigma: Double = Sigma,
                           beta: Double = Beta): Array[Int] = {
    val t = ll.length / 2
    val cands = Array.tabulate(t) { i =>
      val bLat = math.round(ll(2 * i) * 10.0).toInt
      val bLon = math.round(ll(2 * i + 1) * 10.0).toInt
      Array.tabulate(9) { c =>
        val latd = math.min(900, math.max(-900, bLat + c / 3 - 1))
        val lond = ((bLon + c % 3 - 1 + 1800) % 3600 + 3600) % 3600 - 1800
        (latd, lond)
      }
    }
    def score(path: Seq[Int]): Double = {
      var s = 0.0
      for (i <- 0 until t) {
        val (latd, lond) = cands(i)(path(i))
        val d = HaversineDist.km(ll(2 * i), ll(2 * i + 1), latd / 10.0, lond / 10.0)
        s += -(d * d) / (2.0 * sigma * sigma)
        if (i > 0) {
          val measured = HaversineDist.km(ll(2 * i - 2), ll(2 * i - 1), ll(2 * i), ll(2 * i + 1))
          val (pl, po) = cands(i - 1)(path(i - 1))
          val route = HaversineDist.km(pl / 10.0, po / 10.0, latd / 10.0, lond / 10.0)
          s += -math.abs(measured - route) / beta
        }
      }
      s
    }
    // lexicographically-first argmax == the kernel's lowest-index tie rule
    var best: Seq[Int] = null
    var bestS = Double.NegativeInfinity
    def rec(prefix: List[Int]): Unit =
      if (prefix.length == t) {
        val s = score(prefix.reverse)
        if (s > bestS) { bestS = s; best = prefix.reverse }
      } else (0 until 9).foreach(c => rec(c :: prefix))
    rec(Nil)
    best.zipWithIndex.flatMap { case (c, i) =>
      val (latd, lond) = cands(i)(c); Seq(latd, lond)
    }.toArray
  }

  test("kernel == brute-force all-paths Viterbi on random small instances") {
    val rnd = new scala.util.Random(1523)
    for (_ <- 1 to 15) {
      val t = 2 + rnd.nextInt(3) // 9^4 = 6561 paths max
      // a lattice walk with sub-cell noise
      var latd = rnd.nextInt(1200) - 600
      var lond = rnd.nextInt(3000) - 1500
      val ll = (0 until t).flatMap { _ =>
        latd += rnd.nextInt(5) - 2
        lond += rnd.nextInt(5) - 2
        Seq(latd / 10.0 + (rnd.nextDouble() - 0.5) * 0.09,
          lond / 10.0 + (rnd.nextDouble() - 0.5) * 0.09)
      }.toArray
      assert(snap(ll).toSeq == bruteViterbi(ll).toSeq, s"t=$t mismatch")
      // and at a strict route prior (the outlier-correction regime)
      assert(snap(ll, 3.0, 2.0).toSeq == bruteViterbi(ll, 3.0, 2.0).toSeq,
        s"t=$t mismatch at beta=2")
    }
  }

  test("noise-free lattice walk snaps to itself; sub-half-cell noise recovers it") {
    val rnd = new scala.util.Random(77)
    val walk = {
      var latd = 400; var lond = -900
      (0 until 40).map { _ =>
        latd += rnd.nextInt(3) - 1; lond += rnd.nextInt(3) - 1; (latd, lond)
      }
    }
    val clean = walk.flatMap { case (a, o) => Seq(a / 10.0, o / 10.0) }.toArray
    assert(snap(clean).toSeq == walk.flatMap { case (a, o) => Seq(a, o) },
      "noise-free walk must snap to itself")
    val noisy = walk.flatMap { case (a, o) =>
      Seq(a / 10.0 + (rnd.nextDouble() - 0.5) * 0.09,
        o / 10.0 + (rnd.nextDouble() - 0.5) * 0.09)
    }.toArray
    assert(snap(noisy).toSeq == walk.flatMap { case (a, o) => Seq(a, o) },
      "sub-half-cell noise must recover the planted walk")
  }

  test("outlier past the nearest-node rule: a strict route prior corrects it") {
    // a dense corridor; one fix displaced just past half a cell, so GREEDY
    // nearest-node snapping picks the wrong node. On a COMPLETE lattice
    // every displaced fix has a road node nearby, so correction is a
    // beta tradeoff (declared in the kernel scaladoc): the key's soft
    // beta=30 trusts emission; a strict beta=2 route prior makes the
    // route-length discrepancy (the off-corridor zig-zag inflates every
    // incident hop by ~1.5 km beyond what the displaced MEASURED distance
    // already absorbs) outweigh the displaced node's 0.7-nat emission edge
    val t = 21
    val clean = (0 until t).flatMap(i => Seq(10.0, 20.0 + i * 0.1)).toArray
    val noisy = clean.clone()
    noisy(2 * 10) = 10.0 + 0.055 // just past the half-cell greedy boundary
    val greedyLat = math.round(noisy(2 * 10) * 10.0).toInt
    assert(greedyLat == 101, "setup: greedy nearest node is the wrong one")
    val out = snap(noisy, 3.0, 2.0)
    // the corridor runs along lon at lat 100; the HMM must keep fix 10 on
    // (or adjacent to) the corridor rather than at the displaced node
    assert(out(2 * 10) == 100,
      s"strict route prior must pull the outlier back to the corridor (got ${out(2 * 10)})")
    // and every other fix stays exactly on the corridor
    (0 until t).filterNot(_ == 10).foreach { i =>
      assert(out(2 * i) == 100 && out(2 * i + 1) == 200 + i,
        s"fix $i drifted: (${out(2 * i)}, ${out(2 * i + 1)})")
    }
    // the key's soft beta keeps the displaced node instead — the declared
    // tradeoff, pinned so a parameter change re-opens this decision
    assert(snap(noisy)(2 * 10) == 101, "soft beta should trust emission here")
  }

  test("m_traj_mapmatch: deterministic, one row per user, high recovery under the declared jitter") {
    val got = SparkEntry.queries("m_traj_mapmatch")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val users = Tables(spark, sf, "events").select($"user_id").distinct().count()
    assert(got.size == users, s"${got.size} rows for $users users")
    got.foreach { case (u, nFix, nPts, nRec, rate) =>
      assert(nPts > 0 && nRec >= 0 && nRec <= nPts, s"user $u: $nRec/$nPts")
      assert(rate == math.rint(nRec.toDouble / nPts * 1e4) / 1e4)
      // jitter is under half a cell, fixes are lattice-exact and far
      // apart: the HMM must recover nearly everything (the fixture's
      // inter-fix hops are huge, so the transition term is near-neutral
      // and emission decides — declared in the key scaladoc)
      assert(rate >= 0.9, s"user $u recovered only $rate")
    }
    val again = SparkEntry.queries("m_traj_mapmatch")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(again == got, "jitter must be deterministic")
  }
}
