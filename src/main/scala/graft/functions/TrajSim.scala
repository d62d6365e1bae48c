package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Track-level trajectory similarity kernels (SURVEY §2.10 extension,
  * `m_traj_frechet` / `m_traj_lcss`): discrete Fréchet distance (Eiter &
  * Mannila, TR CD-TR 94/64, 1994) and LCSS match count (Vlachos, Kollios &
  * Gunopulos, ICDE 2002) between two time-ordered tracks — the POINT-WISE
  * comparison the visited-cell Jaccard (`q_traj_sim`) only approximates:
  * two users tracing the same corridor in the same order read near under
  * Fréchet even when their cell sets differ, and far when they visit the
  * same cells in opposite order.
  *
  * Input layout: each track is an interleaved ARRAY<DOUBLE> of UNIT-SPHERE
  * coordinates [x0, y0, z0, x1, y1, z1, ...] (x = cos lat · cos lon,
  * y = cos lat · sin lon, z = sin lat), converted ONCE per track by the
  * caller's codegen'd `transform` — so the O(|a|·|b|) DP inner cell costs
  * 3 multiplies + 5 adds (squared CHORD distance ‖p−q‖²), not 4 trig + asin.
  * Squared chord is a strictly monotone function of great-circle distance
  * (‖p−q‖² = 2 − 2cosθ = 4·sin²(θ/2) — the haversine identity), and both
  * DPs combine distances only through max / min / ≤-threshold, which
  * commute with monotone transforms — so running the DP on chord² and
  * converting ONLY the final value (d_km = 2R·asin(√chord²/2)) yields
  * exactly the great-circle-km Fréchet, at ~30× less CPU per cell. That
  * makes the exact DP cheap enough to run on every signature pair at
  * moderate U; above [[graft.queries.Trajectory]]'s adaptive pair gate
  * the Fréchet key additionally prunes pairs with an EXACT endpoint
  * lower bound before any DP runs — still never a lossy candidate tier.
  *
  * Both kernels are rolling-row DPs like [[graft.operators.Dtw]], but
  * unlike Dtw they run DISTRIBUTED — one evaluation per pair inside
  * whole-stage codegen (`doGenCode` calls the same static kernel as the
  * interpreted path, the [[CosineSim]] discipline). Callers bound the DP
  * by construction: tracks are downsampled to a declared per-user point
  * cap, so per-pair cost is cap² cells regardless of data volume. */
case class FrechetDist(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    FrechetDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FrechetDist.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "frechet_km"
}

/** frechet_km_capped(a, b, capKm): exact discrete Fréchet distance when it
  * is ≤ capKm, Double.MaxValue otherwise — the prune tier's survivor
  * kernel. Poisoning cells whose chord² exceeds the cap leaves every
  * all-cells-≤-cap path untouched (the DP value is a min over paths of a
  * max over cells, so a poisoned cell only kills paths that already
  * exceeded the cap), and an all-poisoned row proves dF > cap and abandons
  * the scan — most endpoint-bound survivors are still far pairs, and they
  * exit within a few rows instead of paying the full cap² matrix. Callers
  * pass cap = thr + margin, so every value that can reach the top-10 is
  * exact and everything returned MaxValue is provably outside it. */
case class FrechetCapped(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType), DoubleType)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any, cap: Any): Any =
    FrechetDist.computeCapped(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      cap.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, cap) =>
      s"${ev.value} = graft.functions.FrechetDist.computeCapped($a, $b, $cap);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "frechet_km_capped"
}

object FrechetDist {

  private[functions] def checkTrack(xs: Array[Double], ys: Array[Double],
                                    name: String): Unit =
    // Fail loudly on malformed tracks — a dropped coordinate would silently
    // shift every subsequent value's axis role.
    if (xs.length < 3 || ys.length < 3 || xs.length % 3 != 0 || ys.length % 3 != 0)
      throw new IllegalArgumentException(
        s"$name: tracks must be non-empty interleaved [x, y, z, ...] " +
          s"unit-vector arrays (got lengths ${xs.length}, ${ys.length})")

  /** Squared chord distance between points i of xs and j of ys. */
  @inline private[functions] def chordSq(xs: Array[Double], i: Int,
                                         ys: Array[Double], j: Int): Double = {
    val dx = xs(3 * i) - ys(3 * j)
    val dy = xs(3 * i + 1) - ys(3 * j + 1)
    val dz = xs(3 * i + 2) - ys(3 * j + 2)
    dx * dx + dy * dy + dz * dz
  }

  /** chord² → great-circle km (the exact inverse of the haversine identity;
    * min-clamp absorbs FP chord² a hair above 4 for antipodal points). */
  @inline private[functions] def chordSqToKm(c2: Double): Double =
    2.0 * HaversineDist.EarthRadiusKm * math.asin(math.min(math.sqrt(c2) / 2.0, 1.0))

  /** Discrete Fréchet distance in km over interleaved unit-vector arrays.
    * ca(i,j) = max(d(i,j), min(ca(i-1,j), ca(i-1,j-1), ca(i,j-1))) — the
    * shortest leash admitting only forward moves; rolling two rows like
    * [[graft.operators.Dtw.dist]], on chord² with one final asin (see the
    * monotonicity argument in the file scaladoc). One implementation for
    * both eval paths. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    checkTrack(xs, ys, "frechet_km")
    val n = xs.length / 3
    val m = ys.length / 3
    var prev = new Array[Double](m)
    var cur = new Array[Double](m)
    prev(0) = chordSq(xs, 0, ys, 0)
    var j = 1
    while (j < m) { prev(j) = math.max(prev(j - 1), chordSq(xs, 0, ys, j)); j += 1 }
    var i = 1
    while (i < n) {
      cur(0) = math.max(prev(0), chordSq(xs, i, ys, 0))
      j = 1
      while (j < m) {
        cur(j) = math.max(chordSq(xs, i, ys, j),
          math.min(prev(j), math.min(cur(j - 1), prev(j - 1))))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    chordSqToKm(prev(m - 1))
  }

  /** [[FrechetCapped]]'s kernel — exact dF when ≤ capKm, else MaxValue. */
  def computeCapped(a: ArrayData, b: ArrayData, capKm: Double): Double = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    checkTrack(xs, ys, "frechet_km_capped")
    val n = xs.length / 3
    val m = ys.length / 3
    // km → chord² cap (monotone — the LcssMatches identity); clamp the
    // angle so caps past antipodal never wrap the sine
    val sC = 2.0 * math.sin(math.min(capKm / (2.0 * HaversineDist.EarthRadiusKm), math.Pi / 2))
    val capC2 = sC * sC
    val Inf = Double.MaxValue
    var prev = new Array[Double](m)
    var cur = new Array[Double](m)
    var alive = false
    val d00 = chordSq(xs, 0, ys, 0)
    prev(0) = if (d00 <= capC2) d00 else Inf
    alive = prev(0) < Inf
    var j = 1
    while (j < m) {
      val d = chordSq(xs, 0, ys, j)
      prev(j) = if (d <= capC2 && prev(j - 1) < Inf) math.max(prev(j - 1), d) else Inf
      if (prev(j) < Inf) alive = true
      j += 1
    }
    if (!alive) return Inf
    var i = 1
    while (i < n) {
      alive = false
      val d0 = chordSq(xs, i, ys, 0)
      cur(0) = if (d0 <= capC2 && prev(0) < Inf) math.max(prev(0), d0) else Inf
      if (cur(0) < Inf) alive = true
      j = 1
      while (j < m) {
        val d = chordSq(xs, i, ys, j)
        cur(j) =
          if (d > capC2) Inf
          else {
            val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
            if (best == Inf) Inf else math.max(d, best)
          }
        if (cur(j) < Inf) alive = true
        j += 1
      }
      if (!alive) return Inf // no sub-cap path can reach row i's frontier
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m - 1) == Inf) Inf else chordSqToKm(prev(m - 1))
  }
}

/** LCSS match count between two interleaved unit-vector tracks: the length
  * of the longest common subsequence under "points match when within
  * `epsKm` great-circle km" (Vlachos et al., ICDE 2002, with the time-
  * window constraint δ = ∞ by declaration — the downsampled tracks already
  * align index to time rank). The km threshold converts ONCE to a chord²
  * threshold (monotonicity, file scaladoc), so the inner cell is pure
  * arithmetic. Returns the raw match COUNT; callers normalize by
  * min(|a|, |b|) so the similarity is in [0, 1]. Robust to outliers where
  * Fréchet is not: one wild GPS fix caps Fréchet from below but costs LCSS
  * a single match. */
case class LcssMatches(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType), DoubleType)

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, eps: Any): Any =
    LcssMatches.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      eps.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, eps) =>
      s"${ev.value} = graft.functions.LcssMatches.compute($a, $b, $eps);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "lcss_matches"
}

object LcssMatches {

  /** lcss(i,j) = 1 + lcss(i-1,j-1) if d(i,j) ≤ eps else
    * max(lcss(i-1,j), lcss(i,j-1)) — rolling two rows. */
  def compute(a: ArrayData, b: ArrayData, epsKm: Double): Long = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    FrechetDist.checkTrack(xs, ys, "lcss_matches")
    val n = xs.length / 3
    val m = ys.length / 3
    // km → chord² threshold, once per call: chord = 2·sin(d / 2R)
    val s = 2.0 * math.sin(epsKm / (2.0 * HaversineDist.EarthRadiusKm))
    val epsC2 = s * s
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        cur(j) =
          if (FrechetDist.chordSq(xs, i - 1, ys, j - 1) <= epsC2) prev(j - 1) + 1L
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      // the new cur row is overwritten fully next pass; cur(0) stays 0
      i += 1
    }
    prev(m)
  }
}

/** EDR — Edit Distance on Real sequence (Chen, Özsu & Oria, SIGMOD 2005) —
  * between two interleaved unit-vector tracks: the minimum number of
  * insert/delete/substitute edits (unit cost each) turning one track into
  * the other, where two fixes "match" (cost 0) when within `epsKm`
  * great-circle km. The third member of the canonical trajectory-DP
  * family: like LCSS it is outlier-robust (one wild fix costs one edit),
  * but unlike LCSS it PENALIZES unmatched gaps — two tracks sharing a
  * corridor but one carrying a long detour read similar under LCSS
  * (matches normalized by the shorter track) and far under EDR (every
  * detour fix is an edit). Same chord²-threshold rewrite as
  * [[LcssMatches]] (file scaladoc); callers normalize by max(|a|, |b|). */
case class EdrDist(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType), DoubleType)

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, eps: Any): Any =
    EdrDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      eps.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, eps) =>
      s"${ev.value} = graft.functions.EdrDist.compute($a, $b, $eps);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "edr_dist"
}

object EdrDist {

  /** edr(i,j) = edr(i-1,j-1) on a match, else 1 + min(sub, del, ins);
    * borders edr(i,0) = i, edr(0,j) = j — rolling two rows. */
  def compute(a: ArrayData, b: ArrayData, epsKm: Double): Long = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    FrechetDist.checkTrack(xs, ys, "edr_dist")
    val n = xs.length / 3
    val m = ys.length / 3
    val s = 2.0 * math.sin(epsKm / (2.0 * HaversineDist.EarthRadiusKm))
    val epsC2 = s * s
    var prev = Array.tabulate[Long](m + 1)(_.toLong) // edr(0, j) = j
    var cur = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i.toLong // edr(i, 0) = i
      var j = 1
      while (j <= m) {
        cur(j) =
          if (FrechetDist.chordSq(xs, i - 1, ys, j - 1) <= epsC2) prev(j - 1)
          else 1L + math.min(prev(j - 1), math.min(prev(j), cur(j - 1)))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

/** Symmetric Hausdorff distance in km between two interleaved unit-vector
  * tracks: max(h(A→B), h(B→A)) with h(A→B) = max over a∈A of min over b∈B
  * of d(a, b) — the SET-BASED, order-FREE member of the trajectory distance
  * family (Huttenlocher, Klanderman & Rucklidge, TPAMI 1993). Completes the
  * quartet: Fréchet is the order-aware leash, LCSS/EDR are the edit twins,
  * Hausdorff asks only "does every fix of one track have a nearby fix on
  * the other" — so a corridor traced in REVERSE reads 0 under Hausdorff
  * and far under Fréchet, the diagnostic pair for "same route, which
  * direction?". Same chord² rewrite as [[FrechetDist]]: max and min both
  * commute with the monotone chord²→km map, so the O(n·m) scan runs on
  * pure arithmetic and only the final value pays an asin. The inner loop
  * early-exits when the running min drops below the best-so-far outer max
  * (the classic Hausdorff cutoff — sub-O(n·m) on similar tracks). */
case class HausdorffKm(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    HausdorffKm.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HausdorffKm.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "hausdorff_km"
}

object HausdorffKm {

  /** Directed Hausdorff on chord²: max over xs-points of (min over
    * ys-points), with the best-so-far cutoff — once a ys-point is closer
    * than the current outer max, this xs-point cannot raise it. */
  private def directedC2(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length / 3
    val m = ys.length / 3
    var best = 0.0
    var i = 0
    while (i < n) {
      var minD = Double.MaxValue
      var j = 0
      while (j < m && minD > best) {
        val d = FrechetDist.chordSq(xs, i, ys, j)
        if (d < minD) minD = d
        j += 1
      }
      if (minD > best) best = minD
      i += 1
    }
    best
  }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    FrechetDist.checkTrack(xs, ys, "hausdorff_km")
    FrechetDist.chordSqToKm(math.max(directedC2(xs, ys), directedC2(ys, xs)))
  }
}

object TrajSim {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "frechet_km", exprs => FrechetDist(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "lcss_matches", exprs => LcssMatches(exprs(0), exprs(1), exprs(2)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "edr_dist", exprs => EdrDist(exprs(0), exprs(1), exprs(2)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "hausdorff_km", exprs => HausdorffKm(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "frechet_km_capped", exprs => FrechetCapped(exprs(0), exprs(1), exprs(2)), "scala_udf")
  }

  def frechetKm(a: Column, b: Column): Column = call_function("frechet_km", a, b)

  def lcssMatches(a: Column, b: Column, epsKm: Column): Column =
    call_function("lcss_matches", a, b, epsKm)

  def edrDist(a: Column, b: Column, epsKm: Column): Column =
    call_function("edr_dist", a, b, epsKm)

  def hausdorffKm(a: Column, b: Column): Column = call_function("hausdorff_km", a, b)

  def frechetKmCapped(a: Column, b: Column, capKm: Column): Column =
    call_function("frechet_km_capped", a, b, capKm)
}
