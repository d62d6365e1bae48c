package graft.plans

import graft.functions.HaversineDist
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (SURVEY §4 / §2.12 — the `Rule[LogicalPlan]` extension
  * surface): rewrite a geo-radius predicate
  * `haversine_km(lat, lon, <lit cLat>, <lit cLon>) < r` by AND-ing in the
  * sargable bounding box that the radius implies.
  *
  * Why it matters at 100 TB: the haversine itself is an opaque function
  * call — the scan must evaluate four transcendentals per row and nothing
  * pushes down. The derived `lat BETWEEN … AND lon BETWEEN …` conjuncts
  * are ordinary range predicates: on stored columns they reach the parquet
  * reader as `PushedFilters` (row groups skipped on min/max), on derived
  * columns they still run before the trig does. The original predicate is
  * kept — the box is a strict superset of the disc, so results are
  * bit-identical (PlanSpec proves both claims).
  *
  * Bound derivation (sphere radius R = [[HaversineDist.EarthRadiusKm]]):
  *  - latitude: great-circle distance ≥ meridional component, so a point
  *    within r satisfies |Δlat| ≤ toDegrees(r/R);
  *  - longitude: from the haversine itself, dist ≥ 2R·asin(cosMin·|sin(Δλ/2)|)
  *    where cosMin is the minimum cos(lat) over the latitude band, giving
  *    |Δλ| ≤ 2·asin(sin(r/2R)/cosMin) when that asin argument is < 1; if it
  *    reaches 1 (poles in the band) or the box would cross the antimeridian,
  *    the longitude bound is simply omitted (latitude bound still prunes).
  *
  * Registered per-session via `spark.experimental.extraOptimizations`
  * (fixed-point batch — the rule is idempotent: bounds already present are
  * recognized by semantic equality and not re-added). */
object HaversineRadiusPruning extends Rule[LogicalPlan] {

  private val Safety = 1.0 + 1e-9

  /** (latLo, latHi, Option[(lonLo, lonHi)]) implied by the r-km disc. */
  def bbox(cLat: Double, cLon: Double, rKm: Double): (Double, Double, Option[(Double, Double)]) = {
    val R = HaversineDist.EarthRadiusKm
    val dLat = math.toDegrees(rKm / R) * Safety
    val latLo = cLat - dLat
    val latHi = cLat + dLat
    val maxAbsLat = math.min(90.0, math.max(math.abs(latLo), math.abs(latHi)))
    val cosMin = math.cos(math.toRadians(maxAbsLat))
    val sinHalf = math.sin(rKm / (2.0 * R))
    val lon =
      if (latLo <= -90.0 || latHi >= 90.0 || cosMin <= 0.0 || sinHalf / cosMin >= 1.0) None
      else {
        val dLon = math.toDegrees(2.0 * math.asin(sinHalf / cosMin)) * Safety
        if (cLon - dLon < -180.0 || cLon + dLon > 180.0) None
        else Some((cLon - dLon, cLon + dLon))
      }
    (latLo, latHi, lon)
  }

  private def dLit(v: Double) = Literal(v, DoubleType)

  /** Any non-null numeric literal, as a Double — an integer/long/decimal
    * radius or centre written in SQL text must get the same bbox a DOUBLE
    * literal gets (ImplicitCastInputTypes usually folds the cast away
    * before this rule fires, but not for every parse shape). */
  private object NumLit {
    import org.apache.spark.sql.types._
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(null, _) => None
      case Literal(v: Double, DoubleType)   => Some(v)
      case Literal(v: Float, FloatType)     => Some(v.toDouble)
      case Literal(v: Int, IntegerType)     => Some(v.toDouble)
      case Literal(v: Long, LongType)       => Some(v.toDouble)
      case Literal(v: Short, ShortType)     => Some(v.toDouble)
      case Literal(v: Byte, ByteType)       => Some(v.toDouble)
      case Literal(v: Decimal, _: DecimalType) => Some(v.toDouble)
      case _ => None
    }
  }

  /** Bounds implied by one conjunct, if it is a literal-centred radius test.
    * haversine_km is symmetric in its two points, so the literal centre may
    * appear in either argument pair. */
  private def boundsOf(conjunct: Expression): Seq[Expression] = {
    def bounds(latE: Expression, lonE: Expression,
               cLat: Double, cLon: Double, r: Double): Seq[Expression] = {
      val (latLo, latHi, lon) = bbox(cLat, cLon, r)
      Seq(GreaterThanOrEqual(latE, dLit(latLo)), LessThanOrEqual(latE, dLit(latHi))) ++
        lon.toSeq.flatMap { case (lo, hi) =>
          Seq(GreaterThanOrEqual(lonE, dLit(lo)), LessThanOrEqual(lonE, dLit(hi)))
        }
    }
    def derive(h: HaversineDist, r: Double): Seq[Expression] = h match {
      case HaversineDist(latE, lonE, NumLit(cLat), NumLit(cLon))
          if latE.deterministic && lonE.deterministic && !latE.foldable && !lonE.foldable =>
        bounds(latE, lonE, cLat, cLon, r)
      case HaversineDist(NumLit(cLat), NumLit(cLon), latE, lonE)
          if latE.deterministic && lonE.deterministic && !latE.foldable && !lonE.foldable =>
        bounds(latE, lonE, cLat, cLon, r)
      case _ => Nil
    }
    conjunct match {
      case LessThan(h: HaversineDist, NumLit(r))        => derive(h, r)
      case LessThanOrEqual(h: HaversineDist, NumLit(r)) => derive(h, r)
      case GreaterThan(NumLit(r), h: HaversineDist)     => derive(h, r)
      case GreaterThanOrEqual(NumLit(r), h: HaversineDist) => derive(h, r)
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val added = conjuncts.flatMap(boundsOf)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (added.isEmpty) f
      else Filter((conjuncts ++ added).reduceLeft(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other     => Seq(other)
  }

  /** Idempotent per-session installation. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(HaversineRadiusPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HaversineRadiusPruning
}
