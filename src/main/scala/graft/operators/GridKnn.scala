package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HaversineDist

/** Grid-pruned EXACT k-nearest-neighbours with ring growth (SURVEY §2.10
  * `q_geo_knn`): candidates come from the probe cell's (2r+1)×(2r+1)
  * neighborhood via a SARGABLE lat/lon box predicate, starting at r = 1 and
  * widening until the kth candidate's distance is certified inside the
  * ring's safe radius — the minimum distance from the probe to the ring
  * boundary, beyond which no point outside the ring can displace any of the
  * k found inside it. That certificate makes the result exact at ANY data
  * density, not just the one a fixed ring was measured against: sparse
  * neighborhoods grow the ring, dense ones settle at r = 1.
  *
  * Scale shape: each probed ring is one box scan (on the cell-partitioned
  * layout PlanSpec demonstrates, the box predicate prunes partition
  * DIRECTORIES and row groups before any scoring) plus one driver guard
  * action reading back a single (count, max) row; the accepted ring's
  * TakeOrderedAndProject heaps only the pruned candidates. The ring box
  * grows geometrically in area, so the search probes O(log(density ratio))
  * rings; a box that covers the whole domain is accepted unconditionally
  * (nothing exists outside it), which bounds the loop and makes the
  * degenerate fallback exactly the full scan. */
object GridKnn {

  /** Minimum haversine distance from the probe to the ring-box boundary,
    * with a 0.9 margin: the closest point on a MERIDIAN edge can sit at a
    * latitude other than the probe's (cross-track < along-parallel), so the
    * four edge-foot distances alone slightly overstate the bound. Any point
    * OUTSIDE the box is at least this far from the probe. */
  def safeRadiusKm(pLat: Double, pLon: Double, latLo: Double, latHi: Double,
                   lonLo: Double, lonHi: Double): Double =
    Seq(HaversineDist.km(pLat, pLon, latLo, pLon),
        HaversineDist.km(pLat, pLon, latHi, pLon),
        HaversineDist.km(pLat, pLon, pLat, lonLo),
        HaversineDist.km(pLat, pLon, pLat, lonHi)).min * 0.9

  /** @param points (event_id, lat, lon) — extra columns pass through the scan
    * @return (top-k plan: (event_id, dist_km rounded to 3, ordered by
    *         (dist_km, event_id)), ring the certificate accepted) */
  def topK(points: DataFrame, pLat: Double, pLon: Double, cellDeg: Double,
           k: Int, maxRing: Int = 20): (DataFrame, Int) = {
    HaversineDist.register(points.sparkSession)

    def box(ring: Int): (Double, Double, Double, Double) = (
      (math.floor(pLat / cellDeg) - ring) * cellDeg,
      (math.floor(pLat / cellDeg) + ring + 1) * cellDeg,
      (math.floor(pLon / cellDeg) - ring) * cellDeg,
      (math.floor(pLon / cellDeg) + ring + 1) * cellDeg)

    def cands(ring: Int): DataFrame = {
      val (latLo, latHi, lonLo, lonHi) = box(ring)
      points
        .filter(col("lat") >= latLo && col("lat") < latHi &&
                col("lon") >= lonLo && col("lon") < lonHi)
        .withColumn("d_exact",
          HaversineDist.haversineKm(col("lat"), col("lon"), lit(pLat), lit(pLon)))
    }

    // Rounded AFTER the certificate: the guard compares UNROUNDED distances
    // (a rounded kth could understate by 5e-4 km), the output contract is
    // round(3) then (dist_km, event_id) order — same text as the oracle.
    def result(ring: Int): DataFrame =
      cands(ring)
        .withColumn("dist_km", round(col("d_exact"), 3))
        .select(col("event_id"), col("dist_km"))
        .orderBy(col("dist_km"), col("event_id"))
        .limit(k)

    var ring = 1
    while (ring < maxRing) {
      val (latLo, latHi, lonLo, lonHi) = box(ring)
      if (latLo <= -90 && latHi >= 90 && lonLo <= -180 && lonHi >= 180)
        return (result(ring), ring) // box ⊇ domain: exact unconditionally
      val guard = cands(ring).orderBy(col("d_exact")).limit(k)
        .agg(count(lit(1)), max(col("d_exact"))).head()
      if (guard.getLong(0) == k &&
          guard.getDouble(1) < safeRadiusKm(pLat, pLon, latLo, latHi, lonLo, lonHi))
        return (result(ring), ring)
      ring += 1
    }
    (result(maxRing), maxRing)
  }
}
