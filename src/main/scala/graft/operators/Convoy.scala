package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convoy / co-travel detection (SURVEY §2.10 `q_traj_convoy`): pairs of
  * users observed in the same space-time bucket — an (hour, grid-cell)
  * triple — in at least `minHours` distinct hours.
  *
  * Scale shape: the self-join is keyed on (hour, cell), so candidate pairs
  * are generated bucket-locally — never across all user pairs — and the
  * distinct() pre-pass caps each bucket at |users seen in that cell-hour|.
  *
  * Hot-bucket skew, honestly: within ONE bucket the pair count is
  * C(u, 2) — and every one of those pairs IS a candidate the semantics
  * require, so no algorithm emits fewer; the question at 100 TB is only
  * whether one task computes them all. Two mitigations, both
  * output-preserving:
  *  - AQE skew-join (on by default): an oversized bucket partition is
  *    split into chunks with the matching side replicated per chunk, so a
  *    hot bucket fans out across tasks at runtime (GeoSpec pins the
  *    hot-bucket output exactly with AQE on).
  *  - For buckets beyond even that (millions of co-located users), the
  *    standard triangle-split: salt users into g groups per bucket and
  *    join group pairs (i ≤ j), turning one quadratic task into C(g+1, 2)
  *    bounded ones. Not implemented — the tested densities and the AQE
  *    path cover the contract surface; this is the documented escalation.
  */
object Convoy {

  /** @param points (user_id, ts_us: µs epoch, lat, lon)
    * @param cellDeg grid cell size in degrees (choose ≈ co-location radius)
    * @param minHours minimum distinct co-located hours for a pair
    * @return (u1, u2, n_hours), u1 < u2, ordered */
  def coTravelers(points: DataFrame, cellDeg: Double, minHours: Int): DataFrame = {
    val p = points
      .select(col("user_id"), expr("ts_us div 3600000000").as("hb"),
              floor(col("lat") / cellDeg).cast("long").as("cla"),
              floor(col("lon") / cellDeg).cast("long").as("clo"))
      .distinct()
    p.as("a").join(p.as("b"), Seq("hb", "cla", "clo"))
      .filter(col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("u1"), col("b.user_id").as("u2"))
      .agg(countDistinct(col("hb")).as("n_hours"))
      .filter(col("n_hours") >= minHours)
      .orderBy(col("u1"), col("u2"))
  }
}
