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
  * whether one task computes them all. Two output-preserving mitigations,
  * both live:
  *  - AQE skew-join (on by default): an oversized bucket partition is
  *    split into chunks with the matching side replicated per chunk, so a
  *    hot bucket fans out across tasks at runtime (GeoSpec pins the
  *    hot-bucket output exactly with AQE on).
  *  - The triangle-split, for buckets past even that: users in a bucket
  *    whose population exceeds `hotUsers` are salted into `groups` groups
  *    by user-id hash, and pairs come from joining group pairs (i ≤ j) —
  *    one quadratic task becomes C(groups+1, 2) bounded ones, each
  *    ~1/C(groups+1,2) of the bucket's pairs. Each unordered pair is
  *    emitted exactly once: a user serves as LEFT for group pairs
  *    (own, j ≥ own) and as RIGHT for (i ≤ own, own), so a cross-group
  *    pair appears only in its one (i, j) combination and within-group
  *    pairs are ordered by user id. GeoSpec plants a bucket past the
  *    threshold and pins exact equality with the unsalted path.
  */
object Convoy {

  /** @param points (user_id, ts_us: µs epoch, lat, lon)
    * @param cellDeg grid cell size in degrees (choose ≈ co-location radius)
    * @param minHours minimum distinct co-located hours for a pair
    * @param hotUsers bucket population above which the triangle-split
    *        engages (quadratic work per bucket task caps at ~hotUsers²)
    * @param groups salt width for split buckets: 0 (default) = ADAPTIVE,
    *        g = ceil(bn / hotUsers) per bucket, so each (gi, gj) task holds
    *        ~(bn/g)² ≈ hotUsers² pairs however large the bucket — a fixed
    *        width would leave (bn/g)² growing quadratically again past it.
    *        A positive value forces that fixed width (equality tests sweep
    *        it against the adaptive and plain paths).
    * @return (u1, u2, n_hours), u1 < u2, ordered */
  def coTravelers(points: DataFrame, cellDeg: Double, minHours: Int,
                  hotUsers: Int = 10000, groups: Int = 0): DataFrame = {
    val p = points
      .select(col("user_id"), expr("ts_us div 3600000000").as("hb"),
              floor(col("lat") / cellDeg).cast("long").as("cla"),
              floor(col("lon") / cellDeg).cast("long").as("clo"))
      .distinct()
    val key = Seq("hb", "cla", "clo")
    // Bucket populations ride the same (hb, cla, clo) shuffle key as the
    // pair join, so the size tag and the split are co-partitioned work.
    val sizes = p.groupBy(key.map(col): _*).agg(count(lit(1)).as("bn"))
    val tagged = p.join(sizes, key)

    val cold = tagged.filter(col("bn") <= hotUsers).select(
      col("hb"), col("cla"), col("clo"), col("user_id"))
    val coldPairs = cold.as("a").join(cold.as("b"), key)
      .filter(col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u1"), col("b.user_id").as("u2"), col("hb"))

    // Per-bucket salt width: both sides derive g from the SAME bn, so the
    // (gi, gj) join keys agree within a bucket by construction. bn >
    // hotUsers ⇒ g ≥ 2, so a split bucket always actually splits.
    val gExpr =
      if (groups > 0) lit(groups.toLong)
      else ceil(col("bn").cast("double") / hotUsers).cast("long")
    val hot = tagged.filter(col("bn") > hotUsers)
      .withColumn("g", gExpr)
      .withColumn("gid", pmod(xxhash64(col("user_id")), col("g")))
    val left = hot
      .withColumn("gj", explode(expr("sequence(gid, g - 1L)")))
      .select(col("hb"), col("cla"), col("clo"),
              col("gid").as("gi"), col("gj"), col("user_id").as("ua"))
    val right = hot
      .withColumn("gi", explode(expr("sequence(0L, gid)")))
      .select(col("hb"), col("cla"), col("clo"),
              col("gi"), col("gid").as("gj"), col("user_id").as("ub"))
    val hotPairs = left.join(right, key ++ Seq("gi", "gj"))
      .filter(col("gi") =!= col("gj") || col("ua") < col("ub"))
      .select(least(col("ua"), col("ub")).as("u1"),
              greatest(col("ua"), col("ub")).as("u2"), col("hb"))

    coldPairs.unionAll(hotPairs)
      .groupBy(col("u1"), col("u2"))
      .agg(countDistinct(col("hb")).as("n_hours"))
      .filter(col("n_hours") >= minHours)
      .orderBy(col("u1"), col("u2"))
  }
}
