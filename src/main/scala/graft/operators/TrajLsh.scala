package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash-LSH candidate join over visited-cell sets — the trajectory twin
  * of [[MinHashDedup]], and the tier the r14 verdict asked to build for the
  * track-similarity family. Round-15 MEASURED where it is sound and wired
  * it there, and only there:
  *
  *  - The top-10-NEAREST keys (m_traj_frechet/lcss/edr/hausdorff,
  *    q_traj_sim) CANNOT ride it on arbitrary data: the fixture's true
  *    top-10 pairs have visited-cell Jaccard statistically equal to random
  *    pairs (sf0.01: one top-10 Fréchet pair shares ZERO cells; the
  *    full-set cell-Jaccard p99 is 0.105 vs max 0.135 — there is no S-curve
  *    separating "top-10" from "bulk" at any (rows, bands)). Those keys got
  *    EXACT tiers instead ([[graft.functions.TrajSketch]]).
  *  - The NEAR-DUPLICATE / corridor-fleet regime (J ≥ ~0.5: devices
  *    re-tracing routes, duplicate streams, vehicle fleets on shared
  *    corridors) is the classic LSH domain, and this operator serves it:
  *    r-row AND-banding with OR across bands gives the standard S-curve
  *    P(candidate) = 1 − (1 − Jʳ)ᵇ — at the r = 2, b = 24 defaults that is
  *    0.9989 recall at J = 0.5 against 0.058 admission at the fixture's
  *    J = 0.05 bulk (a 17× pair-scan reduction before the exact verify).
  *
  * Pipeline (every step a codegen'd builtin, the MinHashDedup shape):
  *  1. b·r permutation minima per user, perm_i(c) = xxhash64(c, i) over the
  *     visited-cell ids;
  *  2. band key = xxhash64 of each band's r minima (AND-amplification);
  *  3. candidate pairs from the (band, key) equi-join — never all pairs;
  *  4. exact cell-set Jaccard on candidates only (array_intersect/union),
  *     keeping pairs at J ≥ `minJaccard` — precision 1.0 by construction,
  *     recall the S-curve above (declared, probabilistic — callers needing
  *     exact top-k use the TrajSketch tiers instead).
  *
  * At scale the only shuffles are the band-bucket join and the verify
  * join's signature re-attach; cell ids are ints, so nothing data-sized
  * moves after the per-user aggregation the caller already owns.
  * TrajLshSpec pins planted-corridor recall, exact-verify precision, the
  * candidate-reduction factor, and determinism. */
object TrajLsh {

  /** @param users (user_id, cells: array<int>) — one row per user, the
    *        distinct visited-cell ids (any lattice; callers pick the
    *        resolution that makes "same route" mean "same cells")
    * @param minJaccard exact-verify threshold (the near-dup contract)
    * @param bandRows r (AND width) — 2 tunes the S-curve knee to ~0.2
    * @param numBands b (OR width) */
  def candidatePairs(spark: SparkSession, users: DataFrame,
                     minJaccard: Double,
                     bandRows: Int = 2, numBands: Int = 24): DataFrame = {
    import spark.implicits._
    val nHash = bandRows * numBands
    val sig = users
      .select($"user_id", expr("array_distinct(cells)").as("cells"))
      .filter(size($"cells") > 0)
      .withColumn("mh", expr(
        s"transform(sequence(0, ${nHash - 1}), i -> array_min(transform(cells, c -> xxhash64(c, i))))"))
      .localCheckpoint(eager = false) // reused by bands + both verify sides
    val bandKey = expr(
      s"transform(sequence(0, ${numBands - 1}), t -> xxhash64(${(0 until bandRows)
        .map(k => s"element_at(mh, t * $bandRows + ${k + 1})").mkString(", ")}))")
    val bands = sig.select($"user_id", posexplode(bandKey).as(Seq("band", "bk")))
    val cand = bands.as("a").join(bands.as("b"), Seq("band", "bk"))
      .filter(col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u1"), col("b.user_id").as("u2"))
      .distinct()
    cand
      .join(sig.select($"user_id".as("u1"), $"cells".as("c1")), Seq("u1"))
      .join(sig.select($"user_id".as("u2"), $"cells".as("c2")), Seq("u2"))
      .withColumn("j_exact",
        size(array_intersect($"c1", $"c2")).cast("double") /
          size(array_union($"c1", $"c2")))
      // threshold on the UNROUNDED value (the MinHashDedup discipline);
      // round only the output
      .filter($"j_exact" >= minJaccard)
      .withColumn("jaccard", round($"j_exact", 4))
      .select($"u1", $"u2", $"jaccard")
      .orderBy($"u1", $"u2")
  }

  /** Fréchet-threshold corridor join (round 17 — the declared corridor
    * escape for the exact m_traj_frechet key's U² gate): all pairs within
    * discrete Fréchet ≤ `maxKm` among users sharing a route, found as LSH
    * candidates (cell-Jaccard ≥ `minJaccard`, the regime where the S-curve
    * is measured sound) and verified by the EXACT capped kernel — the same
    * [[graft.functions.FrechetDist]] DP as the contract key, early-
    * abandoning pairs the cap excludes (exact dF when ≤ cap, MaxValue
    * otherwise, so the ≤ maxKm filter is exact).
    *
    * Contract (the edrThresholdPairs discipline, stated precisely):
    * precision 1.0 — every output pair's frechet_km is exact and ≤ maxKm;
    * recall = the LSH S-curve over cell-Jaccard (0.9989 at J = 0.5 with
    * the r = 2, b = 24 defaults) — corridor near-dups share most visited
    * cells BY DEFINITION of the regime, so a low-dF pair sharing few
    * cells is out of contract (that is a top-k-nearest query, which takes
    * the exact gated tier instead). At 100 TB the only shuffles are the
    * band-bucket join and the track re-attach for surviving candidates —
    * never U² pairs.
    *
    * @param tracks the [[graft.queries.Trajectory.tracksFromPoints]]
    *        derivation: `cells` (distinct visited-cell ints) and `track`
    *        (unit-vector array) per user
    * @param maxKm Fréchet keep threshold in great-circle km */
  def frechetThresholdPairs(spark: SparkSession, tracks: DataFrame,
                            maxKm: Double, minJaccard: Double = 0.5,
                            bandRows: Int = 2, numBands: Int = 24): DataFrame = {
    import spark.implicits._
    graft.functions.TrajSim.register(spark)
    val cand = candidatePairs(spark,
      tracks.select($"user_id", $"cells"), minJaccard, bandRows, numBands)
      .select($"u1", $"u2", $"jaccard")
    cand
      .join(tracks.select($"user_id".as("u1"), $"track".as("ta")), Seq("u1"))
      .join(tracks.select($"user_id".as("u2"), $"track".as("tb")), Seq("u2"))
      .withColumn("d_exact", graft.functions.TrajSim
        .frechetKmCapped($"ta", $"tb", lit(maxKm)))
      // threshold the UNROUNDED value, round only the output (house rule)
      .filter($"d_exact" <= maxKm)
      .select($"u1", $"u2", $"jaccard", round($"d_exact", 4).as("frechet_km"))
      .orderBy($"u1", $"u2")
  }

  /** Hausdorff-threshold corridor join (round 17) — the set-based,
    * order-free sibling of [[frechetThresholdPairs]] (same candidate
    * generation, same contract: precision 1.0 by the exact
    * [[graft.functions.HausdorffKm]] kernel, recall the LSH S-curve over
    * cell-Jaccard in the declared J ≥ `minJaccard` corridor regime).
    * Answers "which fleet members cover the same route, either
    * direction" — a reversed corridor is Hausdorff-0 but Fréchet-far, so
    * the two threshold joins compose into the direction question exactly
    * like their top-k contract keys do. */
  def hausdorffThresholdPairs(spark: SparkSession, tracks: DataFrame,
                              maxKm: Double, minJaccard: Double = 0.5,
                              bandRows: Int = 2, numBands: Int = 24): DataFrame = {
    import spark.implicits._
    graft.functions.TrajSim.register(spark)
    val cand = candidatePairs(spark,
      tracks.select($"user_id", $"cells"), minJaccard, bandRows, numBands)
      .select($"u1", $"u2", $"jaccard")
    cand
      .join(tracks.select($"user_id".as("u1"), $"track".as("ta")), Seq("u1"))
      .join(tracks.select($"user_id".as("u2"), $"track".as("tb")), Seq("u2"))
      .withColumn("d_exact",
        graft.functions.TrajSim.hausdorffKm($"ta", $"tb"))
      .filter($"d_exact" <= maxKm)
      .select($"u1", $"u2", $"jaccard", round($"d_exact", 4).as("hausdorff_km"))
      .orderBy($"u1", $"u2")
  }

  /** LCSS-threshold corridor join (round 17) — completes the four-metric
    * corridor family (Fréchet / Hausdorff / EDR / LCSS share one
    * candidate generation and differ only in the exact verify kernel):
    * all pairs with normalized LCSS similarity ≥ `minSim` among users
    * sharing a route. The verify kernel and the normalization are the
    * m_traj_lcss contract key's own (exact Hunt-Szymanski sparse match,
    * n_match / min(n_a, n_b, TrackCap)), so a pair reads the same
    * similarity here and there. Same precision-1.0 / S-curve-recall
    * contract as the siblings; note LCSS is MAXIMIZED, so the threshold
    * keeps sim ≥ minSim (a re-trace reads 1.0).
    *
    * @param tracks the [[graft.queries.Trajectory.tracksFromPoints]]
    *        derivation (`cells`, `track`, `pb`, `n_fixes`)
    * @param minSim normalized-LCSS keep threshold (1 = identical tracks)
    * @param epsKm LCSS match radius, default the contract keys' 500 km */
  def lcssThresholdPairs(spark: SparkSession, tracks: DataFrame,
                         minSim: Double, epsKm: Double = 500.0,
                         minJaccard: Double = 0.5,
                         bandRows: Int = 2, numBands: Int = 24): DataFrame = {
    import spark.implicits._
    graft.functions.TrajSketchFns.register(spark, epsKm)
    val cap = graft.queries.Trajectory.TrackCap.toLong
    val cand = candidatePairs(spark,
      tracks.select($"user_id", $"cells"), minJaccard, bandRows, numBands)
      .select($"u1", $"u2", $"jaccard")
    cand
      .join(tracks.select($"user_id".as("u1"), $"track".as("ta"),
        $"pb".as("sa"), $"n_fixes".as("n_a")), Seq("u1"))
      .join(tracks.select($"user_id".as("u2"), $"track".as("tb"),
        $"pb".as("sb"), $"n_fixes".as("n_b")), Seq("u2"))
      .withColumn("n_match",
        graft.functions.TrajSketchFns.lcssSparse($"sa", $"ta", $"sb", $"tb"))
      .withColumn("sim_exact", $"n_match" * lit(1.0) /
        least(least($"n_a", $"n_b"), lit(cap)))
      // threshold the UNROUNDED value, round only the output (house rule)
      .filter($"sim_exact" >= minSim)
      .select($"u1", $"u2", $"jaccard", $"n_match",
        round($"sim_exact", 4).as("lcss"))
      .orderBy($"u1", $"u2")
  }

  /** EDR-threshold corridor join (round 16 — the declared 100-TB query
    * form for EDR, closing the r15 verdict's last weak key): all pairs
    * within normalized EDR ≤ `maxEdr` among users sharing a route, found
    * as LSH candidates (J ≥ `minJaccard`, the regime where the S-curve
    * is measured sound) and verified by the EXACT sparse-EDR kernel —
    * the same kernel as the m_traj_edr key, via the same registration.
    *
    * Contract, stated precisely: precision 1.0 (every output pair's edr
    * is exact and ≤ maxEdr); recall = the LSH S-curve over cell-Jaccard
    * (0.9989 at J = 0.5 with the r = 2, b = 24 defaults) — corridor
    * near-dups share most visited cells BY DEFINITION of the regime, so
    * a low-EDR pair that shares few cells is out of contract (it is a
    * top-k-nearest query, which takes the exact gated tier instead).
    * At 100 TB the only shuffles are the band-bucket join and the
    * track re-attach for the surviving candidates — never U² pairs.
    *
    * @param tracks one row per user with `cells` (distinct visited-cell
    *        ints), `track` (unit-vector array) and `pb` (packed sorted
    *        cell|idx) — the [[graft.queries.Trajectory.tracksFromPoints]]
    *        derivation, shared with the contract keys
    * @param maxEdr normalized-EDR keep threshold (0 = identical tracks)
    * @param epsKm EDR match radius, default the contract keys' 500 km */
  def edrThresholdPairs(spark: SparkSession, tracks: DataFrame,
                        maxEdr: Double, epsKm: Double = 500.0,
                        minJaccard: Double = 0.5,
                        bandRows: Int = 2, numBands: Int = 24): DataFrame = {
    import spark.implicits._
    graft.functions.TrajSketchFns.register(spark, epsKm)
    val cand = candidatePairs(spark,
      tracks.select($"user_id", $"cells"), minJaccard, bandRows, numBands)
      .select($"u1", $"u2", $"jaccard")
    cand
      .join(tracks.select($"user_id".as("u1"), $"track".as("ta"), $"pb".as("sa")), Seq("u1"))
      .join(tracks.select($"user_id".as("u2"), $"track".as("tb"), $"pb".as("sb")), Seq("u2"))
      .withColumn("n_edits",
        graft.functions.TrajSketchFns.edrSparse($"sa", $"ta", $"sb", $"tb"))
      // same normalization as the m_traj_edr key: edits over the longer
      // downsampled track; threshold the UNROUNDED value, round the output
      .withColumn("edr_exact", $"n_edits" * lit(3.0) /
        greatest(size($"ta"), size($"tb")))
      .filter($"edr_exact" <= maxEdr)
      .select($"u1", $"u2", $"jaccard", $"n_edits",
        round($"edr_exact", 4).as("edr"))
      .orderBy($"u1", $"u2")
  }
}
