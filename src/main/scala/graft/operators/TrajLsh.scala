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
}
