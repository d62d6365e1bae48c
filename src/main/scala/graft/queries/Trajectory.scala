package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TrajSim, TrajSketchFns}
import Q._

/** SURVEY §2.10 extension — TRACK-LEVEL trajectory similarity (round 14):
  * point-wise comparisons of two users' time-ordered polylines, the REPOSE
  * (ICDE 2021)-shaped core capability that the visited-cell Jaccard key
  * (`q_traj_sim`) only approximates. Cell Jaccard is order-blind: two users
  * visiting the same cells in opposite order read identical; discrete
  * Fréchet/LCSS over the actual tracks tell them apart.
  *
  * Scale design, in pipeline order:
  *  1. **Per-user downsample to a fixed point cap** (TrackCap points, every
  *     stride-th fix by time rank): ONE window pass partitioned by user —
  *     the partitioning trajectories already have — so per-pair DP cost is
  *     capped at TrackCap² cells REGARDLESS of data volume; more data per
  *     user only widens the stride. Each kept fix converts once to a unit
  *     3-vector (codegen `transform`), making the DP inner cell pure
  *     arithmetic ([[graft.functions.FrechetDist]] scaladoc).
  *  2. **EXACT scan/prune tiers, per metric** (round-15 — replacing the
  *     r14-documented MinHash-LSH plan, which the fixture itself REFUTES:
  *     the measured visited-cell Jaccard of true top-10 pairs is
  *     indistinguishable from random pairs, one sf0.01 top-10 Fréchet
  *     pair shares ZERO cells — see [[graft.functions.TrajSketch]]):
  *     - LCSS and EDR run an exact SPARSE-MATCH algorithm
  *       (Hunt-Szymanski LIS / sparse gap DP over the ε-match set found
  *       by 2.5°-cell range lookup) — ≡ the full cap² DP on every input.
  *       LCSS additionally threshold-prunes above the adaptive 5M-pair
  *       gate with the exact match upper bound ub = min(nearA, nearB)
  *       ([[lcssPruned]]); EDR does NOT — measured negative result: its
  *       strongest exact bound (max(n,m) − ub) keeps 96% of ×10 pairs
  *       at the true threshold, so a prune tier costs more than it
  *       saves on uniform tracks (the key scaladoc has the numbers).
  *     - Fréchet and Hausdorff keep the full-matrix kernels but, above
  *       the same gate, pay them only on pairs surviving an EXACT
  *       lower-bound threshold prune ([[frechetPruned]] /
  *       [[hausdorffPruned]]): endpoint chord for Fréchet, the
  *       cell-rectangle Hausdorff bound for Hausdorff (sf0.01 measured:
  *       1% survivors at the true top-10 threshold). Output provably
  *       identical to the all-pairs scan in both cases.
  *     All four main passes are SINGLE-SCAN: tracks and sketches ride
  *     the one broadcast pair join, bounds filter inline, survivors pay
  *     the kernel in the same stage — the ×10 probe measured re-attach
  *     joins and per-pair copies as the real wall, not the DP cells.
  *     The near-duplicate/corridor-fleet query form — where MinHash-LSH
  *     IS sound (J ≥ ~0.5) — lives in [[graft.operators.TrajLsh]], a
  *     library surface covered by TrajLshSpec.
  *
  * No SQL oracle (a 2-D DP has no tractable SQL form — the m_time_dtw
  * precedent); TrajectorySpec pins kernel equality with an independent
  * recursive-memo reference in plain haversine km (proving the chord²
  * monotone-transform rewrite exact), sparse-kernel ≡ full-DP equality
  * on random and adversarial tracks, the Eiter-Mannila axioms (identity,
  * symmetry, endpoint lower bound), planted parallel/reversed corridors,
  * LCSS one-wild-fix robustness, forced-prune-branch ≡ direct-branch
  * equality for BOTH pruned keys, and key-level top-10 equality vs an
  * exact all-pairs driver DP at fixture scale. */
object Trajectory extends QueryGroup {

  /** Downsample cap: per-pair exact DP ≤ 64² = 4096 cells. (graft-wide
    * visibility: the TrajLsh corridor joins normalize LCSS with the SAME
    * constant as the contract key.) */
  private[graft] val TrackCap = 64

  /** LCSS match radius, sized to the fixture's 10°-lattice jumps (a cell
    * diagonal at mid-latitude ≈ 1300 km — 500 km says "same fix", not
    * "same cell"). */
  private[graft] val MatchEpsKm = 500.0

  /** Declared refusal gate for the EXACT all-pairs top-k family (round
    * 17, sized from the r16 ×100 probes): the scalar-bound pair scans
    * measured 604–693 s at 11.25×10⁹ pairs on local[32] — ≈1.9 µs·core
    * per pair end-to-end, LINEAR in pairs (the scan is embarrassingly
    * parallel, it scales OUT with cores). This budget admits ≈20 min of
    * scan per core at that measured rate; [[exactPairsGate]] multiplies
    * by the session's parallelism, so a 1000-core cluster admits
    * proportionally more pairs — but U² growth means ×1000 users always
    * crosses ANY constant, and past the gate the keys REFUSE with the
    * corridor escape named instead of silently burning cluster-hours on
    * a query whose exact form has no sub-quadratic algorithm. */
  private[graft] val ExactPairsPerCore = 650_000_000L

  /** Gate check for the four exact top-k keys. Throws (with the corridor
    * form named) when the U² pair count exceeds the declared per-core
    * budget × available parallelism. */
  private[graft] def exactPairsGate(parallelism: Int, key: String,
                                    nUsers: Long): Unit = {
    val pairs = nUsers * (nUsers - 1) / 2
    val gate = ExactPairsPerCore * parallelism
    require(pairs <= gate,
      s"$key: $nUsers users = $pairs exact pairs, past the declared gate " +
        s"$gate ($ExactPairsPerCore pairs/core x $parallelism cores; r16 " +
        "x100 probe: 11.25e9 pairs = 604-693 s on local[32], linear in " +
        "pairs). Exact all-pairs top-k is U-squared - no constant fixes " +
        "x1000 users. Use the corridor/threshold form instead: " +
        "TrajLsh.frechetThresholdPairs / hausdorffThresholdPairs / " +
        "lcssThresholdPairs / edrThresholdPairs (or candidatePairs for " +
        "order-blind cell-set similarity).")
  }

  /** Great-circle km between two unit vectors given as SCALAR columns —
    * the endpoint-prune arithmetic (same chord → 2R·asin(√c²/2) identity
    * as the DP kernels), allocation-free wherever the optimizer moves it. */
  private def scalarChordKm(a: (org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column),
                            b: (org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column)): org.apache.spark.sql.Column = {
    val dx = a._1 - b._1
    val dy = a._2 - b._2
    val dz = a._3 - b._3
    val c2 = dx * dx + dy * dy + dz * dz
    lit(2.0 * graft.functions.HaversineDist.EarthRadiusKm) *
      asin(least(sqrt(c2) / lit(2.0), lit(1.0)))
  }

  /** m_traj_frechet's large-U path: endpoint-lower-bound prune, then the
    * exact DP on survivors only. Stage 1 pair-scans ENDPOINTS (12 doubles
    * per user, not the 1.5 KB tracks) into a light (u1, u2, lb) frame
    * under a lazy local checkpoint; lb = max endpoint chord ≤ dF (every
    * coupling pairs (0,0) and (end,end) — the axiom TrajectorySpec pins).
    * The threshold is the 10th-smallest EXACT distance among the 50
    * smallest-lb candidates — any ≥10-pair subset's 10th-smallest exact
    * is ≥ the global d₁₀, so pruning lb > thr + 1e-4 can never drop a
    * true top-10 pair, and the 1e-4 margin keeps excluded pairs strictly
    * after every kept row even at round(4). Survivors re-attach tracks
    * via broadcast equi-joins and pay the cap² DP. Output provably ≡ the
    * all-pairs scan. */
  /** Prune telemetry for the ×10 probe: candidate pair count by key
    * (survivors placeholder -1 — the ACTUAL survivor count is an
    * `observe("prune", ...)` metric on the main pass, read from the
    * executed frame by ScaleProbe/specs; counting via a separate scan
    * cost a full extra pair pass per key). */
  @volatile private[graft] var lastPrune: Map[String, (Long, Long)] = Map.empty

  private[graft] def frechetPruned(s: SparkSession, tr: DataFrame): DataFrame = {
    import s.implicits._
    TrajSim.register(s)
    // The light (u1, u2, lb) scan is CHEAP (12 doubles per user) but at
    // 10⁸ pairs its materialization is not: r14 localCheckpoint'd it and
    // the 2.7 GB block write dominated the ×10 probe. Build it lazily and
    // run it TWICE instead — a top-50 TakeOrdered pass for the threshold
    // seed and a filter pass for the survivors; two cheap scans beat one
    // data-sized cache at every scale.
    // endpoint lower bound from the tracks() SCALAR endpoint columns —
    // pure arithmetic whether it runs in a Project or gets pushed into
    // the join condition (the slice()-based form was the 1054 s ×10
    // regression: 12 array instantiations per ordered pair, no CSE in
    // join conditions)
    def lbScalar = greatest(
      scalarChordKm(($"hx1", $"hy1", $"hz1"), ($"hx2", $"hy2", $"hz2")),
      scalarChordKm(($"tx1", $"ty1", $"tz1"), ($"tx2", $"ty2", $"tz2")))
    def epCols(side: Int) = Seq("hx", "hy", "hz", "tx", "ty", "tz")
      .map(c => col(c).as(s"$c$side"))
    def light = {
      val eLhs = tr.select(($"user_id".as("u1") +: epCols(1)): _*)
        .repartition(s.sparkContext.defaultParallelism)
      val eRhs = tr.select(($"user_id".as("u2") +: epCols(2)): _*)
      eLhs.join(broadcast(eRhs), $"u1" < $"u2")
        .select($"u1", $"u2", lbScalar.as("lb_km"))
    }
    def attach(df: DataFrame) = df
      .join(broadcast(tr.select($"user_id".as("u1"),
        $"n_fixes".as("n_a"), $"track".as("ta"))), Seq("u1"))
      .join(broadcast(tr.select($"user_id".as("u2"),
        $"n_fixes".as("n_b"), $"track".as("tb"))), Seq("u2"))
    // SEED = 2000 smallest-lb pairs (any >= 10-pair subset gives a valid
    // threshold; 2000 exact kernel evals are noise next to one pair scan
    // and buy a thr much closer to the true d10 — the r15 probe measured
    // 50-pair seeds leaving 30-100x more survivors than necessary)
    val thr = attach(light.orderBy($"lb_km", $"u1", $"u2").limit(2000)
        .select($"u1", $"u2"))
      .select(TrajSim.frechetKm($"ta", $"tb").as("d"))
      .orderBy($"d").limit(10)
      .agg(max($"d").as("t"))
      .select(coalesce($"t", lit(Double.MaxValue)))
      .as[Double].head()
    val nUsers = tr.count()
    lastPrune += "m_traj_frechet" -> (nUsers * (nUsers - 1) / 2, -1L)
    // Main pass is SINGLE-SCAN (round-15 probe finding: re-attaching the
    // 1.5 KB tracks to 3.6×10⁷ survivors through two broadcast joins
    // dominated the ×10 time): the pair scan carries the tracks from the
    // start, the lb filter computes the endpoint bound inline from track
    // slices, and survivors pay the DP in the same codegen stage.
    val lhs = tr.select(($"user_id".as("u1") +: $"n_fixes".as("n_a") +:
        $"track".as("ta") +: epCols(1)): _*)
      .repartition(s.sparkContext.defaultParallelism)
    val rhs = tr.select(($"user_id".as("u2") +: $"n_fixes".as("n_b") +:
        $"track".as("tb") +: epCols(2)): _*)
    // the bound rides the join condition with the CHEAP predicate first
    // (a pushed filter lands before u1<u2 and doubles the bound's 225M
    // evaluations); survivors' count is an observe() metric (no extra
    // scan); the survivor kernel is the CAPPED DP — exact for anything
    // that can reach the top-10, early-abandoning the far pairs that an
    // endpoint bound cannot exclude
    lhs.join(broadcast(rhs), $"u1" < $"u2" && lbScalar <= thr + 1e-4)
      .observe("prune", count(lit(1)).as("survivors"))
      .withColumn("frechet_km",
        round(TrajSim.frechetKmCapped($"ta", $"tb", lit(thr + 1e-4)), 4))
      .select($"u1", $"u2", $"n_a", $"n_b", $"frechet_km")
      .orderBy($"frechet_km", $"u1", $"u2")
      .limit(10)
  }

  /** m_traj_hausdorff's large-U path — the same two-scan threshold-prune
    * shape as [[frechetPruned]], with the EXACT cell-rectangle Hausdorff
    * lower bound ([[graft.functions.TrajSketch.hausLbKm]]) as the stage-1
    * scan: dH ≥ max-min over the two fix-cell sets of the per-cell-pair
    * distance bound, so pruning lb > thr + 1e-4 can never drop a true
    * top-10 pair (thr = the 10th-smallest EXACT distance among the 50
    * smallest-lb candidates — any ≥10-pair subset's 10th-smallest exact
    * is ≥ the global d₁₀). Stage 1 moves only the ≤cap int cell arrays
    * per user, never the 1.5 KB tracks; measured at sf0.01 the bound
    * keeps 1% of pairs at the true threshold. */
  /** The stage-1 scan is a two-pass design tuned by the ×10 probe (the
    * first cut computed the full max-min bound per pair and the 112M-pair
    * scan cost 171 µs/pair — slower than the kernel it was saving):
    *  - SEED pass: the threshold only needs the 10th-smallest EXACT
    *    distance of ANY ≥10-pair subset (every such value ≥ the global
    *    d₁₀), so the seed candidates are picked by the cheap shared-cell
    *    OVERLAP proxy (one merge pass per pair) — proxy quality affects
    *    prune tightness, never correctness.
    *  - FILTER pass: `haus_lb_exceeds(cells, cells, thr)` — the bound is
    *    only ever COMPARED to thr, so the scan exits at the first cell
    *    proving lb > thr (~|cells| lookups on far pairs, the common
    *    case) instead of completing the max-min. */
  private[graft] def hausdorffPruned(s: SparkSession, tr: DataFrame): DataFrame = {
    import s.implicits._
    TrajSketchFns.register(s, MatchEpsKm)
    def lightPairs = {
      val lhs = tr.select($"user_id".as("u1"), $"cells".as("ca"))
        .repartition(s.sparkContext.defaultParallelism)
      val rhs = tr.select($"user_id".as("u2"), $"cells".as("cb"))
      lhs.join(broadcast(rhs), $"u1" < $"u2")
    }
    def attach(df: DataFrame) = df
      .join(broadcast(tr.select($"user_id".as("u1"),
        $"n_fixes".as("n_a"), $"track".as("ta"))), Seq("u1"))
      .join(broadcast(tr.select($"user_id".as("u2"),
        $"n_fixes".as("n_b"), $"track".as("tb"))), Seq("u2"))
    val thr = attach(lightPairs
        .select($"u1", $"u2", TrajSketchFns.cellOverlap($"ca", $"cb").as("ov"))
        .orderBy($"ov".desc, $"u1", $"u2").limit(2000)
        .select($"u1", $"u2"))
      .select(TrajSim.hausdorffKm($"ta", $"tb").as("d"))
      .orderBy($"d").limit(10)
      .agg(max($"d").as("t"))
      .select(coalesce($"t", lit(Double.MaxValue)))
      .as[Double].head()
    val nUsers = tr.count()
    lastPrune += "m_traj_hausdorff" -> (nUsers * (nUsers - 1) / 2, -1L)
    // Single-scan main pass (the frechetPruned discipline): tracks AND
    // cells ride the one pair scan, the early-exit exceeds check prunes,
    // survivors pay the kernel in the same codegen stage — no re-attach.
    val lhs = tr.select($"user_id".as("u1"), $"n_fixes".as("n_a"),
        $"track".as("ta"), $"cells".as("ca"))
      .repartition(s.sparkContext.defaultParallelism)
    val rhs = tr.select($"user_id".as("u2"), $"n_fixes".as("n_b"),
        $"track".as("tb"), $"cells".as("cb"))
    lhs.join(broadcast(rhs),
        $"u1" < $"u2" && !TrajSketchFns.hausLbExceeds($"ca", $"cb", lit(thr + 1e-4)))
      .observe("prune", count(lit(1)).as("survivors"))
      .withColumn("hausdorff_km", round(TrajSim.hausdorffKm($"ta", $"tb"), 4))
      .select($"u1", $"u2", $"n_a", $"n_b", $"hausdorff_km")
      .orderBy($"hausdorff_km", $"u1", $"u2")
      .limit(10)
  }

  /** m_traj_lcss's large-U path: the shared near-count bound
    * ([[graft.functions.TrajSketch.nearCounts]]) gives the EXACT match
    * upper bound ub = min(nearA, nearB) ≥ n_match, so the usual
    * threshold-prune applies to the MAXIMIZATION form: seed = the 50
    * largest-ub pairs, thr = their 10th-best exact normalized LCSS (any
    * ≥10-pair subset's 10th best is ≤ the global s₁₀, so keeping
    * ub_norm ≥ thr − 1e-4 can never drop a true top-10 pair, and
    * excluded pairs sort strictly after kept ones even at round(4)).
    * Single-pass main scan (the frechetPruned discipline). */
  private[graft] def lcssPruned(s: SparkSession, tr: DataFrame): DataFrame = {
    import s.implicits._
    TrajSim.register(s)
    TrajSketchFns.register(s, MatchEpsKm)
    def lightPairs = {
      val lhs = tr.select($"user_id".as("u1"), $"pb".as("sa"), $"dil".as("da"),
          $"n_fixes".as("n_a"))
        .repartition(s.sparkContext.defaultParallelism)
      val rhs = tr.select($"user_id".as("u2"), $"pb".as("sb"), $"dil".as("db"),
          $"n_fixes".as("n_b"))
      lhs.join(broadcast(rhs), $"u1" < $"u2")
        .withColumn("ubn",
          TrajSketchFns.lcssUb($"sa", $"db", $"sb", $"da") /
            least(least($"n_a", $"n_b"), lit(TrackCap.toLong)))
    }
    def attach(df: DataFrame) = df
      .join(broadcast(tr.select($"user_id".as("u1"), $"track".as("ta"),
        $"pb".as("sa2"), $"n_fixes".as("na2"))), Seq("u1"))
      .join(broadcast(tr.select($"user_id".as("u2"), $"track".as("tb"),
        $"pb".as("sb2"), $"n_fixes".as("nb2"))), Seq("u2"))
    val thr = attach(lightPairs.orderBy($"ubn".desc, $"u1", $"u2").limit(2000)
        .select($"u1", $"u2"))
      .select((TrajSketchFns.lcssSparse($"sa2", $"ta", $"sb2", $"tb") /
        least(least($"na2", $"nb2"), lit(TrackCap.toLong))).as("v"))
      .orderBy($"v".desc).limit(10)
      .agg(min($"v").as("t"))
      .select(coalesce($"t", lit(-1.0)))
      .as[Double].head()
    val nUsers = tr.count()
    lastPrune += "m_traj_lcss" -> (nUsers * (nUsers - 1) / 2, -1L)
    val lhs = tr.select($"user_id".as("u1"), $"n_fixes".as("n_a"),
        $"track".as("ta"), $"pb".as("sa"), $"dil".as("da"))
      .repartition(s.sparkContext.defaultParallelism)
    val rhs = tr.select($"user_id".as("u2"), $"n_fixes".as("n_b"),
        $"track".as("tb"), $"pb".as("sb"), $"dil".as("db"))
    lhs.join(broadcast(rhs), $"u1" < $"u2" &&
        TrajSketchFns.lcssUb($"sa", $"db", $"sb", $"da") /
          least(least($"n_a", $"n_b"), lit(TrackCap.toLong)) >= thr - 1e-4)
      .observe("prune", count(lit(1)).as("survivors"))
      .withColumn("n_match", TrajSketchFns.lcssSparse($"sa", $"ta", $"sb", $"tb"))
      .withColumn("lcss", round($"n_match" * lit(1.0) /
        least(least($"n_a", $"n_b"), lit(TrackCap.toLong)), 4))
      .select($"u1", $"u2", $"n_a", $"n_b", $"n_match", $"lcss")
      .orderBy($"lcss".desc, $"u1", $"u2")
      .limit(10)
  }

  /** m_traj_edr's large-U path (round 16 — the r15 verdict's last weak
    * key). The r15 negative result stands for EXPENSIVE bounds: the match-UB
    * bound (max(n,m) − min(nearA, nearB)) kept 96% of ×10 pairs at the true
    * threshold on uniform tracks, so that tier was removed. What ships here
    * is the bound family's FREE member: the LENGTH-DIFFERENCE bound
    * n_edits ≥ |n − m| (every unmatched length unit costs an insert or
    * delete — Chen, Özsu & Oria 2005's edit semantics directly), which in
    * normalized form is lb = |size(ta) − size(tb)| / max(size(ta),
    * size(tb)) — TWO int reads per pair, pure scalar in the join condition
    * (the r15 CSE lesson: no arrays, one call). Its value is regime-
    * dependent, MEASURED (PREFLIGHT_r16) and DECLARED: the bound bites
    * exactly when d₁₀ ≪ 1 — a corpus that CONTAINS near-duplicate tracks,
    * the regime where a top-10-nearest query is meaningful (planted
    * near-dups at ×10-skew: thr collapses to ~1/n and the scan excludes
    * every pair whose length ratio misses it). When even the closest
    * pairs are ~random (d₁₀ ≈ 1 — this fixture, skewed or not: measured
    * survivors 100% of 112.5M pairs), NO bound can prune and the tier
    * honestly degrades to the direct scan plus one cheap seed pass.
    * Same two-scan threshold-prune shape as [[frechetPruned]]
    * (cell-overlap seed → valid threshold → single-scan survivors),
    * output provably ≡ the all-pairs scan (TrajectorySpec pins
    * forced-prune ≡ direct). The d₁₀ ≈ 1 100×-U wall has no exact escape
    * (declared in the key scaladoc); the threshold/corridor query form
    * rides [[graft.operators.TrajLsh.edrThresholdPairs]] instead. */
  private[graft] def edrPruned(s: SparkSession, tr: DataFrame): DataFrame = {
    import s.implicits._
    TrajSketchFns.register(s, MatchEpsKm)
    // normalized length-difference lower bound on edr, from the two
    // DOWNSAMPLED track sizes (scalar ints — the join-condition currency)
    def lbEdr = abs(size($"ta") - size($"tb")).cast("double") /
      greatest(size($"ta"), size($"tb"))
    def edrCol = TrajSketchFns.edrSparse($"sa", $"ta", $"sb", $"tb") *
      lit(3.0) / greatest(size($"ta"), size($"tb"))
    val lhs = tr.select($"user_id".as("u1"), $"n_fixes".as("n_a"),
        $"track".as("ta"), $"pb".as("sa"))
      .repartition(s.sparkContext.defaultParallelism)
    val rhs = tr.select($"user_id".as("u2"), $"n_fixes".as("n_b"),
        $"track".as("tb"), $"pb".as("sb"))
    // SEED: 2000 LARGEST-cell-overlap pairs (any ≥10-pair subset's
    // 10th-smallest exact edr is ≥ the global d₁₀, so the threshold is
    // valid however the seed is chosen — the proxy only affects how TIGHT
    // the prune is). Shared-cell count is the right proxy for LOW edr
    // (matches need shared ε-neighborhoods); the length bound itself is
    // NOT (measured x10-skew: a smallest-length-diff seed put 2000 random
    // equal-length pairs in the seed, thr ≈ 0.94, survivors 100%). The
    // seed pair scan is LIGHT — the sorted distinct cell arrays, ≤ 64
    // ints per side, one merge pass per pair (the hausdorffPruned stage-1
    // shape; the r15 lesson: never carry track payloads through a
    // TakeOrdered heap) — and only the 2000 winners re-attach tracks
    // through broadcast equi-joins to pay the kernel.
    val eLhs = tr.select($"user_id".as("u1"), $"cells".as("ca"))
      .repartition(s.sparkContext.defaultParallelism)
    val eRhs = tr.select($"user_id".as("u2"), $"cells".as("cb"))
    val seed = eLhs.join(broadcast(eRhs), $"u1" < $"u2")
      .select($"u1", $"u2",
        TrajSketchFns.cellOverlap($"ca", $"cb").as("ov"))
      .orderBy($"ov".desc, $"u1", $"u2").limit(2000)
      .select($"u1", $"u2")
    val thr = seed
      .join(broadcast(tr.select($"user_id".as("u1"), $"track".as("ta"),
        $"pb".as("sa"))), Seq("u1"))
      .join(broadcast(tr.select($"user_id".as("u2"), $"track".as("tb"),
        $"pb".as("sb"))), Seq("u2"))
      .select(edrCol.as("v"))
      .orderBy($"v").limit(10)
      .agg(max($"v").as("t"))
      .select(coalesce($"t", lit(Double.MaxValue)))
      .as[Double].head()
    val nUsers = tr.count()
    lastPrune += "m_traj_edr" -> (nUsers * (nUsers - 1) / 2, -1L)
    lhs.join(broadcast(rhs), $"u1" < $"u2" && lbEdr <= thr + 1e-4)
      .observe("prune", count(lit(1)).as("survivors"))
      .withColumn("n_edits",
        TrajSketchFns.edrSparse($"sa", $"ta", $"sb", $"tb"))
      .withColumn("edr", round($"n_edits" * lit(3.0) /
        greatest(size($"ta"), size($"tb")), 4))
      .select($"u1", $"u2", $"n_a", $"n_b", $"n_edits", $"edr")
      .orderBy($"edr", $"u1", $"u2")
      .limit(10)
  }

  /** One row per user: (user_id, n_fixes, track) where track is the
    * interleaved [x0, y0, z0, x1, ...] unit-vector array of the ≤ TrackCap
    * downsampled time-ordered fixes. The rank/stride arithmetic is integer-
    * exact (no FP ever picks a point), so reruns and both DP keys see
    * bit-identical tracks. Memoized per (session, SF) with a lazy local
    * checkpoint (the cellMoves idiom): both DP keys and repeated runs
    * share one window+aggregate derivation instead of recomputing the
    * data-sized pass per key side. */
  private val tracksMemo = new graft.SessionMemo[String, DataFrame]
  private[graft] def tracks(s: SparkSession, dir: String): DataFrame =
    tracksMemo.getOrCompute(s, dir) { buildTracks(s, dir).localCheckpoint(eager = false) }

  private def buildTracks(s: SparkSession, dir: String): DataFrame =
    tracksFromPoints(s,
      Geo.pts(s, dir).select(col("user_id"), col("ts_us"), col("event_id"),
        col("lat"), col("lon")))

  /** The track/sketch derivation over an arbitrary point frame
    * (user_id, ts_us, event_id, lat, lon) — factored from the fixture
    * loader so library callers ([[graft.operators.TrajLsh]]'s corridor
    * join, specs with planted fleets) derive tracks/cells/pb through THE
    * SAME expressions as the contract keys, not a twin. */
  private[graft] def tracksFromPoints(s: SparkSession, pts: DataFrame): DataFrame = {
    import s.implicits._
    TrajSketchFns.register(s, MatchEpsKm)
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val wAll = Window.partitionBy($"user_id")
    pts
      .select($"user_id", $"ts_us", $"event_id", $"lat", $"lon")
      .withColumn("rn", row_number().over(wOrd).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(wAll))
      // stride = ceil(n / cap); rn % stride == 0 keeps the first fix and
      // every stride-th after — ≤ cap points, order preserved. Integer-exact
      // (expr `div`, not FP division) so no ulp ever picks a point.
      .withColumn("stride", greatest(lit(1L),
        expr(s"(n + ${TrackCap - 1}) div $TrackCap")))
      .filter($"rn" % $"stride" === 0L)
      .groupBy($"user_id")
      .agg(max($"n").as("n_fixes"),
        flatten(transform(array_sort(collect_list(struct($"rn", $"lat", $"lon"))),
          p => array(
            cos(radians(p.getField("lat"))) * cos(radians(p.getField("lon"))),
            cos(radians(p.getField("lat"))) * sin(radians(p.getField("lon"))),
            sin(radians(p.getField("lat")))))).as("track"),
        // per-fix 2.5° cell ids, 1:1 with the track order — the sparse-
        // match / lower-bound sketch of functions/TrajSketch. Integer-
        // exact: 2.5° boundaries are exact binary doubles, and the 0.1°-
        // lattice fixture coordinates can never land within an ulp of one.
        // Edge-guarded like TrajSketch.cellId (the shared formula): row
        // clamps to NRow-1 (lat = 90), col wraps mod NLon (lon = 180) —
        // boundary coordinates land in valid cells instead of indexing
        // past the 72-row bound tables.
        transform(array_sort(collect_list(struct($"rn", $"lat", $"lon"))),
          p => (least(lit(graft.functions.TrajSketch.NRow - 1), greatest(lit(0),
              floor((p.getField("lat") + lit(90.0)) / lit(graft.functions.TrajSketch.CellDeg)))) * lit(256)
            + pmod(floor((p.getField("lon") + lit(180.0)) / lit(graft.functions.TrajSketch.CellDeg)),
              lit(graft.functions.TrajSketch.NLon))).cast("int")).as("fc"),
        // raw interleaved lat/lon of the same kept fixes (the map-matching
        // key's input — the HMM needs degrees, not unit vectors)
        flatten(transform(array_sort(collect_list(struct($"rn", $"lat", $"lon"))),
          p => array(p.getField("lat"), p.getField("lon")))).as("ll"))
      // per-user SORTED sketch structures, derived once here so no kernel
      // ever sorts per pair (the round-15 probe lesson — see TrajSketch):
      // pb = (cell << 32 | fixIdx) ascending, the sparse-match lookup
      // structure; cells = distinct sorted cell ids, the bound/overlap set
      .withColumn("pb", expr(
        "array_sort(transform(fc, (c, i) -> shiftleft(CAST(c AS BIGINT), 32) + i))"))
      .withColumn("cells", expr("array_sort(array_distinct(fc))"))
      // the ε-dilation bitmap (162 longs): the LCSS/EDR prune tiers' near
      // test becomes ONE bit lookup per fix at pair time (the per-pair
      // band-search form measured 10 µs/pair — TrajSketch scaladoc)
      .withColumn("dil", TrajSketchFns.dilateCells($"cells"))
      // scalar endpoint coordinates: the fréchet endpoint bound pushed
      // into the pair-join condition must be pure scalar arithmetic —
      // the slice()-based form instantiated 12 array slices per ordered
      // pair inside the join condition (no CSE there) and the ×10 probe
      // paid 300 µs/pair for it
      .withColumn("hx", $"track".getItem(0))
      .withColumn("hy", $"track".getItem(1))
      .withColumn("hz", $"track".getItem(2))
      .withColumn("tx", element_at($"track", -3))
      .withColumn("ty", element_at($"track", -2))
      .withColumn("tz", element_at($"track", -1))
  }

  /** Every (u1 < u2) pair with both tracks attached: the q_traj_sim
    * broadcast signature-scan shape — the right side (one TrackCap·3-double
    * row per user) broadcasts, the scan never shuffles on a pair key.
    *
    * The streamed side is EXPLICITLY repartitioned: the signature frame is
    * tiny in BYTES (U rows × ~1.5 KB), so AQE's small-shuffle coalescing
    * folds it to one partition — and then the U²·cap² DP behind the join
    * runs on ONE core (measured 24 s → 3 s at sf0.1 from this line alone).
    * AQE cannot see compute-heavy-downstream, only bytes; a user-specified
    * repartition is exempt from coalescing, which is exactly the tool for
    * "cheap rows, expensive per-pair work". ROUND-ROBIN, not by u1: a hash
    * repartition on u1 is partitioning-identical to the window exchange
    * below it, so the optimizer removes it as redundant — and then AQE
    * coalesces the remaining ENSURE_REQUIREMENTS exchange anyway.
    * Round-robin is a different partitioning (survives removal) and
    * balances the pair scan regardless of user-id distribution. */
  private def pairedTracks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrajSim.register(s)
    TrajSketchFns.register(s, MatchEpsKm)
    val tr = tracks(s, dir)
    val lhs = tr.select($"user_id".as("u1"), $"n_fixes".as("n_a"),
        $"track".as("ta"), $"pb".as("sa"))
      .repartition(s.sparkContext.defaultParallelism)
    val rhs = tr.select($"user_id".as("u2"), $"n_fixes".as("n_b"),
        $"track".as("tb"), $"pb".as("sb"))
    lhs.join(broadcast(rhs), $"u1" < $"u2")
  }

  val queries: Map[String, QFn] = Map(

    // Discrete Fréchet distance (Eiter & Mannila 1994) between user tracks
    // — top-10 CLOSEST pairs. The shortest-leash measure: order-aware, so
    // a reversed corridor reads far where cell Jaccard reads identical.
    //
    // EXACT two-stage prune (round-14 probe finding: the full cap² DP on
    // every pair was the dominant ×10 cost — 139 s at 10× users, and the
    // pair join itself materializes 3 KB of track payload per pair).
    // Stage 1 pair-scans ENDPOINTS ONLY (12 doubles per user): the
    // endpoint chord lower bound lb ≤ dF (every coupling pairs (0,0) and
    // (end,end) — the axiom TrajectorySpec pins), kept as a light
    // (u1, u2, lb) frame under a lazy local checkpoint. The threshold is
    // the 10th-smallest EXACT distance among the 50 smallest-lb
    // candidates — any ≥10-pair subset's 10th-smallest exact is ≥ the
    // global d₁₀, so pruning lb > thr + 1e-4 can never drop a true
    // top-10 pair, and the 1e-4 margin makes excluded pairs sort
    // strictly after every kept row even at round(4). Survivors alone
    // re-attach tracks via broadcast equi-joins and pay the cap² DP.
    // Output provably ≡ the all-pairs scan — TrajectorySpec pins
    // frechetPruned ≡ the direct path on the fixture (forcing the
    // large-U branch) on top of the key-level ≡ driver-DP test.
    "m_traj_frechet" -> ((s, dir) => {
      import s.implicits._
      TrajSim.register(s)
      val tr = tracks(s, dir)
      // Adaptive gate, DECLARED: below ~5M pairs the direct exact scan is
      // cheaper than the prune's extra jobs (one count on the memoized
      // track frame decides); above it the two-stage prune pays for
      // itself — and on production corridor-sharing fleets (d₁₀ ~ tens
      // of km, not this fixture's ~5000 km random-walk floor) the
      // threshold collapses and the DP tier touches almost nothing.
      val nUsers = tr.count()
      exactPairsGate(s.sparkContext.defaultParallelism, "m_traj_frechet", nUsers)
      if (nUsers * (nUsers - 1) / 2 <= 5_000_000L)
        pairedTracks(s, dir)
          .withColumn("frechet_km", round(TrajSim.frechetKm($"ta", $"tb"), 4))
          .select($"u1", $"u2", $"n_a", $"n_b", $"frechet_km")
          .orderBy($"frechet_km", $"u1", $"u2")
          .limit(10)
      else frechetPruned(s, tr)
    }),

    // EDR — Edit Distance on Real sequence (Chen, Özsu & Oria, SIGMOD
    // 2005) over the same pair scan — the third canonical trajectory DP:
    // outlier-robust like LCSS (one wild fix = one edit) but GAP-AWARE
    // (a long detour costs an edit per fix, where LCSS's shorter-track
    // normalization forgives it). Normalized by the longer track; top-10
    // LOWEST pairs. Same chord²-threshold kernel discipline; no SQL
    // oracle (2-D DP, the m_time_dtw precedent) — TrajectorySpec pins
    // kernel equality vs a full-matrix haversine reference, identity/
    // symmetry, the ≤1-edit wild-fix bound, the LCSS duality on planted
    // detours, and key top-10 equality vs an exact all-pairs driver DP.
    "m_traj_edr" -> ((s, dir) => {
      import s.implicits._
      // exact sparse-match gap DP (functions/TrajSketch) ≡ the full cap²
      // DP on every input. Scale story, fully declared (round 16):
      //  - r15 measured negative result STANDS for expensive bounds: the
      //    match-UB edit bound (max(n,m) − min(nearA, nearB)) keeps 96%
      //    of ×10 pairs at the true threshold on uniform tracks — that
      //    tier stays removed.
      //  - above the same 5M-pair gate the siblings use, [[edrPruned]]
      //    threshold-prunes with the FREE length-difference bound
      //    (n_edits ≥ |n − m| — two scalar ints in the join condition):
      //    measured regime-dependent (PREFLIGHT_r16) — it bites when the
      //    corpus contains genuine near-dup tracks (d₁₀ ≪ 1, the regime
      //    where a nearest-pairs query means anything: thr collapses to
      //    ~1/n and mass-prunes), and degrades to the direct scan + one
      //    cheap seed pass when even the closest pairs are ~random
      //    (d₁₀ ≈ 1 — this fixture, skewed or not: survivors 100%; the
      //    U²·kernel product is the honest wall there, the sparse
      //    kernel its smallest constant). Forced-prune ≡ direct pinned
      //    in TrajectorySpec.
      //  - the threshold/corridor query form — "pairs within edr ≤ τ on
      //    shared routes", the shape a 100-TB fleet query takes — rides
      //    [[graft.operators.TrajLsh.edrThresholdPairs]] (J ≥ 0.5 regime,
      //    measured-sound S-curve; EDR-threshold property in TrajLshSpec).
      val tr = tracks(s, dir)
      val nUsers = tr.count()
      exactPairsGate(s.sparkContext.defaultParallelism, "m_traj_edr", nUsers)
      if (nUsers * (nUsers - 1) / 2 <= 5_000_000L)
        pairedTracks(s, dir)
          .withColumn("n_edits",
            TrajSketchFns.edrSparse($"sa", $"ta", $"sb", $"tb"))
          // normalize by the longer DOWNSAMPLED track (its exact point
          // count is size(track)/3 — stride rounding makes it ≤ cap but
          // not always min(n, cap))
          .withColumn("edr", round($"n_edits" * lit(3.0) /
            greatest(size($"ta"), size($"tb")), 4))
          .select($"u1", $"u2", $"n_a", $"n_b", $"n_edits", $"edr")
          .orderBy($"edr", $"u1", $"u2")
          .limit(10)
      else edrPruned(s, tr)
    }),

    // TRACLUS partition-and-group (Lee, Han & Whang, SIGMOD 2007): MDL-
    // partition every user's track into characteristic segments, density-
    // cluster the segments under d⊥ + d∥ + dθ, report per-cluster support.
    // Parameters sized to the fixture lattice (users step the same
    // deterministic lat/lon pattern at different phases, so parallel
    // corridor segments exist at multi-hundred-km offsets): ε = 1000 km
    // chord, minLns = 3, ≥ 2 distinct users per cluster (the paper's
    // trajectory-cardinality filter), and segments past 2500 km are
    // TRANSIT JUMPS (no corridor evidence between fixes that far apart —
    // most of this synthetic fixture's hops, declared as such in the
    // output) which also bounds the candidate grid's per-segment
    // replication. Candidate generation is exact at any ε for the
    // clustered band (the lemma in [[graft.operators.Traclus]]); no SQL
    // oracle (MDL partitioning + density CC have no DuckDB form — the
    // m_dbscan precedent); TraclusSpec pins the kernels against hand
    // geometry, the pipeline against a brute-force all-pairs reference,
    // and planted crossing corridors separate with noise staying noise.
    "m_traj_traclus" -> ((s, dir) => {
      import s.implicits._
      val segs = graft.operators.Traclus.partition(s, tracks(s, dir))
      graft.operators.Traclus.run(s, segs, epsKm = 1000.0, minLns = 3,
          minUsers = 2, maxSegKm = 2500.0)
        .filter($"cluster" >= 0L)
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n_segs"),
          countDistinct($"user_id").as("n_users"),
          sum(when($"role" === "core", 1L).otherwise(0L)).as("n_core"))
        .orderBy($"n_segs".desc, $"cluster")
        .limit(20)
    }),

    // Symmetric Hausdorff distance (Huttenlocher et al., TPAMI 1993) over
    // the same pair scan — the SET-BASED, order-free fourth member of the
    // family: max over either track's fixes of the distance to the nearest
    // fix on the other. Read NEXT TO m_traj_frechet it answers "same
    // route, which direction?" — a reversed corridor is Hausdorff-0 but
    // Fréchet-far. Top-10 closest pairs. Same chord² discipline (max/min
    // commute with the monotone map, one final asin); inner loop carries
    // the classic best-so-far cutoff. No SQL oracle (the max-min scan has
    // no tractable SQL form at this shape — the DP-family precedent);
    // TrajectorySpec pins kernel ≡ a brute-force haversine max-min
    // reference, identity/symmetry, the Hausdorff ≤ Fréchet dominance
    // axiom, reversed-corridor-reads-0, and key top-10 vs an exact
    // all-pairs driver recomputation.
    "m_traj_hausdorff" -> ((s, dir) => {
      import s.implicits._
      // Same adaptive gate as the Fréchet key: below ~5M pairs the direct
      // exact scan beats the prune's extra jobs; above it the exact
      // cell-bound threshold prune ([[hausdorffPruned]]) pays the kernel
      // on the measured ~1% of pairs the bound cannot exclude.
      TrajSim.register(s)
      val tr = tracks(s, dir)
      val nUsers = tr.count()
      exactPairsGate(s.sparkContext.defaultParallelism, "m_traj_hausdorff", nUsers)
      if (nUsers * (nUsers - 1) / 2 <= 5_000_000L)
        pairedTracks(s, dir)
          .withColumn("hausdorff_km", round(TrajSim.hausdorffKm($"ta", $"tb"), 4))
          .select($"u1", $"u2", $"n_a", $"n_b", $"hausdorff_km")
          .orderBy($"hausdorff_km", $"u1", $"u2")
          .limit(10)
      else hausdorffPruned(s, tr)
    }),

    // HMM map-matching (Newson & Krumm, VLDB 2009 shape) — snap each
    // user's downsampled fixes onto the 0.1° lattice road graph by exact
    // per-user Viterbi over 3×3 candidate nodes: Gaussian emission in the
    // fix→node distance, exponential transition in the route-vs-measured
    // length discrepancy (functions/MapMatch.scala). The fixture is
    // noise-free (every derived coordinate IS a lattice node), so the key
    // DECLARES simulated GPS noise: a deterministic ±0.045° jitter from
    // xxhash64(user_id, fix index) — under half a cell, keeping the true
    // node inside every fix's candidate grid — and then reports how much
    // of the clean walk the HMM recovers (self-validating: truth is the
    // pre-jitter track). Plan: the tracks() substrate's one window pass is
    // the only data-sized job; jitter, the T×9² Viterbi (T ≤ TrackCap)
    // and the recovery compare are all per-user-row codegen work. No SQL
    // oracle (Viterbi DP — the m_time_dtw precedent); MapMatchSpec pins
    // kernel ≡ brute-force all-paths Viterbi, noise-free identity,
    // planted-walk recovery, and the gross-outlier correction.
    "m_traj_mapmatch" -> ((s, dir) => {
      import s.implicits._
      graft.functions.MapMatchExpr.register(s, sigmaKm = 3.0, betaKm = 30.0)
      tracks(s, dir)
        .withColumn("noisy", expr(
          """flatten(transform(sequence(0, size(ll) div 2 - 1), i -> array(
            |  ll[2*i]   + (pmod(xxhash64(user_id, i), 91) - 45) / 1000.0d,
            |  ll[2*i+1] + (pmod(xxhash64(user_id, i, 7), 91) - 45) / 1000.0d)))"""
            .stripMargin))
        .withColumn("snap", graft.functions.MapMatchExpr.mapMatch($"noisy"))
        .withColumn("n_pts", size($"ll") / 2)
        .withColumn("n_rec", expr(
          """aggregate(sequence(0, size(ll) div 2 - 1), 0L, (acc, i) ->
            |  acc + IF(snap[2*i] = CAST(round(ll[2*i] * 10.0d) AS INT) AND
            |           snap[2*i+1] = CAST(round(ll[2*i+1] * 10.0d) AS INT), 1L, 0L))"""
            .stripMargin))
        .select($"user_id", $"n_fixes", $"n_pts".cast("long").as("n_pts"),
          $"n_rec",
          round($"n_rec" * lit(1.0) / $"n_pts", 4).as("recover_rate"))
        .orderBy($"user_id")
    }),

    // LCSS similarity (Vlachos et al., ICDE 2002) over the same pair scan
    // — matches within MatchEpsKm, normalized by the shorter track: the
    // outlier-robust twin (one wild fix caps Fréchet from below but costs
    // LCSS a single match). Top-10 MOST similar pairs.
    "m_traj_lcss" -> ((s, dir) => {
      import s.implicits._
      // exact Hunt-Szymanski LIS over the sparse ε-match set ≡ the full
      // cap² DP on every input (functions/TrajSketch + TrajectorySpec);
      // above the 5M-pair gate the exact match upper bound prunes first
      // ([[lcssPruned]])
      val tr = tracks(s, dir)
      val nUsers = tr.count()
      exactPairsGate(s.sparkContext.defaultParallelism, "m_traj_lcss", nUsers)
      if (nUsers * (nUsers - 1) / 2 <= 5_000_000L)
        pairedTracks(s, dir)
          .withColumn("n_match",
            TrajSketchFns.lcssSparse($"sa", $"ta", $"sb", $"tb"))
          .withColumn("lcss", round($"n_match" * lit(1.0) /
            least(least($"n_a", $"n_b"), lit(TrackCap.toLong)), 4))
          .select($"u1", $"u2", $"n_a", $"n_b", $"n_match", $"lcss")
          .orderBy($"lcss".desc, $"u1", $"u2")
          .limit(10)
      else lcssPruned(s, tr)
    })
  )

  // 2-D DPs have no tractable SQL form (the m_time_dtw precedent) — both
  // keys are property-tested in TrajectorySpec instead.
  val oracle: Map[String, String] = Map.empty
}
