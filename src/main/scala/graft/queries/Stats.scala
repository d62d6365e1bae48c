package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** SURVEY §2.11b adjunct — the hypothesis-test statistics an analyst runs
  * before trusting the mining keys, one per question: χ² (is event mix
  * related to value level?), Welch t (do two types' MEANS differ?),
  * Kolmogorov–Smirnov (do their SHAPES differ?), Mann–Whitney U /
  * Kruskal–Wallis (rank-level location, two-sample and k-sample),
  * Spearman ρ (do two activity series co-move monotonically?),
  * Brown–Forsythe (do VARIANCES differ?), and PSI (has the distribution
  * DRIFTED over time?). Every key reduces the fact scan to one tiny
  * exact-count / decimal-sum aggregate first; all later arithmetic runs
  * on operands that are bit-identical in both engines (integer counts,
  * BIGINT doubled midranks, decimal-routed sums, round-pinned medians
  * and ln terms), so the statistics hash-match without any tolerance.
  *
  * Scale shape: one data-sized hash aggregate each; everything after
  * operates on grid-bounded frames (≤1000 value bins, ≤|types|² pairs,
  * time-bounded hour grids) — nothing driver-sized, nothing quadratic
  * in data. Shared substrates (the unit-bin rule, the click/purchase
  * per-bin counts, the doubled-midrank formula, the Pearson power-sum
  * tail) each have ONE definition per dialect.
  */
object Stats extends QueryGroup {

  /** Declared unit-bin rule (bin = min(⌊value⌋, 999)) shared by every
    * binned nonparametric key — ONE definition per dialect, so a grid
    * change can never desynchronize ks/kruskal/mwu/psi. */
  private def binCol: Column = least(floor(col("value")).cast("long"), lit(999L))
  private val binSql = "least(CAST(floor(value) AS BIGINT), 999)"

  /** Per-type central moments from DECIMAL-exact power sums — the ONE
    * definition behind q_stat_moments AND q_stat_jarque (shared substrate
    * so the two keys can never drift). Columns: event_type, n, mean,
    * stddev (round 4), skewness, kurtosis (excess, round 6). */
  private def momentsFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           dsum($"value", 6).as("s1"),
           sum(($"value" * $"value").cast(DecimalType(38, 6)))
             .cast("double").as("s2"),
           sum(($"value" * $"value" * $"value").cast(DecimalType(38, 6)))
             .cast("double").as("s3"),
           sum(($"value" * $"value" * $"value" * $"value")
             .cast(DecimalType(38, 6))).cast("double").as("s4"))
      .withColumn("m", $"s1" / $"n")
      .withColumn("m2", $"s2" / $"n" - $"m" * $"m")
      .withColumn("m3", $"s3" / $"n" - lit(3.0) * $"m" * ($"s2" / $"n")
        + lit(2.0) * $"m" * $"m" * $"m")
      .withColumn("m4", $"s4" / $"n" - lit(4.0) * $"m" * ($"s3" / $"n")
        + lit(6.0) * $"m" * $"m" * ($"s2" / $"n")
        - lit(3.0) * $"m" * $"m" * $"m" * $"m")
      .select($"event_type", $"n",
        r4($"m").as("mean"),
        r4(sqrt($"m2")).as("stddev"),
        round($"m3" / ($"m2" * sqrt($"m2")), 6).as("skewness"),
        round($"m4" / ($"m2" * $"m2") - lit(3.0), 6).as("kurtosis"))
  }

  /** click/purchase per-bin counts — the q_stat_ks / q_stat_mwu substrate
    * (the one data-sized aggregate both keys share). */
  /** Shared time-to-event substrate of q_stat_km / q_stat_logrank: per
    * user, days from first event to first high-value purchase (value ≥
    * 150), censored at the last observed event (ev = 0) — plus the
    * cohort grp from the q_sample_split md5 discipline (first hex nibble
    * of md5(user_id) < '8' ⇒ grp 1, a ~50/50 hash-cohorted A/B split —
    * content-keyed so it is balanced and NON-EMPTY at every SF, where a
    * behavior-derived cohort can come up empty on a 15-user fixture).
    * One data-sized (user) hash agg. */
  private def survivalFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("ts_us", unix_micros($"ts"))
      .groupBy($"user_id")
      .agg(min($"ts_us").as("t0"),
           min(when($"event_type" === "purchase" && $"value" >= 150.0,
             $"ts_us")).as("tp"),
           max($"ts_us").as("tl"))
      .select(expr(
        """CASE WHEN tp IS NOT NULL THEN (tp - t0) div 86400000000L
          |     ELSE (tl - t0) div 86400000000L END""".stripMargin).as("d"),
        when($"tp".isNotNull, 1L).otherwise(0L).as("ev"),
        when(substring(md5($"user_id".cast("string")), 1, 1) < "8", 1L)
          .otherwise(0L).as("grp"))
  }

  private def cpBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("bin", binCol)
      .groupBy($"bin")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
           sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
  }

  /** Oracle mirror of [[cpBins]] as a CTE body named `perbin`. */
  private val cpBinsCte =
    s"""perbin AS (
       |  SELECT $binSql AS bin,
       |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |  GROUP BY 1)""".stripMargin

  /** Doubled midrank of a tie group of size `t` covering cumulative
    * positions (cum−t, cum]: 2·midrank = 2·(cum−t) + t + 1, BIGINT-exact
    * (shared by kruskal + mwu; the SQL texts carry the same formula). */
  private def r2Col(cum: Column, t: Column): Column =
    lit(2L) * (cum - t) + t + 1L

  val queries: Map[String, QFn] = Map(
    // Pearson χ² test of independence between event_type and the
    // above-global-median value flag. The median is round(6)-pinned and
    // broadcast (q_anomaly_mad discipline); observed counts are integers,
    // expected = row·col/n and the statistic Σ(o−e)²/e run identically on
    // those integers in both engines. dof = (R−1)(C−1) from exact distinct
    // counts. One fact hash-agg; the window sums see ≤10 rows.
    "q_stat_chisq" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_type", $"value")
      val med = ev.agg(round(median($"value"), 6).as("med"))
      val cells = ev.crossJoin(broadcast(med))
        .withColumn("hi", when($"value" > $"med", 1).otherwise(0))
        .groupBy($"event_type", $"hi")
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy($"event_type")
      val wc = Window.partitionBy($"hi")
      val wn = Window.partitionBy()
      cells
        .withColumn("r", sum($"o").over(wr))
        .withColumn("c", sum($"o").over(wc))
        .withColumn("n", sum($"o").over(wn))
        .withColumn("e", $"r".cast("double") * $"c" / $"n")
        .withColumn("term", ($"o" - $"e") * ($"o" - $"e") / $"e")
        .agg(max($"n").as("n"),
             ((countDistinct($"event_type") - 1) *
              (countDistinct($"hi") - 1)).as("dof"),
             // per-cell terms are identical doubles; the DECIMAL route
             // makes their 10-row sum order-free too
             round(sum($"term".cast(DecimalType(18, 8))), 4).cast("double").as("chi2"))
    }),

    // Pairwise Welch t statistics between event types' value means —
    // which pairs differ, by how many standard errors. Per-type n /
    // decimal-exact Σx / Σx² feed mean and sample variance (identical
    // doubles), then a 10-row u1<u2 self-join computes
    // t = (m1−m2)/sqrt(v1/n1 + v2/n2) and the Welch–Satterthwaite dof.
    // One fact hash-agg; the pair join is 5×5 broadcast.
    "q_stat_welch" -> ((s, dir) => {
      import s.implicits._
      val st = t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             dsum($"value", 6).as("s1"),
             dsum($"value" * $"value", 6).as("s2"))
        .withColumn("m", $"s1" / $"n")
        .withColumn("v", ($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))
      val a = st.select($"event_type".as("t1"), $"n".as("n1"),
                        $"m".as("m1"), $"v".as("v1"))
      val b = st.select($"event_type".as("t2"), $"n".as("n2"),
                        $"m".as("m2"), $"v".as("v2"))
      a.join(broadcast(b), $"t1" < $"t2")
        .withColumn("se2", $"v1" / $"n1" + $"v2" / $"n2")
        .withColumn("t_stat", r4(($"m1" - $"m2") / sqrt($"se2")))
        .withColumn("dof", r2($"se2" * $"se2" /
          (($"v1" / $"n1") * ($"v1" / $"n1") / ($"n1" - 1) +
           ($"v2" / $"n2") * ($"v2" / $"n2") / ($"n2" - 1))))
        .select($"t1", $"t2", $"n1", $"n2", $"t_stat", $"dof")
        .orderBy($"t1", $"t2")
    }),

    // Standardized effect sizes for every type pair — Cohen's d (pooled
    // sd), Hedges' g (the small-sample bias correction g = d·(1 −
    // 3/(4n−9)), Hedges & Olkin 1985), and Glass's Δ (control = the
    // alphabetically first type's sd): the MAGNITUDE companion of
    // q_stat_welch's t (significance says "not chance"; the effect size
    // says "big enough to matter" — the report every A/B readout pairs
    // them in). Same decimal-exact power-sum substrate as welch (ONE fact
    // hash agg); every downstream op runs on the |types|² broadcast pair
    // frame with identical double operands, round(4)-pinned.
    "q_stat_effect" -> ((s, dir) => {
      import s.implicits._
      val st = t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             dsum($"value", 6).as("s1"),
             dsum($"value" * $"value", 6).as("s2"))
        .withColumn("m", $"s1" / $"n")
        .withColumn("v", ($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))
      val a = st.select($"event_type".as("t1"), $"n".as("n1"),
                        $"m".as("m1"), $"v".as("v1"))
      val b = st.select($"event_type".as("t2"), $"n".as("n2"),
                        $"m".as("m2"), $"v".as("v2"))
      a.join(broadcast(b), $"t1" < $"t2")
        .withColumn("sp", sqrt((($"n1" - 1) * $"v1" + ($"n2" - 1) * $"v2") /
          ($"n1" + $"n2" - 2)))
        .withColumn("d", ($"m1" - $"m2") / $"sp")
        .select($"t1", $"t2",
          r4($"d").as("cohen_d"),
          r4($"d" * (lit(1.0) - lit(3.0) /
            (lit(4.0) * ($"n1" + $"n2") - 9.0))).as("hedges_g"),
          r4(($"m1" - $"m2") / sqrt($"v1")).as("glass_delta"))
        .orderBy($"t1", $"t2")
    }),

    // Two-sample Kolmogorov–Smirnov distance between the click and
    // purchase value distributions, on the DECLARED unit-bin grid
    // (bin = min(floor(value), 999); the fixture's values live in
    // [0, ~560], q_filter_clean's declared range) — binning bounds the
    // ECDF scan by the GRID (≤1000 rows), not the data, so the one
    // ordered cumulative pass is grid-sized at any corpus volume (the
    // q_time_* scale argument in 1-D value space). The statistic runs in
    // the scaled integer form |a1·n2 − a2·n1| (≡ n1·n2·|F̂1−F̂2|): the
    // argmax and the max are exact BIGINT comparisons (products ≤ ~4e8
    // at sf0.1; at n beyond ~3e9/side route through DECIMAL), and the
    // single final division is over identical operands in both engines.
    // Argmax ties break to the smallest bin via the max(struct) idiom.
    "q_stat_ks" -> ((s, dir) => {
      import s.implicits._
      val perBin = cpBins(s, dir)
      val wCum = Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      perBin
        .withColumn("a1", sum($"c1").over(wCum))
        .withColumn("a2", sum($"c2").over(wCum))
        .withColumn("n1", sum($"c1").over(wAll))
        .withColumn("n2", sum($"c2").over(wAll))
        .withColumn("d", abs($"a1" * $"n2" - $"a2" * $"n1"))
        .agg(max($"n1").as("n1"), max($"n2").as("n2"),
             max(struct($"d", (-$"bin").as("nb"))).as("top"))
        .select($"n1", $"n2",
          round($"top.d".cast("double") /
            ($"n1" * $"n2").cast("double"), 6).as("ks_d"),
          (-$"top.nb").as("at_bin"))
    }),

    // k-sample Anderson–Darling (Scholz & Stephens, JASA 1987 — the
    // midrank/tie-adjusted A²akN, k = 2 on click vs purchase values):
    // the TAIL-SENSITIVE shape test beside KS (KS sees the one biggest
    // CDF gap, AD integrates the squared gap with 1/(F(1−F)) weighting,
    // so tail divergence counts) on the same declared unit-bin grid.
    // Tie handling is structural: every bin is a tie group, so the
    // midrank form is THE applicable variant. Integer discipline: the
    // doubled midrank cumulants 2M_ij and 2B_j keep every operand
    // BIGINT-exact; each bin's term reduces to l·q²/(N·den) with
    // q = N·2M − nᵢ·2B and den = 2B·(2N−2B) − N·l (the /4s cancel),
    // evaluated in DOUBLE with every operand explicitly cast in the
    // SAME op order on both engines, then the ≤1000-bin term sums are
    // DECIMAL-routed (order-free). Degenerate den ≤ 0 bins (all mass in
    // one bin) dropped on both engines (declared). One fact scan;
    // everything after is bin-bounded.
    "q_stat_ad" -> ((s, dir) => {
      import s.implicits._
      val dec28 = DecimalType(28, 8)
      val wOrd = Window.orderBy($"bin")
      val wExcl = wOrd.rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy()
      cpBins(s, dir)
        .withColumn("l", $"c1" + $"c2")
        .withColumn("m2a",
          lit(2L) * coalesce(sum($"c1").over(wExcl), lit(0L)) + $"c1")
        .withColumn("m2b",
          lit(2L) * coalesce(sum($"c2").over(wExcl), lit(0L)) + $"c2")
        .withColumn("b2",
          lit(2L) * coalesce(sum($"l").over(wExcl), lit(0L)) + $"l")
        .withColumn("na", sum($"c1").over(wAll))
        .withColumn("nb", sum($"c2").over(wAll))
        .withColumn("nn", $"na" + $"nb")
        .withColumn("den", $"b2" * (lit(2L) * $"nn" - $"b2") - $"nn" * $"l")
        .filter($"den" > 0L)
        .withColumn("qa", $"nn".cast("double") * $"m2a".cast("double")
          - $"na".cast("double") * $"b2".cast("double"))
        .withColumn("qb", $"nn".cast("double") * $"m2b".cast("double")
          - $"nb".cast("double") * $"b2".cast("double"))
        .withColumn("ta",
          $"l" * ($"qa" * $"qa") / ($"nn" * $"den".cast("double")))
        .withColumn("tb",
          $"l" * ($"qb" * $"qb") / ($"nn" * $"den".cast("double")))
        .agg(max($"na").as("n1"), max($"nb").as("n2"),
             count(lit(1)).as("n_bins"),
             sum($"ta".cast(dec28)).as("sa"), sum($"tb".cast(dec28)).as("sb"))
        .select($"n1", $"n2", $"n_bins",
          round((($"n1" + $"n2" - lit(1L)).cast("double") / ($"n1" + $"n2")) *
            ($"sa".cast("double") / $"n1" + $"sb".cast("double") / $"n2"), 4)
            .as("a2_akn"))
    }),

    // Kruskal–Wallis H across ALL event types' value distributions —
    // the nonparametric one-way ANOVA (does at least one type's value
    // level differ?), tie-corrected, on the same declared unit-bin grid
    // as q_stat_ks (ties are structural under binning, so the correction
    // matters). Midrank arithmetic stays in BIGINT by carrying DOUBLED
    // ranks: a bin covering positions (c−t, c] has 2·midrank =
    // 2(c−t)+t+1, and the per-type doubled rank sum rr2 = Σ cnt·2r is
    // exact; the ≤5 per-type H terms (rr2/2)²/nᵢ are identical doubles
    // routed through DECIMAL so their sum is order-free. Tie term
    // Σ(t³−t) is BIGINT-exact (t ≤ 1e5 at sf0.1 → t³ ≤ 1e15).
    "q_stat_kruskal" -> ((s, dir) => {
      import s.implicits._
      val bt = t(s, dir, "events")
        .withColumn("bin", binCol)
        .groupBy($"bin", $"event_type")
        .agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val binTot = bt.groupBy($"bin").agg(sum($"c").as("t"))
        .withColumn("cum", sum($"t").over(wCum))
        .withColumn("r2", r2Col($"cum", $"t"))
      val perType = bt.join(binTot.select($"bin", $"r2"), Seq("bin"))
        .groupBy($"event_type")
        .agg(sum($"c").as("n_i"), sum($"c" * $"r2").as("rr2"))
      val gs = perType.agg(
        sum($"n_i").as("n"), count(lit(1)).as("k"),
        sum((($"rr2" / lit(2.0)) * ($"rr2" / lit(2.0)) / $"n_i")
          .cast(DecimalType(38, 6))).cast("double").as("sr"))
      val tie = binTot.agg(
        sum($"t" * $"t" * $"t" - $"t").as("tie3"))
      // n·(n+1) and n³ are DOUBLE-routed: at n beyond ~2e6 the LONG cube
      // overflows (ANSI throw) while the oracle's HUGEINT does not — the
      // q_stat_spearman sqrt(d1)·sqrt(d2) lesson applied to the tie term
      // (identical double ops on identical operands ⇒ parity holds)
      gs.crossJoin(broadcast(tie))
        .withColumn("h", lit(12.0) /
          ($"n".cast("double") * ($"n" + 1L).cast("double")) * $"sr"
          - lit(3.0) * ($"n" + 1L))
        .withColumn("corr_c", lit(1.0) -
          $"tie3".cast("double") /
            ($"n".cast("double") * $"n".cast("double") * $"n".cast("double")
              - $"n".cast("double")))
        // corr_c is exactly 0 when every value lands in a single bin (all
        // ties: tie3 = n³−n) — the corrected statistic is undefined there,
        // so h_corr/eps2 are NULL, not Infinity/NaN (the pearsonR
        // zero-variance convention), declared identically in the oracle
        .select($"n", $"k",
          r4($"h").as("h"),
          when($"corr_c" > 0.0, r4($"h" / $"corr_c")).as("h_corr"),
          when($"corr_c" > 0.0,
            round(($"h" / $"corr_c" - $"k" + 1L) / ($"n" - $"k"), 6)).as("eps2"))
    }),

    // Wilcoxon signed-rank test (Biometrics 1945) — purchase vs click
    // hourly counts PAIRED BY HOUR: the paired twin of q_stat_mwu
    // (pairing by hour removes the shared diurnal cycle the independent
    // test dilutes into variance), completing the nonparametric 2×2
    // (MWU/Kruskal independent; Wilcoxon/Friedman paired/blocked).
    // d = purchases − clicks per hour bucket; zero differences drop (the
    // classical convention — hours with no events of either type are
    // d = 0 and drop with them, so no gap-fill is even needed); doubled
    // midranks over |d| keep everything integer-exact: with W' = 2W the
    // tie-corrected z = (2W' − n(n+1)) / sqrt((2n(n+1)(2n+1) − Σ(t³−t))/3)
    // is exact ints into one double division. One data-sized (hour) hash
    // agg; ranks ride the TIME-BOUNDED difference frame.
    "q_stat_wilcoxon" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .groupBy(expr("unix_micros(ts) div 3600000000").as("hb"))
        .agg((sum(when($"event_type" === "purchase", 1L).otherwise(0L)) -
              sum(when($"event_type" === "click", 1L).otherwise(0L))).as("d"))
        .filter($"d" =!= 0L)
        .withColumn("ad", abs($"d"))
      val wR = Window.orderBy($"ad")
      val wT = Window.partitionBy($"ad")
      val ranked = d
        .withColumn("rx", lit(2L) * (rank().over(wR) - 1L)
          + count(lit(1)).over(wT) + 1L)
      val ties = d.groupBy($"ad").agg(count(lit(1)).as("t"))
        .agg(sum($"t" * $"t" * $"t" - $"t").as("tt"))
      ranked.agg(count(lit(1)).as("n"),
          sum(when($"d" > 0L, $"rx").otherwise(0L)).as("w2"),
          sum(when($"d" > 0L, 1L).otherwise(0L)).as("n_pos"))
        .crossJoin(broadcast(ties))
        .select($"n", $"n_pos",
          ($"w2" / lit(2.0)).as("w_plus"),
          when(lit(2L) * $"n" * ($"n" + 1L) * (lit(2L) * $"n" + 1L) - $"tt" > 0L,
            r4((lit(2L) * $"w2" - $"n" * ($"n" + 1L)).cast("double") /
              sqrt(((lit(2L) * $"n" * ($"n" + 1L) * (lit(2L) * $"n" + 1L)
                - $"tt").cast("double")) / 3.0))).as("z"))
    }),

    // Friedman test (Friedman JASA 1937) — do the event types keep the
    // same activity ORDERING across the 24 hour-of-day blocks? The
    // BLOCKED nonparametric twin of q_stat_kruskal (kruskal = independent
    // groups; friedman ranks WITHIN each block, so a global volume shift
    // per hour cancels — the repeated-measures design). Measurements =
    // the full |types|×24 count lattice (absent cells are real zeros);
    // doubled midranks (2·(rank−1)+ties+1, the spearman discipline) keep
    // every moment integer-exact: with r' = 2r the tie-corrected
    // statistic is χ² = (k−1)·Σⱼ(R'ⱼ−b(k+1))² / (A'−bk(k+1)²) — one
    // exact-int division, round(4); all-tied blocks ⇒ zero denominator ⇒
    // NULL (the kruskal corr_c convention). One data-sized (type,h24)
    // agg; ranks ride windows over the 120-row lattice.
    "q_stat_friedman" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "events")
        .groupBy($"event_type", hour($"ts").cast("long").as("h"))
        .agg(count(lit(1)).as("v"))
      val lattice = counts.select($"event_type").distinct()
        .crossJoin(s.range(0, 24).select($"id".as("h")))
      val wB = Window.partitionBy($"h").orderBy($"v")
      val wTie = Window.partitionBy($"h", $"v")
      val wAll = Window.partitionBy()
      lattice.join(counts, Seq("event_type", "h"), "left")
        .withColumn("v", coalesce($"v", lit(0L)))
        .withColumn("rx", lit(2L) * (rank().over(wB) - 1L)
          + count(lit(1)).over(wTie) + 1L)
        .groupBy($"event_type")
        .agg(sum($"rx").as("rj"), sum($"rx" * $"rx").as("rj2"))
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("dev", $"rj" - lit(24L) * ($"k" + 1L))
        .agg(max($"k").as("kk"), sum($"dev" * $"dev").as("sdev"),
             sum($"rj2").as("a2"))
        .select(lit(24L).as("b"), $"kk".as("k"),
          when($"a2" - lit(24L) * $"kk" * ($"kk" + 1L) * ($"kk" + 1L) > 0L,
            r4((($"kk" - 1L) * $"sdev").cast("double") /
              ($"a2" - lit(24L) * $"kk" * ($"kk" + 1L) * ($"kk" + 1L))
                .cast("double"))).as("chi2"))
    }),

    // Mann–Whitney U between the click and purchase value samples — the
    // two-sample twin of q_stat_kruskal (rank-sum location test; k=2
    // Kruskal–Wallis is its square), with the tie-corrected normal
    // approximation z and the common-language effect size
    // AUC = U₁/(n₁n₂) = P(click value > purchase value) + ½P(tie).
    // Same declared unit-bin grid and doubled-midrank BIGINT discipline:
    // 2·R₁ = Σ c1(b)·r2(b) is exact, so 2·U₁ = 2R₁ − n₁(n₁+1) is an exact
    // BIGINT, and z/auc divide bit-identical operands in mirrored order.
    "q_stat_mwu" -> ((s, dir) => {
      import s.implicits._
      val perBin = cpBins(s, dir).withColumn("t", $"c1" + $"c2")
      val wCum = Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perBin
        .withColumn("cum", sum($"t").over(wCum))
        .withColumn("r2", r2Col($"cum", $"t"))
        .agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
             sum($"c1" * $"r2").as("rr1"),
             sum($"t" * $"t" * $"t" - $"t").as("tie3"))
        .withColumn("u2x", $"rr1" - $"n1" * ($"n1" + 1L))
        .withColumn("sigma2",
          ($"n1" * $"n2").cast("double") / lit(12.0) *
            (($"n1" + $"n2" + 1L).cast("double") -
             $"tie3".cast("double") /
               (($"n1" + $"n2").cast("double") *
                ($"n1" + $"n2" - 1L).cast("double"))))
        .select($"n1", $"n2",
          ($"u2x".cast("double") / lit(2.0)).as("u1"),
          round((($"u2x" - $"n1" * $"n2").cast("double") / lit(2.0)) /
            sqrt($"sigma2"), 4).as("z"),
          round($"u2x".cast("double") /
            (lit(2.0) * ($"n1" * $"n2").cast("double")), 6).as("auc"))
    }),

    // Per-type skewness (g1 = m3/m2^1.5) and excess kurtosis
    // (g2 = m4/m2² − 3) of the value distribution — the shape profile an
    // analyst reads BEFORE choosing tests (heavy tails → the rank/robust
    // keys; near-normal → Welch/BF are exact enough). Computed from the
    // four decimal-exact raw power sums with mirrored expression text —
    // deliberately NOT the engines' built-ins, whose estimator
    // conventions differ (Spark's skewness/kurtosis are population
    // moments, DuckDB's are bias-corrected sample statistics); central
    // moments from identical raw-moment doubles are bit-equal instead.
    // Σx⁴ rides a DECIMAL(38,6) (560⁴ ≈ 1e11 per row — the default
    // 18-digit dsum would overflow its integer part at fixture counts).
    // One fact hash-agg; everything after is per-type scalar arithmetic.
    "q_stat_moments" -> ((s, dir) => momentsFrame(s, dir).orderBy(col("event_type"))),

    // Jarque–Bera normality test (Jarque & Bera, Econ. Lett. 1980) per
    // event type: JB = n/6 · (S² + K²/4) from the SAME round(6)-pinned
    // skewness S and excess kurtosis K the moments key publishes (the
    // pacf discipline — shared substrate, so the two keys can never
    // drift, and parity is identical pinned inputs through one formula
    // text). χ²(2) under normality; the fixture's uniform-ish value
    // column reads as a large JB (platykurtic, K ≈ −1.2), which is the
    // point — the test DETECTS non-normality before a Welch/ANOVA key's
    // normal-theory p-values get trusted. Constant-size after the one
    // shared moment aggregate.
    "q_stat_jarque" -> ((s, dir) => {
      import s.implicits._
      momentsFrame(s, dir)
        .select($"event_type", $"n", $"skewness", $"kurtosis",
          round(($"n" / lit(6.0)) *
            ($"skewness" * $"skewness"
              + $"kurtosis" * $"kurtosis" / lit(4.0)), 4).as("jb"))
        .orderBy($"event_type")
    }),

    // Brown–Forsythe test (Levene with median centers — the robust
    // choice) for equality of the event types' value VARIANCES — the
    // spread-side completion of the test family: Welch compares means,
    // KS shapes, MWU/KW ranks, this one dispersions (heteroscedasticity
    // is what breaks pooled-variance models). One-way ANOVA F over the
    // absolute deviations z = |x − median(type)|: per-type medians
    // round(6)-pinned and broadcast back (the q_anomaly_mad two-pass
    // shape — the fact scan never reshuffles), then F from decimal-exact
    // per-type Σz / Σz² moments: SSB = Σ S1ᵢ²/nᵢ − (ΣS1)²/N and
    // SSW = Σ (S2ᵢ − S1ᵢ²/nᵢ) are sums of ≤|types| identical doubles,
    // DECIMAL-routed so order-free.
    "q_stat_bf" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(round(median($"value"), 6).as("med"))
      val st = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("z", abs($"value" - $"med"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_i"),
             dsum($"z", 6).as("s1"),
             dsum($"z" * $"z", 6).as("s2"))
      st.agg(
          count(lit(1)).as("k"), sum($"n_i").as("n"),
          sum(($"s1" * $"s1" / $"n_i").cast(DecimalType(38, 6)))
            .cast("double").as("sb_part"),
          sum($"s1".cast(DecimalType(38, 6))).cast("double").as("s1_all"),
          sum(($"s2" - $"s1" * $"s1" / $"n_i").cast(DecimalType(38, 6)))
            .cast("double").as("ssw"))
        .withColumn("ssb", $"sb_part" - $"s1_all" * $"s1_all" / $"n")
        .select($"k", $"n",
          ($"k" - 1L).as("df1"), ($"n" - $"k").as("df2"),
          r4(($"ssb" / ($"k" - 1L)) / ($"ssw" / ($"n" - $"k"))).as("f_stat"))
    }),

    // Population stability index per event type between the first and
    // second time-halves of the value distribution — the standard drift
    // monitor a production pipeline runs before trusting a trained
    // filter/model (PSI < 0.1 stable, > 0.25 shifted). Same declared
    // unit-bin grid; halves split at the declared hour midpoint
    // mid = (lo+hi+1) div 2 (exact BIGINT from the hour bounds); add-1
    // smoothing over the type's OBSERVED bin set keeps ln defined with
    // integer-exact operands. Each term's ln is round(6)-pinned BEFORE
    // the multiply (the q_text_lmscore libm-ulp discipline) and the
    // per-type sum is DECIMAL-routed — PSI is bit-stable in both engines.
    "q_stat_psi" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("h", expr("unix_millis(ts) div 3600000"))
        .withColumn("bin", binCol)
      val bounds = ev.agg(min($"h").as("lo"), max($"h").as("hi"))
        .select(expr("(lo + hi + 1) div 2").as("mid"))
      val bt = ev.crossJoin(broadcast(bounds))
        .groupBy($"event_type", $"bin")
        .agg(sum(when($"h" < $"mid", 1L).otherwise(0L)).as("c1"),
             sum(when($"h" >= $"mid", 1L).otherwise(0L)).as("c2"))
      val wt = Window.partitionBy($"event_type")
      bt
        .withColumn("n1", sum($"c1").over(wt))
        .withColumn("n2", sum($"c2").over(wt))
        .withColumn("nb", count(lit(1)).over(wt))
        .withColumn("p1", ($"c1" + 1L).cast("double") / ($"n1" + $"nb"))
        .withColumn("p2", ($"c2" + 1L).cast("double") / ($"n2" + $"nb"))
        .withColumn("term", ($"p1" - $"p2") * round(log($"p1" / $"p2"), 6))
        .groupBy($"event_type")
        .agg(max($"n1").as("n1"), max($"n2").as("n2"),
             max($"nb").as("n_bins"),
             round(sum($"term".cast(DecimalType(28, 12))), 6).cast("double")
               .as("psi"))
        .orderBy($"event_type")
    }),

    // Spearman rank correlation between every pair of event types'
    // hourly count series — the monotone-association matrix over the
    // gap-filled grid (do two activity streams rise and fall together,
    // regardless of scale?). Ranks live on the TIME-BOUNDED grid (one
    // row per (type, hour)), so the per-type rank windows and the
    // hour-keyed pair join are grid-sized at any corpus volume; the one
    // data-sized job is the (hour, type) hash aggregate. Doubled
    // midranks via the window form 2·(rank−1) + ties + 1 keep every
    // power sum BIGINT-exact; ρ divides identical operands (the
    // q_time_xcorr sqrt(d1)·sqrt(d2) form — d1·d2 itself could overflow).
    "q_stat_spearman" -> ((s, dir) => {
      import s.implicits._
      val agg = t(s, dir, "events")
        .withColumn("h", expr("(unix_millis(ts) div 3600000) * 3600000"))
        .groupBy($"h", $"event_type")
        .agg(count(lit(1)).as("c"))
      val grid = agg.agg(min($"h").as("lo"), max($"h").as("hi"))
        .select(explode(expr("sequence(lo, hi, 3600000)")).as("h"))
      val types = agg.select($"event_type").distinct()
      val ser = grid.crossJoin(broadcast(types))
        .join(agg, Seq("h", "event_type"), "left")
        .select($"h", $"event_type", coalesce($"c", lit(0L)).as("c"))
      val wRank = Window.partitionBy($"event_type").orderBy($"c")
      val wTie = Window.partitionBy($"event_type", $"c")
      val ranked = ser
        .withColumn("r2", lit(2L) * (rank().over(wRank) - 1L) +
          count(lit(1)).over(wTie) + 1L)
        .select($"h", $"event_type", $"r2")
      // pair formation WITHOUT a self-join: a self-join would duplicate
      // the whole ranked subtree (two full fact scans); instead fold the
      // ≤|types| per-hour rank rows into one list and explode it twice —
      // each unordered pair appears exactly once via t1 < t2, regardless
      // of collect_list order
      val perHour = ranked.groupBy($"h")
        .agg(collect_list(struct($"event_type", $"r2")).as("lst"))
      perHour
        .select(explode($"lst").as("p1"), $"lst")
        .select($"p1.event_type".as("t1"), $"p1.r2".as("rx"),
                explode($"lst").as("p2"))
        .filter($"t1" < $"p2.event_type")
        .select($"t1", $"p2.event_type".as("t2"), $"rx", $"p2.r2".as("ry"))
        // power sums accumulate in DECIMAL(38,0): sxx ~ 4n³ passes LONG at
        // n ≈ 132k hours (a 15-year grid); decimal keeps the sums exact to
        // n ~ 1e9, and pearsonR's decimal products finish the chain
        .groupBy($"t1", $"t2")
        .agg(count(lit(1)).as("n_hours"),
             sum($"rx".cast(DecimalType(38, 0))).as("sx"),
             sum($"ry".cast(DecimalType(38, 0))).as("sy"),
             sum(($"rx" * $"ry").cast(DecimalType(38, 0))).as("sxy"),
             sum(($"rx" * $"rx").cast(DecimalType(38, 0))).as("sxx"),
             sum(($"ry" * $"ry").cast(DecimalType(38, 0))).as("syy"))
        .select($"t1", $"t2", $"n_hours",
          pearsonR($"n_hours", $"sx", $"sy", $"sxy", $"sxx", $"syy")
            .as("rho"))
        .orderBy($"t1", $"t2")
    }),

    // Kendall τ-b between every pair of event types' DAILY count series —
    // the concordance-based association measure next to Spearman's ρ
    // (τ counts order agreements pair-by-pair, so one wild day moves it
    // by at most 2/n₀ where ρ can swing on a single extreme rank; the
    // tie-corrected τ-b form because a zero-inflated daily grid is all
    // ties). Day pairs are enumerated WITHOUT a self-join of the fact
    // scan: the series folds to one time-bounded list per type pair
    // (≤ grid days) and explodes twice under d1 < d2 — concordant /
    // discordant / tied counts are then BIGINT-exact, and
    // τ-b = (C − D) / (√(n₀−T_x)·√(n₀−T_y)) divides identical integer
    // operands in both engines (the sqrt·sqrt overflow-safe form),
    // round(6), NULL when either tie term consumes all pairs. Scale:
    // the grid is DAILY deliberately — the pair count grows with the
    // time RANGE only (decade ≈ 6.7M day pairs per type pair, never
    // data-sized); past that range the standard swap-in is the
    // O(n log n) merge-inversion count, declared here.
    "q_stat_kendall" -> ((s, dir) => {
      import s.implicits._
      // the (day, type) agg is grid-sized and read THREE times (bounds,
      // type list, gap-fill join) — a lazy local checkpoint collapses all
      // three to one fact scan (the cellMoves idiom; PlanSpec pins it)
      val agg = t(s, dir, "events")
        .withColumn("d", expr("(unix_millis(ts) div 86400000) * 86400000"))
        .groupBy($"d", $"event_type")
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = false)
      val grid = agg.agg(min($"d").as("lo"), max($"d").as("hi"))
        .select(explode(expr("sequence(lo, hi, 86400000)")).as("d"))
      val types = agg.select($"event_type").distinct()
      val ser = grid.crossJoin(broadcast(types))
        .join(agg, Seq("d", "event_type"), "left")
        .select($"d", $"event_type", coalesce($"c", lit(0L)).as("c"))
      val perDay = ser.groupBy($"d")
        .agg(collect_list(struct($"event_type", $"c")).as("lst"))
      val p = perDay
        .select($"d", explode($"lst").as("p1"), $"lst")
        .select($"d", $"p1.event_type".as("t1"), $"p1.c".as("x"),
                explode($"lst").as("p2"))
        .filter($"t1" < $"p2.event_type")
        .select($"t1", $"p2.event_type".as("t2"), $"d", $"x", $"p2.c".as("y"))
      p.groupBy($"t1", $"t2")
        .agg(collect_list(struct($"d", $"x", $"y")).as("lst"))
        .select($"t1", $"t2", explode($"lst").as("a"), $"lst")
        .select($"t1", $"t2", $"a", explode($"lst").as("b"))
        .filter($"a.d" < $"b.d")
        .groupBy($"t1", $"t2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(($"a.x" < $"b.x" && $"a.y" < $"b.y")
            || ($"a.x" > $"b.x" && $"a.y" > $"b.y"), 1L).otherwise(0L)).as("n_conc"),
          sum(when(($"a.x" < $"b.x" && $"a.y" > $"b.y")
            || ($"a.x" > $"b.x" && $"a.y" < $"b.y"), 1L).otherwise(0L)).as("n_disc"),
          sum(when($"a.x" === $"b.x", 1L).otherwise(0L)).as("stx"),
          sum(when($"a.y" === $"b.y", 1L).otherwise(0L)).as("sty"))
        .select($"t1", $"t2", $"n_pairs", $"n_conc", $"n_disc",
          when($"n_pairs" - $"stx" > 0L && $"n_pairs" - $"sty" > 0L,
            round(($"n_conc" - $"n_disc").cast("double") /
              (sqrt(($"n_pairs" - $"stx").cast("double")) *
               sqrt(($"n_pairs" - $"sty").cast("double"))), 6)).as("tau_b"))
        .orderBy($"t1", $"t2")
    }),

    // One-way ANOVA F across the event types' raw value means — the
    // parametric mean-equality test the family was missing (Welch is
    // pairwise, this is the omnibus k-group form), plus the η² = SSB/SST
    // effect size every report quotes next to F. Identical moment
    // machinery to q_stat_bf WITHOUT the median centering: SSB and SSW
    // assemble from decimal-exact per-type (n, Σx, Σx²), and the ≤|types|
    // cross-group combination is DECIMAL-routed so it is order-free. One
    // fact hash-agg total — nothing in the plan grows past |types| rows.
    "q_stat_anova" -> ((s, dir) => {
      import s.implicits._
      val st = t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_i"),
             dsum($"value", 6).as("s1"),
             dsum($"value" * $"value", 6).as("s2"))
      st.agg(
          count(lit(1)).as("k"), sum($"n_i").as("n"),
          sum(($"s1" * $"s1" / $"n_i").cast(DecimalType(38, 6)))
            .cast("double").as("sb_part"),
          sum($"s1".cast(DecimalType(38, 6))).cast("double").as("s1_all"),
          sum(($"s2" - $"s1" * $"s1" / $"n_i").cast(DecimalType(38, 6)))
            .cast("double").as("ssw"))
        .withColumn("ssb", $"sb_part" - $"s1_all" * $"s1_all" / $"n")
        .select($"k", $"n",
          ($"k" - 1L).as("df1"), ($"n" - $"k").as("df2"),
          r4(($"ssb" / ($"k" - 1L)) / ($"ssw" / ($"n" - $"k"))).as("f_stat"),
          r4($"ssb" / ($"ssb" + $"ssw")).as("eta2"))
    }),

    // Per-type OLS trend of the hourly activity series — slope, intercept
    // and r of count-vs-hour-index on the gap-filled grid (the "is this
    // stream growing" line every ops dashboard draws; the closed-form
    // exact twin of m_ml_linreg's iterative fit). x is the hour index
    // from the global grid origin, y the type's hourly count — every
    // power sum is BIGINT-exact and accumulates in DECIMAL(38,0) (the
    // spearman discipline), slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) and
    // intercept = (Σy·Σx² − Σx·Σxy)/(n·Σx² − (Σx)²) divide identical
    // decimal-exact operands, r reuses pearsonR. Grid-bounded like every
    // time-series key: the one data-sized job is the (hour, type) agg.
    "q_stat_ols" -> ((s, dir) => {
      import s.implicits._
      val agg = t(s, dir, "events")
        .withColumn("h", expr("unix_millis(ts) div 3600000"))
        .groupBy($"h", $"event_type")
        .agg(count(lit(1)).as("c"))
      val grid = agg.agg(min($"h").as("lo"), max($"h").as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("h"), $"lo")
      val types = agg.select($"event_type").distinct()
      val ser = grid.crossJoin(broadcast(types))
        .join(agg, Seq("h", "event_type"), "left")
        .select($"event_type", ($"h" - $"lo").as("x"),
                coalesce($"c", lit(0L)).as("y"))
      val dec = DecimalType(38, 0)
      val sums = ser.groupBy($"event_type")
        .agg(count(lit(1)).as("n_hours"),
             sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
             sum(($"x" * $"y").cast(dec)).as("sxy"),
             sum(($"x" * $"x").cast(dec)).as("sxx"),
             sum(($"y" * $"y").cast(dec)).as("syy"))
      sums
        .withColumn("nD", $"n_hours".cast(dec))
        .withColumn("num", $"nD" * $"sxy" - $"sx" * $"sy")
        .withColumn("den", $"nD" * $"sxx" - $"sx" * $"sx")
        .select($"event_type", $"n_hours",
          round($"num".cast("double") / $"den".cast("double"), 6).as("slope"),
          round(($"sy" * $"sxx" - $"sx" * $"sxy").cast("double") /
                $"den".cast("double"), 4).as("intercept"),
          pearsonR($"n_hours", $"sx", $"sy", $"sxy", $"sxx", $"syy").as("r"))
        .orderBy($"event_type")
    }),

    // Kaplan–Meier survival curve (Kaplan & Meier, JASA 1958) — the
    // SURVIVAL family the test suite was missing (means ✓ shapes ✓
    // ranks ✓ variances ✓ trends ✓; time-to-event ✗ until now): time in
    // days from each user's first event to their first high-value
    // purchase (value ≥ 150), censored at the last observed event when
    // it never happens (~53% of users at every SF — both branches
    // genuinely run). Output = the survival step function at event
    // times: (day, risk set, events, censored, Ŝ). Parity discipline:
    // Ŝ = exp(Σ ln(1 − dᵢ/nᵢ)) with each ln round(6)-pinned then
    // DECIMAL-summed cumulatively (the linkpred aa discipline applied
    // through a running window); a day where dᵢ = nᵢ pins Ŝ = 0 exactly
    // from there on (ln(0) never evaluated on either engine). One
    // data-sized (user) agg; everything after is day-range-bounded
    // (≤ observation days rows), so the single-partition windows are
    // bounded the q_roll_mean way.
    "q_stat_km" -> ((s, dir) => {
      import s.implicits._
      val byd = survivalFrame(s, dir).groupBy($"d")
        .agg(sum($"ev").as("n_event"), sum(lit(1L) - $"ev").as("n_cens"))
      val wAll = Window.partitionBy()
      val wPrev = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byd
        .withColumn("total", sum($"n_event" + $"n_cens").over(wAll))
        .withColumn("n_risk", $"total" -
          coalesce(sum($"n_event" + $"n_cens").over(wPrev), lit(0L)))
        .withColumn("term",
          when($"n_event" > 0L && $"n_event" < $"n_risk",
            round(log(lit(1.0) - $"n_event".cast("double") / $"n_risk"), 6)
              .cast(DecimalType(18, 6))))
        .withColumn("dead",
          max(when($"n_event" === $"n_risk", 1L).otherwise(0L)).over(wCum))
        .withColumn("lnsum",
          coalesce(sum($"term").over(wCum), lit(0).cast(DecimalType(18, 6)))
            .cast("double"))
        .filter($"n_event" > 0L)
        .select($"d".as("d_days"), $"n_risk", $"n_event", $"n_cens",
          when($"dead" === 1L, lit(0.0))
            .otherwise(round(exp($"lnsum"), 6)).as("surv"))
        .orderBy($"d_days")
    }),

    // Log-rank test (Mantel 1966) — do the two cohorts' SURVIVAL curves
    // differ? The standard companion of q_stat_km (curve first, test
    // second), comparing users whose first event is a 'view' against the
    // rest on the same time-to-high-value-purchase target. At each event
    // day: observed group-1 events O₁ vs hypergeometric expectation
    // E₁ = d·n₁/n and variance d·(n₁/n)·((n−n₁)/n)·((n−d)/(n−1));
    // χ² = (ΣO₁ − ΣE₁)²/ΣV. Risk sets are exact BIGINT window
    // cumulatives over the day-range-bounded frame; each E/V term is a
    // double from exact-int operands in IDENTICAL op order, round(6)-
    // pinned then DECIMAL-summed (q_stat_psi discipline); the final χ²
    // is one guarded division round(4). Shares survivalFrame with km —
    // one data-sized (user) agg serves both keys.
    "q_stat_logrank" -> ((s, dir) => {
      import s.implicits._
      val byd = survivalFrame(s, dir).groupBy($"d")
        .agg(sum($"ev").as("d_all"),
             sum(when($"grp" === 1L, $"ev").otherwise(0L)).as("d1"),
             count(lit(1)).as("m_all"), sum($"grp").as("m1"))
      val wAll = Window.partitionBy()
      val wPrev = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, -1)
      byd
        .withColumn("tot", sum($"m_all").over(wAll))
        .withColumn("tot1", sum($"m1").over(wAll))
        .withColumn("n", $"tot" - coalesce(sum($"m_all").over(wPrev), lit(0L)))
        .withColumn("n1", $"tot1" - coalesce(sum($"m1").over(wPrev), lit(0L)))
        .filter($"d_all" > 0L)
        .withColumn("e1",
          round($"d_all".cast("double") * $"n1" / $"n", 6)
            .cast(DecimalType(18, 6)))
        .withColumn("v",
          when($"n" > 1L,
            round($"d_all".cast("double") * $"n1" / $"n" *
              ($"n" - $"n1") / $"n" * ($"n" - $"d_all") / ($"n" - 1L), 6))
            .cast(DecimalType(18, 6)))
        .agg(max($"tot1").as("n1_users"),
             (max($"tot") - max($"tot1")).as("n0_users"),
             sum($"d1").as("o1"),
             sum($"e1").cast("double").as("e1d"),
             sum($"v").cast("double").as("vd"))
        .select($"n1_users", $"n0_users", $"o1",
          round($"e1d", 4).as("e1"),
          when($"vd" > 0.0,
            round(($"o1" - $"e1d") * ($"o1" - $"e1d") / $"vd", 4))
            .as("chi2"))
    }),

    // Gini coefficient / Lorenz concentration of customer spend within
    // each market segment — the inequality screen ("do 20% of customers
    // carry 80% of revenue?") a curation pipeline runs before capping or
    // stratifying by account. Uses the exact rank formulation
    // G = 2·Σᵢ i·xᵢ / (n·Σxᵢ) − (n+1)/n over spend sorted ascending with
    // the (spend, custkey) total order breaking ties identically in both
    // engines. Per-customer spend sums in DECIMAL(18,4) (exact), the rank
    // moment Σ i·xᵢ in DECIMAL(38,4) (exact) — the only FP ops are the two
    // final divisions over bit-identical operands. Plan: one orders hash
    // agg, a broadcast-sized customer join, one per-segment window sort —
    // all key-partitioned, nothing driver-sized.
    "q_stat_gini" -> ((s, dir) => {
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      // spend in integer 1e-4 units: decimal-exact sum, then a lossless
      // long — so the rank moment Σ i·xᵢ multiplies integers (DECIMAL(38,0),
      // exact) instead of risking Spark's precision-38 decimal·decimal
      // scale truncation
      val spend = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg((sum($"o_totalprice".cast(DecimalType(18, 4))) * 10000)
          .cast("long").as("spend_l"))
        .join(t(s, dir, "customer")
          .select($"c_custkey".as("o_custkey"), $"c_mktsegment"), Seq("o_custkey"))
      val w = Window.partitionBy($"c_mktsegment").orderBy($"spend_l", $"o_custkey")
      spend.withColumn("i", row_number().over(w).cast("long"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
             sum($"spend_l".cast(dec38)).as("st"),
             sum($"spend_l".cast(dec38) * $"i".cast(dec38)).as("wt"))
        .select($"c_mktsegment", $"n_cust",
          round($"st".cast("double") / 10000.0, 2).as("total_spend"),
          round(lit(2.0) * $"wt".cast("double") /
              ($"n_cust" * $"st".cast("double"))
            - ($"n_cust" + 1L).cast("double") / $"n_cust", 6).as("gini"))
        .orderBy($"c_mktsegment")
    }),

    // Q-Q comparison table — the deciles of the purchase-value distribution
    // against the click-value distribution (the distribution-shift visual
    // the KS test reduces to one number: WHERE do the cohorts diverge, not
    // just whether). Exact interpolated percentiles on both engines (the
    // q_agg_median precedent: Spark percentile() ≡ DuckDB quantile_cont,
    // position q·(n−1) + linear interpolation on the SAME doubles, so the
    // raw quantiles are bit-identical and the gap subtraction is too); all
    // nine deciles come from ONE percentile-array aggregate per cohort —
    // one fact scan into a 2-group agg, a 9-element explode, a 9-row pivot.
    "q_stat_qq" -> ((s, dir) => {
      import s.implicits._
      val qs = (1 to 9).map(i => i / 10.0)
      t(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type")
        .agg(percentile($"value", lit(qs.toArray)).as("vs"))
        .select($"event_type", posexplode($"vs"))
        .groupBy($"pos")
        .agg(max(when($"event_type" === "click", $"col")).as("vc"),
             max(when($"event_type" === "purchase", $"col")).as("vp"))
        .select((($"pos" + 1).cast("double") / 10.0).as("q"),
          r4($"vc").as("v_click"), r4($"vp").as("v_purchase"),
          r4($"vp" - $"vc").as("gap"))
        .orderBy($"q")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stat_qq" ->
      """WITH a AS (
        |  SELECT event_type, quantile_cont(CAST(value AS DOUBLE),
        |      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS vs
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY event_type),
        |e AS (SELECT event_type, unnest(vs) AS v, unnest(range(1, 10)) AS i
        |      FROM a),
        |p AS (SELECT i,
        |        MAX(CASE WHEN event_type = 'click' THEN v END) AS vc,
        |        MAX(CASE WHEN event_type = 'purchase' THEN v END) AS vp
        |      FROM e GROUP BY i)
        |SELECT CAST(i AS DOUBLE) / 10.0 AS q, round(vc, 4) AS v_click,
        |  round(vp, 4) AS v_purchase, round(vp - vc, 4) AS gap
        |FROM p ORDER BY q""".stripMargin,
    "q_stat_gini" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
        |      AS spend_l
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT c_mktsegment, spend_l, o_custkey,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY spend_l, o_custkey) AS BIGINT) AS i
        |  FROM sp JOIN customer ON c_custkey = o_custkey),
        |g AS (
        |  SELECT c_mktsegment, COUNT(*) AS n_cust,
        |    SUM(CAST(spend_l AS DECIMAL(38,0))) AS st,
        |    SUM(CAST(spend_l AS DECIMAL(38,0)) * CAST(i AS DECIMAL(38,0))) AS wt
        |  FROM j GROUP BY c_mktsegment)
        |SELECT c_mktsegment, CAST(n_cust AS BIGINT) AS n_cust,
        |  round(CAST(st AS DOUBLE) / 10000.0, 2) AS total_spend,
        |  round(2.0 * CAST(wt AS DOUBLE) / (n_cust * CAST(st AS DOUBLE))
        |    - CAST(n_cust + 1 AS DOUBLE) / n_cust, 6) AS gini
        |FROM g ORDER BY c_mktsegment""".stripMargin,
    "q_stat_chisq" ->
      """WITH med AS (
        |  SELECT round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
        |  FROM events),
        |cells AS (
        |  SELECT event_type,
        |    CASE WHEN value > (SELECT med FROM med) THEN 1 ELSE 0 END AS hi,
        |    COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, hi, o,
        |    SUM(o) OVER (PARTITION BY event_type) AS r,
        |    SUM(o) OVER (PARTITION BY hi) AS c,
        |    SUM(o) OVER () AS n
        |  FROM cells)
        |SELECT CAST(MAX(n) AS BIGINT) AS n,
        |  CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT hi) - 1)
        |       AS BIGINT) AS dof,
        |  CAST(round(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(18,8))), 4) AS DOUBLE) AS chi2
        |FROM (
        |  SELECT event_type, hi, o, n,
        |    CAST(r AS DOUBLE) * c / n AS e
        |  FROM tot)""".stripMargin,

    "q_stat_wilcoxon" ->
      """WITH d0 AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hb,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) -
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |dd AS (SELECT d, abs(d) AS ad FROM d0 WHERE d <> 0),
        |r AS (
        |  SELECT d,
        |    2 * (rank() OVER (ORDER BY ad) - 1)
        |      + COUNT(*) OVER (PARTITION BY ad) + 1 AS rx
        |  FROM dd),
        |tt AS (
        |  SELECT SUM(t * t * t - t) AS tt
        |  FROM (SELECT COUNT(*) AS t FROM dd GROUP BY ad)),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN d > 0 THEN rx ELSE 0 END) AS BIGINT) AS w2,
        |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM r)
        |SELECT n, n_pos, w2 / 2.0 AS w_plus,
        |  CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - tt > 0
        |    THEN round(CAST(2 * w2 - n * (n + 1) AS DOUBLE) /
        |      sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tt AS DOUBLE) / 3.0), 4)
        |  END AS z
        |FROM a, tt""".stripMargin,

    "q_stat_friedman" ->
      """WITH c AS (
        |  SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
        |    COUNT(*) AS v
        |  FROM events GROUP BY 1, 2),
        |lat AS (
        |  SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) g),
        |f AS (
        |  SELECT l.event_type, l.h, COALESCE(c.v, 0) AS v
        |  FROM lat l LEFT JOIN c ON c.event_type = l.event_type AND c.h = l.h),
        |r AS (
        |  SELECT event_type,
        |    2 * (rank() OVER (PARTITION BY h ORDER BY v) - 1)
        |      + COUNT(*) OVER (PARTITION BY h, v) + 1 AS rx
        |  FROM f),
        |pt AS (
        |  SELECT event_type, SUM(rx) AS rj, SUM(rx * rx) AS rj2
        |  FROM r GROUP BY event_type),
        |wk AS (
        |  SELECT rj, rj2, COUNT(*) OVER () AS k,
        |    rj - 24 * (COUNT(*) OVER () + 1) AS dev
        |  FROM pt),
        |g AS (
        |  SELECT MAX(k) AS kk, SUM(dev * dev) AS sdev, SUM(rj2) AS a2
        |  FROM wk)
        |SELECT CAST(24 AS BIGINT) AS b, CAST(kk AS BIGINT) AS k,
        |  CASE WHEN a2 - 24 * kk * (kk + 1) * (kk + 1) > 0
        |    THEN round(CAST((kk - 1) * sdev AS DOUBLE) /
        |      CAST(a2 - 24 * kk * (kk + 1) * (kk + 1) AS DOUBLE), 4) END AS chi2
        |FROM g""".stripMargin,

    "q_stat_effect" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |mv AS (
        |  SELECT event_type, n, s1 / n AS m,
        |    (s2 - s1 * s1 / n) / (n - 1) AS v
        |  FROM st),
        |pr AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2, a.n AS n1, b.n AS n2,
        |    (a.m - b.m) / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
        |      / (a.n + b.n - 2)) AS d,
        |    (a.m - b.m) / sqrt(a.v) AS gd
        |  FROM mv a JOIN mv b ON a.event_type < b.event_type)
        |SELECT t1, t2, round(d, 4) AS cohen_d,
        |  round(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 4) AS hedges_g,
        |  round(gd, 4) AS glass_delta
        |FROM pr ORDER BY t1, t2""".stripMargin,

    "q_stat_welch" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |mv AS (
        |  SELECT event_type, n, s1 / n AS m,
        |    (s2 - s1 * s1 / n) / (n - 1) AS v
        |  FROM st)
        |SELECT a.event_type AS t1, b.event_type AS t2,
        |  a.n AS n1, b.n AS n2,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
        |  round((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) /
        |        ((a.v / a.n) * (a.v / a.n) / (a.n - 1) +
        |         (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 2) AS dof
        |FROM mv a JOIN mv b ON a.event_type < b.event_type
        |ORDER BY t1, t2""".stripMargin,

    "q_stat_ks" ->
      s"""WITH $cpBinsCte,
        |cum AS (
        |  SELECT bin,
        |    SUM(c1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND CURRENT ROW) AS a1,
        |    SUM(c2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND CURRENT ROW) AS a2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM perbin),
        |top AS (
        |  SELECT n1, n2, abs(a1 * n2 - a2 * n1) AS d, bin
        |  FROM cum ORDER BY d DESC, bin LIMIT 1)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  round(CAST(d AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6) AS ks_d,
        |  bin AS at_bin
        |FROM top""".stripMargin,

    // Doubled-midrank A²akN terms in the identical cast/op order;
    // DECIMAL-routed term sums.
    "q_stat_ad" ->
      s"""WITH $cpBinsCte,
        |cum AS (
        |  SELECT bin, c1, c2, c1 + c2 AS l,
        |    2 * COALESCE(SUM(c1) OVER (ORDER BY bin ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c1 AS m2a,
        |    2 * COALESCE(SUM(c2) OVER (ORDER BY bin ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c2 AS m2b,
        |    2 * COALESCE(SUM(c1 + c2) OVER (ORDER BY bin ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (c1 + c2) AS b2,
        |    SUM(c1) OVER () AS na, SUM(c2) OVER () AS nb
        |  FROM perbin),
        |d AS (
        |  SELECT l, m2a, m2b, b2, na, nb, na + nb AS nn,
        |    b2 * (2 * (na + nb) - b2) - (na + nb) * l AS den
        |  FROM cum),
        |q AS (
        |  SELECT l, na, nb, nn, den,
        |    CAST(nn AS DOUBLE) * CAST(m2a AS DOUBLE)
        |      - CAST(na AS DOUBLE) * CAST(b2 AS DOUBLE) AS qa,
        |    CAST(nn AS DOUBLE) * CAST(m2b AS DOUBLE)
        |      - CAST(nb AS DOUBLE) * CAST(b2 AS DOUBLE) AS qb
        |  FROM d WHERE den > 0),
        |tm AS (
        |  SELECT na, nb,
        |    l * (qa * qa) / (nn * CAST(den AS DOUBLE)) AS ta,
        |    l * (qb * qb) / (nn * CAST(den AS DOUBLE)) AS tb
        |  FROM q),
        |g AS (
        |  SELECT CAST(MAX(na) AS BIGINT) AS n1, CAST(MAX(nb) AS BIGINT) AS n2,
        |    COUNT(*) AS n_bins,
        |    SUM(CAST(ta AS DECIMAL(28,8))) AS sa,
        |    SUM(CAST(tb AS DECIMAL(28,8))) AS sb
        |  FROM tm)
        |SELECT n1, n2, n_bins,
        |  round((CAST(n1 + n2 - 1 AS DOUBLE) / (n1 + n2)) *
        |    (CAST(sa AS DOUBLE) / n1 + CAST(sb AS DOUBLE) / n2), 4) AS a2_akn
        |FROM g""".stripMargin,

    "q_stat_kruskal" ->
      s"""WITH bt AS (
        |  SELECT $binSql AS bin, event_type,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |bintot AS (
        |  SELECT bin, t,
        |    2 * (SUM(t) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND CURRENT ROW) - t) + t + 1 AS r2
        |  FROM (SELECT bin, SUM(c) AS t FROM bt GROUP BY bin) x),
        |pertype AS (
        |  SELECT event_type, SUM(c) AS n_i, SUM(c * r2) AS rr2
        |  FROM bt JOIN bintot USING (bin)
        |  GROUP BY event_type),
        |gs AS (
        |  SELECT SUM(n_i) AS n, COUNT(*) AS k,
        |    CAST(SUM(CAST((rr2 / 2.0) * (rr2 / 2.0) / n_i
        |              AS DECIMAL(38,6))) AS DOUBLE) AS sr
        |  FROM pertype),
        |tie AS (SELECT SUM(t * t * t - t) AS tie3 FROM bintot)
        |SELECT CAST(n AS BIGINT) AS n, k, round(h, 4) AS h,
        |  CASE WHEN corr_c > 0 THEN round(h / corr_c, 4) END AS h_corr,
        |  CASE WHEN corr_c > 0
        |    THEN round((h / corr_c - k + 1) / (n - k), 6) END AS eps2
        |FROM (
        |  SELECT n, k,
        |    12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * sr
        |      - 3.0 * (n + 1) AS h,
        |    1.0 - CAST(tie3 AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE)) AS corr_c
        |  FROM gs, tie) z""".stripMargin,

    "q_stat_mwu" ->
      s"""WITH $cpBinsCte,
        |ranked AS (
        |  SELECT bin, c1, c2, t,
        |    2 * (SUM(t) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND CURRENT ROW) - t) + t + 1 AS r2
        |  FROM (SELECT bin, c1, c2, c1 + c2 AS t FROM perbin) x),
        |gs AS (
        |  SELECT SUM(c1) AS n1, SUM(c2) AS n2, SUM(c1 * r2) AS rr1,
        |    SUM(t * t * t - t) AS tie3
        |  FROM ranked)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(u2x AS DOUBLE) / 2.0 AS u1,
        |  round((CAST(u2x - n1 * n2 AS DOUBLE) / 2.0) / sqrt(sigma2), 4) AS z,
        |  round(CAST(u2x AS DOUBLE) / (2.0 * CAST(n1 * n2 AS DOUBLE)), 6) AS auc
        |FROM (
        |  SELECT n1, n2, rr1 - n1 * (n1 + 1) AS u2x,
        |    CAST(n1 * n2 AS DOUBLE) / 12.0 *
        |      (CAST(n1 + n2 + 1 AS DOUBLE) -
        |       CAST(tie3 AS DOUBLE) /
        |         (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) AS sigma2
        |  FROM gs) z2""".stripMargin,

    "q_stat_moments" ->
      s"""WITH st AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    ${Q.oSum("value", 6)} AS s1,
         |    CAST(SUM(CAST((value * value) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST((value * value * value) AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         |    CAST(SUM(CAST((value * value * value * value) AS DECIMAL(38,6))) AS DOUBLE) AS s4
         |  FROM events GROUP BY event_type),
         |mom AS (
         |  SELECT event_type, n, m,
         |    s2 / n - m * m AS m2,
         |    s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m AS m3,
         |    s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n)
         |      - 3.0 * m * m * m * m AS m4
         |  FROM (SELECT event_type, n, s1, s2, s3, s4, s1 / n AS m FROM st) x)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  round(m, 4) AS mean, round(sqrt(m2), 4) AS stddev,
         |  round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
         |  round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
         |FROM mom ORDER BY event_type""".stripMargin,

    // The moments CTE chain, then JB from the identical round(6)-pinned
    // skewness/kurtosis in identical op order.
    "q_stat_jarque" ->
      s"""WITH st AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    ${Q.oSum("value", 6)} AS s1,
         |    CAST(SUM(CAST((value * value) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         |    CAST(SUM(CAST((value * value * value) AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         |    CAST(SUM(CAST((value * value * value * value) AS DECIMAL(38,6))) AS DOUBLE) AS s4
         |  FROM events GROUP BY event_type),
         |mom AS (
         |  SELECT event_type, n, m,
         |    s2 / n - m * m AS m2,
         |    s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m AS m3,
         |    s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n)
         |      - 3.0 * m * m * m * m AS m4
         |  FROM (SELECT event_type, n, s1, s2, s3, s4, s1 / n AS m FROM st) x),
         |fin AS (
         |  SELECT event_type, CAST(n AS BIGINT) AS n,
         |    round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
         |    round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
         |  FROM mom)
         |SELECT event_type, n, skewness, kurtosis,
         |  round((n / 6.0) * (skewness * skewness
         |    + kurtosis * kurtosis / 4.0), 4) AS jb
         |FROM fin ORDER BY event_type""".stripMargin,

    "q_stat_bf" ->
      s"""WITH med AS (
         |  SELECT event_type,
         |    round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
         |  FROM events GROUP BY event_type),
         |st AS (
         |  SELECT e.event_type, COUNT(*) AS n_i,
         |    ${Q.oSum("abs(e.value - m.med)", 6)} AS s1,
         |    ${Q.oSum("abs(e.value - m.med) * abs(e.value - m.med)", 6)} AS s2
         |  FROM events e JOIN med m ON e.event_type = m.event_type
         |  GROUP BY e.event_type),
         |gs AS (
         |  SELECT COUNT(*) AS k, SUM(n_i) AS n,
         |    CAST(SUM(CAST(s1 * s1 / n_i AS DECIMAL(38,6))) AS DOUBLE) AS sb_part,
         |    CAST(SUM(CAST(s1 AS DECIMAL(38,6))) AS DOUBLE) AS s1_all,
         |    CAST(SUM(CAST(s2 - s1 * s1 / n_i AS DECIMAL(38,6))) AS DOUBLE) AS ssw
         |  FROM st)
         |SELECT k, CAST(n AS BIGINT) AS n,
         |  k - 1 AS df1, CAST(n - k AS BIGINT) AS df2,
         |  round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat
         |FROM (SELECT k, n, sb_part - s1_all * s1_all / n AS ssb, ssw FROM gs) z""".stripMargin,

    "q_stat_psi" ->
      s"""WITH ev AS (
        |  SELECT event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS h,
        |    $binSql AS bin
        |  FROM events),
        |mid AS (SELECT (MIN(h) + MAX(h) + 1) // 2 AS mid FROM ev),
        |bt AS (
        |  SELECT event_type, bin,
        |    SUM(CASE WHEN h < mid THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN h >= mid THEN 1 ELSE 0 END) AS c2
        |  FROM ev, mid GROUP BY event_type, bin),
        |wt AS (
        |  SELECT event_type, c1, c2,
        |    SUM(c1) OVER (PARTITION BY event_type) AS n1,
        |    SUM(c2) OVER (PARTITION BY event_type) AS n2,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nb
        |  FROM bt),
        |terms AS (
        |  SELECT event_type, n1, n2, nb,
        |    (p1 - p2) * round(ln(p1 / p2), 6) AS term
        |  FROM (
        |    SELECT event_type, n1, n2, nb,
        |      CAST(c1 + 1 AS DOUBLE) / (n1 + nb) AS p1,
        |      CAST(c2 + 1 AS DOUBLE) / (n2 + nb) AS p2
        |    FROM wt) x)
        |SELECT event_type, CAST(MAX(n1) AS BIGINT) AS n1,
        |  CAST(MAX(n2) AS BIGINT) AS n2, MAX(nb) AS n_bins,
        |  CAST(round(SUM(CAST(term AS DECIMAL(28,12))), 6) AS DOUBLE) AS psi
        |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stat_spearman" ->
      s"""WITH agg AS (
        |  SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 AS h,
        |    event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT unnest(generate_series(
        |    (SELECT MIN(h) FROM agg), (SELECT MAX(h) FROM agg),
        |    3600000)) AS h),
        |types AS (SELECT DISTINCT event_type FROM agg),
        |ser AS (
        |  SELECT grid.h, types.event_type, COALESCE(agg.c, 0) AS c
        |  FROM grid CROSS JOIN types
        |  LEFT JOIN agg ON grid.h = agg.h AND types.event_type = agg.event_type),
        |ranked AS (
        |  SELECT h, event_type,
        |    2 * (RANK() OVER (PARTITION BY event_type ORDER BY c) - 1)
        |      + COUNT(*) OVER (PARTITION BY event_type, c) + 1 AS r2
        |  FROM ser),
        |pairs AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2, a.r2 AS rx, b.r2 AS ry
        |  FROM ranked a JOIN ranked b
        |    ON a.h = b.h AND a.event_type < b.event_type),
        |st AS (
        |  SELECT t1, t2, COUNT(*) AS n_hours,
        |    SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
        |    SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
        |  FROM pairs GROUP BY t1, t2)
        |SELECT t1, t2, n_hours,
        |  ${Q.oPearson()} AS rho
        |FROM (
        |  SELECT t1, t2, n_hours,
        |    n_hours * sxy - sx * sy AS num,
        |    n_hours * sxx - sx * sx AS d1,
        |    n_hours * syy - sy * sy AS d2
        |  FROM st) z
        |ORDER BY t1, t2""".stripMargin,

    "q_stat_kendall" ->
      """WITH agg AS (
        |  SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) * 86400000 AS d,
        |    event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT unnest(generate_series(
        |    (SELECT MIN(d) FROM agg), (SELECT MAX(d) FROM agg),
        |    86400000)) AS d),
        |types AS (SELECT DISTINCT event_type FROM agg),
        |ser AS (
        |  SELECT grid.d, types.event_type, COALESCE(agg.c, 0) AS c
        |  FROM grid CROSS JOIN types
        |  LEFT JOIN agg ON grid.d = agg.d AND types.event_type = agg.event_type),
        |p AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2, a.d, a.c AS x, b.c AS y
        |  FROM ser a JOIN ser b
        |    ON a.d = b.d AND a.event_type < b.event_type),
        |j AS (
        |  SELECT p1.t1, p1.t2,
        |    CASE WHEN (p1.x < p2.x AND p1.y < p2.y)
        |           OR (p1.x > p2.x AND p1.y > p2.y) THEN 1 ELSE 0 END AS conc,
        |    CASE WHEN (p1.x < p2.x AND p1.y > p2.y)
        |           OR (p1.x > p2.x AND p1.y < p2.y) THEN 1 ELSE 0 END AS disc,
        |    CASE WHEN p1.x = p2.x THEN 1 ELSE 0 END AS tx,
        |    CASE WHEN p1.y = p2.y THEN 1 ELSE 0 END AS ty
        |  FROM p p1 JOIN p p2
        |    ON p1.t1 = p2.t1 AND p1.t2 = p2.t2 AND p1.d < p2.d),
        |g AS (
        |  SELECT t1, t2, COUNT(*) AS n_pairs,
        |    CAST(SUM(conc) AS BIGINT) AS n_conc,
        |    CAST(SUM(disc) AS BIGINT) AS n_disc,
        |    CAST(SUM(tx) AS BIGINT) AS stx,
        |    CAST(SUM(ty) AS BIGINT) AS sty
        |  FROM j GROUP BY t1, t2)
        |SELECT t1, t2, n_pairs, n_conc, n_disc,
        |  CASE WHEN n_pairs - stx > 0 AND n_pairs - sty > 0 THEN
        |    round(CAST(n_conc - n_disc AS DOUBLE) /
        |      (sqrt(CAST(n_pairs - stx AS DOUBLE)) *
        |       sqrt(CAST(n_pairs - sty AS DOUBLE))), 6) END AS tau_b
        |FROM g ORDER BY t1, t2""".stripMargin,

    "q_stat_anova" ->
      s"""WITH st AS (
         |  SELECT event_type, COUNT(*) AS n_i,
         |    ${Q.oSum("value", 6)} AS s1,
         |    ${Q.oSum("value * value", 6)} AS s2
         |  FROM events GROUP BY event_type),
         |gs AS (
         |  SELECT COUNT(*) AS k, SUM(n_i) AS n,
         |    CAST(SUM(CAST(s1 * s1 / n_i AS DECIMAL(38,6))) AS DOUBLE) AS sb_part,
         |    CAST(SUM(CAST(s1 AS DECIMAL(38,6))) AS DOUBLE) AS s1_all,
         |    CAST(SUM(CAST(s2 - s1 * s1 / n_i AS DECIMAL(38,6))) AS DOUBLE) AS ssw
         |  FROM st)
         |SELECT k, CAST(n AS BIGINT) AS n,
         |  k - 1 AS df1, CAST(n - k AS BIGINT) AS df2,
         |  round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat,
         |  round(ssb / (ssb + ssw), 4) AS eta2
         |FROM (SELECT k, n, sb_part - s1_all * s1_all / n AS ssb, ssw FROM gs) z""".stripMargin,

    "q_stat_ols" ->
      s"""WITH agg AS (
        |  SELECT event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS h, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM agg),
        |grid AS (
        |  SELECT unnest(generate_series(
        |    (SELECT lo FROM bounds), (SELECT hi FROM bounds))) AS h),
        |types AS (SELECT DISTINCT event_type FROM agg),
        |ser AS (
        |  SELECT t.event_type, g.h - (SELECT lo FROM bounds) AS x,
        |    COALESCE(a.c, 0) AS y
        |  FROM grid g CROSS JOIN types t
        |  LEFT JOIN agg a ON a.h = g.h AND a.event_type = t.event_type),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n_hours,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM ser GROUP BY event_type)
        |SELECT event_type, n_hours,
        |  round(CAST(num AS DOUBLE) / CAST(d1 AS DOUBLE), 6) AS slope,
        |  round(CAST(ic AS DOUBLE) / CAST(d1 AS DOUBLE), 4) AS intercept,
        |  ${Q.oPearson()} AS r
        |FROM (
        |  SELECT event_type, n_hours,
        |    n_hours * sxy - sx * sy AS num,
        |    n_hours * sxx - sx * sx AS d1,
        |    n_hours * syy - sy * sy AS d2,
        |    sy * sxx - sx * sxy AS ic
        |  FROM st) z
        |ORDER BY event_type""".stripMargin,

    "q_stat_km" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |per AS (
        |  SELECT user_id, min(ts_us) AS t0,
        |    min(CASE WHEN event_type = 'purchase' AND value >= 150
        |        THEN ts_us END) AS tp,
        |    max(ts_us) AS tl
        |  FROM e GROUP BY user_id),
        |pd AS (
        |  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
        |              ELSE (tl - t0) // 86400000000 END AS d,
        |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM per),
        |byd AS (
        |  SELECT d, CAST(SUM(ev) AS BIGINT) AS n_event,
        |         CAST(SUM(1 - ev) AS BIGINT) AS n_cens
        |  FROM pd GROUP BY d),
        |st AS (
        |  SELECT d, n_event, n_cens,
        |    CAST(SUM(n_event + n_cens) OVER () AS BIGINT)
        |      - CAST(COALESCE(SUM(n_event + n_cens) OVER (ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n_risk
        |  FROM byd),
        |s2 AS (
        |  SELECT *,
        |    CASE WHEN n_event > 0 AND n_event < n_risk
        |      THEN CAST(round(ln(1.0 - CAST(n_event AS DOUBLE) / n_risk), 6)
        |           AS DECIMAL(18,6)) END AS term,
        |    MAX(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY d
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |  FROM st),
        |s3 AS (
        |  SELECT d, n_risk, n_event, n_cens, dead,
        |    CAST(COALESCE(SUM(term) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |      AS DOUBLE) AS lnsum
        |  FROM s2)
        |SELECT d AS d_days, n_risk, n_event, n_cens,
        |  CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END AS surv
        |FROM s3 WHERE n_event > 0 ORDER BY d_days""".stripMargin,

    // The cohort is the q_sample_split md5 nibble — balanced and
    // non-empty at every SF by construction.
    "q_stat_logrank" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |per AS (
        |  SELECT user_id, min(ts_us) AS t0,
        |    min(CASE WHEN event_type = 'purchase' AND value >= 150
        |        THEN ts_us END) AS tp,
        |    max(ts_us) AS tl
        |  FROM e GROUP BY user_id),
        |pd AS (
        |  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
        |              ELSE (tl - t0) // 86400000000 END AS d,
        |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |           THEN 1 ELSE 0 END AS grp
        |  FROM per),
        |byd AS (
        |  SELECT d, CAST(SUM(ev) AS BIGINT) AS d_all,
        |    CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(COUNT(*) AS BIGINT) AS m_all,
        |    CAST(SUM(grp) AS BIGINT) AS m1
        |  FROM pd GROUP BY d),
        |st AS (
        |  SELECT d, d_all, d1,
        |    CAST(SUM(m_all) OVER () AS BIGINT) AS tot,
        |    CAST(SUM(m1) OVER () AS BIGINT) AS tot1,
        |    CAST(SUM(m_all) OVER () AS BIGINT)
        |      - CAST(COALESCE(SUM(m_all) OVER (ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n,
        |    CAST(SUM(m1) OVER () AS BIGINT)
        |      - CAST(COALESCE(SUM(m1) OVER (ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n1
        |  FROM byd),
        |tm AS (
        |  SELECT tot, tot1, d1,
        |    CAST(round(CAST(d_all AS DOUBLE) * n1 / n, 6)
        |      AS DECIMAL(18,6)) AS e1,
        |    CASE WHEN n > 1
        |      THEN CAST(round(CAST(d_all AS DOUBLE) * n1 / n
        |        * (n - n1) / n * (n - d_all) / (n - 1), 6)
        |        AS DECIMAL(18,6)) END AS v
        |  FROM st WHERE d_all > 0),
        |ag AS (
        |  SELECT MAX(tot1) AS n1_users, MAX(tot) - MAX(tot1) AS n0_users,
        |    CAST(SUM(d1) AS BIGINT) AS o1,
        |    CAST(SUM(e1) AS DOUBLE) AS e1d, CAST(SUM(v) AS DOUBLE) AS vd
        |  FROM tm)
        |SELECT CAST(n1_users AS BIGINT) AS n1_users,
        |  CAST(n0_users AS BIGINT) AS n0_users, o1,
        |  round(e1d, 4) AS e1,
        |  CASE WHEN vd > 0
        |    THEN round((o1 - e1d) * (o1 - e1d) / vd, 4) END AS chi2
        |FROM ag""".stripMargin
  )
}
