package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** SURVEY §2.11b adjunct — the hypothesis-test statistics an analyst runs
  * before trusting the mining keys: χ² independence (is event mix related
  * to value level?) and pairwise Welch t (do two event types move the same
  * value mean?). Both reduce the fact scan to a tiny exact-count /
  * decimal-sum aggregate first; every later arithmetic step runs on
  * operands that are bit-identical in both engines (integer counts,
  * decimal-routed sums, round-pinned medians), so the statistics
  * hash-match without any tolerance.
  *
  * Scale shape: one hash aggregate over the facts each; everything after
  * operates on ≤|types|² rows (window sums / self-join on a 5-row frame —
  * broadcast by size). Nothing driver-sized, nothing quadratic in data.
  */
object Stats extends QueryGroup {

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
             r4(sum($"term".cast(DecimalType(18, 8))).cast("double")).as("chi2"))
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
      val perBin = t(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .withColumn("bin", least(floor($"value").cast("long"), lit(999L)))
        .groupBy($"bin")
        .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
             sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
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
        .withColumn("bin", least(floor($"value").cast("long"), lit(999L)))
        .groupBy($"bin", $"event_type")
        .agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val binTot = bt.groupBy($"bin").agg(sum($"c").as("t"))
        .withColumn("cum", sum($"t").over(wCum))
        .withColumn("r2", lit(2L) * ($"cum" - $"t") + $"t" + 1L)
      val perType = bt.join(binTot.select($"bin", $"r2"), Seq("bin"))
        .groupBy($"event_type")
        .agg(sum($"c").as("n_i"), sum($"c" * $"r2").as("rr2"))
      val gs = perType.agg(
        sum($"n_i").as("n"), count(lit(1)).as("k"),
        sum((($"rr2" / lit(2.0)) * ($"rr2" / lit(2.0)) / $"n_i")
          .cast(DecimalType(38, 6))).cast("double").as("sr"))
      val tie = binTot.agg(
        sum($"t" * $"t" * $"t" - $"t").as("tie3"))
      gs.crossJoin(broadcast(tie))
        .withColumn("h", lit(12.0) / ($"n" * ($"n" + 1L)) * $"sr"
          - lit(3.0) * ($"n" + 1L))
        .withColumn("corr_c", lit(1.0) -
          $"tie3".cast("double") / ($"n" * $"n" * $"n" - $"n").cast("double"))
        .select($"n", $"k",
          r4($"h").as("h"),
          r4($"h" / $"corr_c").as("h_corr"),
          round(($"h" / $"corr_c" - $"k" + 1L) / ($"n" - $"k"), 6).as("eps2"))
    })
  )

  val oracle: Map[String, String] = Map(
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
        |  round(CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(18,8)))
        |             AS DOUBLE), 4) AS chi2
        |FROM (
        |  SELECT event_type, hi, o, n,
        |    CAST(r AS DOUBLE) * c / n AS e
        |  FROM tot)""".stripMargin,

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
      """WITH perbin AS (
        |  SELECT least(CAST(floor(value) AS BIGINT), 999) AS bin,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
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

    "q_stat_kruskal" ->
      """WITH bt AS (
        |  SELECT least(CAST(floor(value) AS BIGINT), 999) AS bin, event_type,
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
        |  round(h / corr_c, 4) AS h_corr,
        |  round((h / corr_c - k + 1) / (n - k), 6) AS eps2
        |FROM (
        |  SELECT n, k,
        |    12.0 / (n * (n + 1)) * sr - 3.0 * (n + 1) AS h,
        |    1.0 - CAST(tie3 AS DOUBLE) / CAST(n * n * n - n AS DOUBLE) AS corr_c
        |  FROM gs, tie) z""".stripMargin
  )
}
