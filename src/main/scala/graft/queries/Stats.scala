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
        |ORDER BY t1, t2""".stripMargin
  )
}
