package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One group of contract queries from SURVEY.md §2. `queries` keys and
  * `oracle` keys line up; oracle-less keys are property-tested instead. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Determinism helpers shared by every contract query (SURVEY §2 rules).
  *
  * FP-parity strategy: double summation order differs between Spark's
  * partial/final aggregates and DuckDB's, and at sums of magnitude ~1e8 the
  * order-dependent error (~1e-3) exceeds a round(4) tolerance. So sums of
  * money-like doubles are routed through DECIMAL: the per-row double→decimal
  * cast is deterministic and identical in both engines (ties are impossible —
  * no double's exact expansion ends at a decimal midpoint), decimal summation
  * is exact regardless of order, and the final decimal→double cast is again
  * deterministic. This also is the correct 100 TB answer: exact partial
  * aggregation, no precision drift with data volume.
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(spark, dir, name)

  /** Exact (decimal-backed) sum of a double expression, as DOUBLE. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Tie-safe ROUNDED exact sum (SURVEY §2 determinism rule 7): round in
    * the DECIMAL domain — half-away-from-zero in BOTH engines — THEN cast
    * to double. The old `round(dsum(x), d)` shape rounds AFTER the double
    * conversion, and an exact decimal sum landing on a 5·10⁻ᵈ⁻¹ tie then
    * resolves differently per engine (Spark rounds the shortest double
    * string with BigDecimal HALF_UP, DuckDB rounds in double arithmetic —
    * the q_traj_entropy one-ulp flake, r14). Values are identical off-tie;
    * ties become deterministic. [[oSumR]] is the oracle mirror. */
  def dsumR(c: Column, digits: Int, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(18, scale))), digits).cast(DoubleType)

  /** Exact-sum average of a double expression, as DOUBLE. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  def r4(c: Column): Column = round(c, 4)
  def r3(c: Column): Column = round(c, 3)
  def r2(c: Column): Column = round(c, 2)

  /** Pearson r from five integer-exact power sums, in the overflow-safe
    * sqrt(d1)·sqrt(d2) form (d1·d2 itself can exceed any fixed width);
    * NULL when either variance term is 0. The n·sxy / n·sxx products run
    * in DECIMAL(38,0) — exact integer math matching DuckDB's HUGEINT, so
    * spearman's doubled-midrank sums (sxx ~ 4n³ → n·sxx ~ 4n⁴, past LONG
    * at n ≈ 38k hours) stay exact to n ≈ 1e9. ONE definition for every
    * correlation key (q_time_acf/xcorr, q_stat_spearman) so the tail can
    * never drift. */
  def pearsonR(n: Column, sx: Column, sy: Column,
               sxy: Column, sxx: Column, syy: Column,
               scale: Int = 4): Column = {
    val dec = DecimalType(38, 0)
    val (nD, sxD, syD) = (n.cast(dec), sx.cast(dec), sy.cast(dec))
    val num = nD * sxy.cast(dec) - sxD * syD
    val d1 = nD * sxx.cast(dec) - sxD * sxD
    val d2 = nD * syy.cast(dec) - syD * syD
    when(d1 > lit(0) && d2 > lit(0),
      round(num.cast(DoubleType) /
        (sqrt(d1.cast(DoubleType)) * sqrt(d2.cast(DoubleType))), scale))
  }

  /** Oracle-side mirror of [[pearsonR]]: the CASE tail over a subquery
    * exposing `num`, `d1`, `d2` columns. */
  def oPearson(scale: Int = 4): String =
    s"CASE WHEN d1 > 0 AND d2 > 0 THEN round(CAST(num AS DOUBLE) / " +
      s"(sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))), $scale) END"

  /** Oracle-side mirror of [[dsum]]. */
  def oSum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side mirror of [[dsumR]] — DuckDB's decimal `round()` is also
    * half-away-from-zero (its decimal→decimal CAST truncates, so only
    * round() works — probed r14). */
  def oSumR(expr: String, digits: Int, scale: Int = 4): String =
    s"CAST(round(SUM(CAST(($expr) AS DECIMAL(18,$scale))), $digits) AS DOUBLE)"

  /** Oracle-side mirror of [[davg]]. */
  def oAvg(expr: String, scale: Int = 4): String =
    s"(${oSum(expr, scale)} / COUNT($expr))"
}
