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

  /** Exact-sum average of a double expression, as DOUBLE. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  def r4(c: Column): Column = round(c, 4)
  def r3(c: Column): Column = round(c, 3)
  def r2(c: Column): Column = round(c, 2)

  /** Oracle-side mirror of [[dsum]]. */
  def oSum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side mirror of [[davg]]. */
  def oAvg(expr: String, scale: Int = 4): String =
    s"(${oSum(expr, scale)} / COUNT($expr))"
}
