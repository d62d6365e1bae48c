package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline observability via Spark's `observe` API: named
  * aggregates evaluated DURING the job that produces the data — row
  * counts, null rates, value bounds — collected from the driver's
  * listener events. At 100 TB this is the only affordable way to get
  * data-quality counters: a separate metrics query would re-scan the
  * input, and an accumulator-based hand-rolled version loses exactly-once
  * semantics under task retries (observed metrics are tied to successful
  * task commits, accumulators are not).
  *
  * Works identically on batch (`QueryExecutionListener` →
  * `observedMetrics`) and streaming (`StreamingQueryProgress
  * .observedMetrics` per micro-batch) — one declaration, both engines'
  * monitoring paths.
  */
object Observe {

  /** Standard quality metrics for a set of columns: total rows plus a
    * null count per column — the FK-orphan/missing-field counters of
    * q_audit_fk, attached to an existing job instead of running as one. */
  def qualityMetrics(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
