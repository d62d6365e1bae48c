package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.2 — projection/filter/predicates. All predicates are plain
  * `Column` expressions so Catalyst pushes them into the parquet scan
  * (`PushedFilters` in explain) — row groups whose min/max miss the
  * predicate are skipped entirely, the key scan-side win at 100 TB. */
object Filters extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    // TPC-H Q6 shape: tight scan-side predicate, single-row answer.
    "q_filter_pred" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                $"l_discount".between(0.02, 0.09) &&
                $"l_quantity" < 24)
        .agg(dsumR($"l_extendedprice" * $"l_discount", 4, 6).as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    "q_filter_in_like" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH") &&
                $"o_orderstatus".like("F%"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    // NULL-logic suite: negative balances → NULL → sentinel bucket.
    "q_filter_null" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .withColumn("bal", when($"c_acctbal" < 0, lit(null)).otherwise($"c_acctbal"))
        .withColumn("bucket",
          coalesce(floor($"bal" / 1000).cast("long"), lit(-1L)))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_cust"),
             count($"bal").as("n_nonnull"),
             dsumR(coalesce($"bal", lit(0.0)), 4).as("sum_bal"))
        .orderBy($"bucket")
    }),

    // Telemetry cleaning: bound + finiteness checks, kept/dropped per type.
    "q_filter_clean" -> ((s, dir) => {
      import s.implicits._
      val keep = $"value".isNotNull && !isnan($"value") && $"value".between(1.0, 250.0)
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(when(keep, 1)).as("n_kept"),
             count(when(!keep, 1)).as("n_dropped"),
             dsumR(when(keep, $"value"), 4, 6).as("sum_kept"))
        .orderBy($"event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_filter_pred" ->
      s"""SELECT ${oSumR("l_extendedprice * l_discount", 4, 6)} AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.02 AND 0.09
         |  AND l_quantity < 24""".stripMargin,

    "q_filter_in_like" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus LIKE 'F%'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_filter_null" ->
      s"""WITH c AS (
         |  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
         |  FROM customer)
         |SELECT coalesce(CAST(floor(bal / 1000) AS BIGINT), -1) AS bucket,
         |  COUNT(*) AS n_cust,
         |  COUNT(bal) AS n_nonnull,
         |  ${oSumR("coalesce(bal, 0.0)", 4)} AS sum_bal
         |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_filter_clean" ->
      s"""SELECT event_type,
         |  COUNT(*) FILTER (WHERE value IS NOT NULL AND NOT isnan(value)
         |                     AND value BETWEEN 1.0 AND 250.0) AS n_kept,
         |  COUNT(*) FILTER (WHERE NOT (value IS NOT NULL AND NOT isnan(value)
         |                     AND value BETWEEN 1.0 AND 250.0)) AS n_dropped,
         |  ${oSumR("CASE WHEN value IS NOT NULL AND NOT isnan(value) AND value BETWEEN 1.0 AND 250.0 THEN value END", 4, 6)} AS sum_kept
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
