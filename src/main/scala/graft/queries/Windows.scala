package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.5 — window-function suite (the trajectory-op substrate:
  * prev-point deltas, running totals, per-entity ranking).
  *
  * Every window over data rows is keyed on a partition column (customer/
  * user for the keyed queries; a value-derived bucket for the global-order
  * analytics), so at 100 TB the single shuffle per query distributes
  * evenly. No data-scale global-order window appears anywhere (it would
  * serialize onto one task); the only unpartitioned windows run over
  * constant-size bucket-stats rows. Running sums go through DECIMAL:
  * engines disagree on windowed double accumulation order (segment trees
  * vs sequential), decimal is exact under both. */
object Windows extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_win_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
                row_number().over(w).cast("long").as("rn"),
                rank().over(w).cast("long").as("rk"),
                dense_rank().over(w).cast("long").as("drk"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_win_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
                round(sum($"o_totalprice".cast("decimal(18,4)")).over(w), 4)
                  .cast("double").as("running_rev"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Emits the exact integer gap SUM, not round(sum/count, 4): at sf0.1
    // the average gap is ~5e10 µs, and 4 decimals there is 16 significant
    // digits — past double precision, where Spark (rounds the shortest
    // decimal repr) and DuckDB (rounds the binary value) split on the last
    // digit. Found by the round-7 sf0.1 parity sweep; same class as the
    // q_roll_mean midpoint trap, same fix (the caller divides if it wants
    // the average — sum and count are both exact).
    "q_win_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
        .groupBy($"user_id")
        .agg(sum($"gap_us").as("sum_gap_us"),
             count($"gap_us").as("n_gaps"))
        .orderBy($"user_id")
    }),

    "q_win_range" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"ts_ms")
        .rangeBetween(-2592000000L, 0) // 30 days in ms
      t(s, dir, "orders")
        .withColumn("ts_ms", unix_millis($"o_orderdate".cast("timestamp")))
        .select($"o_custkey", $"o_orderkey", count(lit(1)).over(w).as("n_30d"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Global-order analytics WITHOUT a global window: value-derived buckets
    // (floor(acctbal/500) — monotone in the sort key, ~22 buckets over the
    // fixture's value range) carry local row_numbers; global offsets come
    // from per-bucket counts. The only unpartitioned windows left run over
    // the BUCKET-STATS rows (constant-size, data-independent), never over
    // data rows. ntile/percent_rank/cume_dist are then pure arithmetic on
    // the global row number (the (acctbal, custkey) order is total, so
    // rank = row_number).
    "q_win_analytic" -> ((s, dir) => {
      import s.implicits._
      val bucketed = t(s, dir, "customer")
        .withColumn("b", floor($"c_acctbal" / 500.0).cast("long"))
      val wLocal = Window.partitionBy($"b").orderBy($"c_acctbal", $"c_custkey")
      // Explicit single partition: these two windows see only the ~22
      // bucket-stats rows, so one task is the design, not an accident. The
      // key is constant-VALUED but non-foldable ($"b" * 0 — the optimizer
      // cannot fold it because b could be null), so EliminateWindowPartitions
      // does not strip it back to an unpartitioned window.
      val wPrev  = Window.partitionBy($"b" * 0).orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll   = Window.partitionBy($"b" * 0).orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val stats = bucketed.groupBy($"b").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum($"cnt").over(wPrev), lit(0L)))
        .withColumn("n", sum($"cnt").over(wAll))
        .select($"b", $"off", $"n")
      bucketed
        .withColumn("lrn", row_number().over(wLocal).cast("long"))
        .join(broadcast(stats), Seq("b"))
        .withColumn("rn", $"off" + $"lrn")
        .withColumn("q", expr("n div 4"))
        .withColumn("r", $"n" % 4)
        // SQL ntile: first r tiles get q+1 rows, the rest q.
        .withColumn("quartile",
          when($"rn" <= ($"q" + 1) * $"r", expr("(rn + q) div (q + 1)"))
            .otherwise(expr("r + (rn - (q + 1) * r + greatest(q, 1) - 1) div greatest(q, 1)")))
        .select($"c_custkey",
                $"quartile".cast("long").as("quartile"),
                r4(when($"n" > 1, ($"rn" - 1).cast("double") / ($"n" - 1))
                  .otherwise(lit(0.0))).as("pct_rank"),
                r4($"rn".cast("double") / $"n").as("cume"))
        .orderBy($"c_custkey")
    }),

    // Ratio-to-report: each order's share of its customer's total spend.
    // The window denominator is the DECIMAL-exact per-customer sum (double
    // window sums accumulate in engine-specific order — the q_roll_mean
    // lesson); the per-row quotient then divides identical doubles and
    // r4 at ≤1 magnitude is far from the 16-digit cliff.
    "q_win_ratio" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
      t(s, dir, "orders")
        .withColumn("tot",
          sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey",
                r4($"o_totalprice" / $"tot").as("share"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_win_firstlast" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .select($"user_id",
                first($"event_type").over(w).as("first_type"),
                last($"event_type").over(w).as("last_type"))
        .distinct()
        .orderBy($"user_id")
    }),

    // Distribution-family windows (r9): ntile quartiles + percent_rank +
    // cume_dist per order priority — the "where does this order sit in
    // its class" analytics. The window ORDER is made total (price, key),
    // so rank is unique and percent_rank/cume_dist are the same integer
    // ratios in both engines — identical double division, round(6) only
    // guards display. Partitioned on o_orderpriority: one keyed shuffle.
    "q_win_distribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderkey",
                ntile(4).over(w).cast("long").as("quartile"),
                round(percent_rank().over(w), 6).as("pr"),
                round(cume_dist().over(w), 6).as("cd"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_rev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_lag" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS gap_us
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
        |  COUNT(gap_us) AS n_gaps
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_win_range" ->
      """SELECT o_custkey, o_orderkey,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
        |    RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW) AS n_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_analytic" ->
      """SELECT c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_win_ratio" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (PARTITION BY o_custkey) AS DOUBLE), 4) AS share
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_firstlast" ->
      """SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,

    "q_win_distribution" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin
  )
}
