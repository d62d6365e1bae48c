package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.3 — join suite.
  *
  * Scale notes baked into each shape: fact⋈fact goes through AQE-managed
  * shuffled hash/sort-merge on the join key; every dim side small enough to
  * fit an executor gets an explicit `broadcast()` hint so no shuffle of the
  * fact side is needed; the as-of join is formulated as a window over a
  * single (user_id) shuffle instead of a point-in-time join (one shuffle,
  * no N² candidate pairs); the interval join broadcasts the interval side
  * (BroadcastNestedLoopJoin) which is the right plan while intervals ≪ facts.
  */
object Joins extends QueryGroup {

  /** Events with µs-truncated epoch — matches DuckDB epoch_us(CAST(ts AS TIMESTAMP)). */
  private def eventsUs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").withColumn("ts_us", unix_micros($"ts"))
  }

  val queries: Map[String, QFn] = Map(
    "q_join_inner" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .groupBy($"o_orderstatus")
        .agg(dsumR($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4, 6).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy($"o_orderstatus")
    }),

    "q_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_cust"),
             dsumR($"c_acctbal", 4).as("sum_bal"))
        .orderBy($"r_name")
    }),

    // Left join anchored on a *selective* right side (urgent orders only) so
    // the unmatched-customer set is non-empty at every SF — every fixture
    // customer has ≥1 order, but most lack an urgent one, so the
    // null-propagation path this key exists to pin is exercised by data.
    "q_join_left" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .filter($"o_orderkey".isNull)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orderless"))
        .orderBy($"c_mktsegment")
    }),

    "q_join_full" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val f = o.filter($"o_orderstatus" === "F").groupBy($"o_custkey".as("fk"))
        .agg(count(lit(1)).as("n_f"))
      val p = o.filter($"o_orderstatus" === "O").groupBy($"o_custkey".as("ok"))
        .agg(count(lit(1)).as("n_o"))
      f.join(p, $"fk" === $"ok", "full_outer")
        .select(coalesce($"fk", $"ok").as("custkey"),
                coalesce($"n_f", lit(0L)).as("n_f"),
                coalesce($"n_o", lit(0L)).as("n_o"))
        .orderBy($"custkey")
    }),

    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val u = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(u, c("c_custkey") === u("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // Anti join against the '2-HIGH' subset ("customers with no high-priority
    // order") — non-empty complement at every SF, unlike the r11 formulation
    // against ALL orders (every customer has ≥1 order → 0 rows, vacuous gate).
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_orderpriority" === "2-HIGH")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    "q_join_cross" -> ((s, dir) => {
      import s.implicits._
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      r.crossJoin(n)
        .select($"r_name", $"n_name",
                concat_ws("-", $"r_name", $"n_name").as("label"))
        .orderBy($"r_name", $"n_name")
    }),

    // Runtime bloom-filter semi-join reduction (operators/BloomSemiJoin):
    // a ~27-byte/key Bloom built over the urgent orders' keys pre-filters
    // the lineitem SCAN with a codegen'd bloom_might_contain predicate
    // before the exact semi join removes the false positives — result ≡
    // plain semi join at any fpp (no false negatives; PlanSpec asserts
    // both the equivalence and that the predicate sits under the join).
    // At 100 TB the fact rows that die at the scan never enter the join
    // shuffle — the explicit form of Spark's InjectRuntimeFilter, as a
    // reusable library surface.
    "q_join_bloom" -> ((s, dir) => {
      import s.implicits._
      val urgent = t(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      graft.operators.BloomSemiJoin
        .semi(s, t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_items"),
             dsumR($"l_extendedprice", 4).as("sum_price"))
        .orderBy($"l_returnflag")
    }),

    // Band join: equi key + range residual — stays a hash join with filter.
    "q_join_theta" -> ((s, dir) => {
      import s.implicits._
      val p  = t(s, dir, "part")
      val li = t(s, dir, "lineitem")
      li.join(broadcast(p),
          li("l_partkey") === p("p_partkey") &&
          li("l_extendedprice").between(p("p_retailprice") * 0.9, p("p_retailprice") * 1.1))
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"),
             dsumR($"l_extendedprice", 4).as("sum_price"))
        .orderBy($"p_brand")
    }),

    // As-of join via one window pass: most recent prior signup/click per purchase.
    "q_join_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsUs(s, dir)
        .filter($"event_type".isin("purchase", "signup", "click"))
        .select($"event_id", $"user_id", $"event_type", $"ts_us")
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("prior_event_id",
          last(when($"event_type" =!= "purchase", $"event_id"), ignoreNulls = true).over(w))
        .withColumn("prior_ts_us",
          last(when($"event_type" =!= "purchase", $"ts_us"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"prior_event_id",
                ($"ts_us" - $"prior_ts_us").as("gap_us"))
        .orderBy($"event_id")
    }),

    // Tolerance-bounded as-of: same backward match as q_join_asof but the
    // prior event only counts within 12 h — the financial/telemetry form
    // ("match the quote no older than Δt"). Same single user_id window
    // pass; the tolerance is a null-out, not another join.
    "q_join_asof_tol" -> ((s, dir) => {
      import s.implicits._
      val tolUs = 43200000000L // 12 h
      val ev = eventsUs(s, dir)
        .filter($"event_type".isin("purchase", "signup", "click"))
        .select($"event_id", $"user_id", $"event_type", $"ts_us")
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("prior_event_id",
          last(when($"event_type" =!= "purchase", $"event_id"), ignoreNulls = true).over(w))
        .withColumn("prior_ts_us",
          last(when($"event_type" =!= "purchase", $"ts_us"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .withColumn("gap_us", $"ts_us" - $"prior_ts_us")
        .select($"event_id", $"user_id",
          when($"gap_us" <= tolUs, $"prior_event_id").as("prior_event_id"),
          when($"gap_us" <= tolUs, $"gap_us").as("gap_us"))
        .orderBy($"event_id")
    }),

    // Interval join: events within promotion windows derived from orders.
    // Integer-exact µs arithmetic; interval side broadcast (BNLJ on range).
    "q_join_interval" -> ((s, dir) => {
      import s.implicits._
      val base = 1704067200000000L // epoch µs of 2024-01-01 UTC
      val day  = 86400000000L
      val iv = t(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_orderkey" % 40 === 0)
        .select($"o_orderkey",
                (lit(base) + ($"o_orderkey" % 28) * day).as("start_us"))
        .withColumn("end_us", $"start_us" + lit(2L) * day)
      eventsUs(s, dir)
        .join(broadcast(iv), $"ts_us" >= $"start_us" && $"ts_us" < $"end_us")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_events"),
             dsumR($"value", 4, 6).as("sum_value"))
        .orderBy($"o_orderkey")
    })
  )

  private val asOfWin =
    "OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      s"""SELECT o_orderstatus,
         |  ${oSumR("l_extendedprice * (1.0 - l_discount)", 4, 6)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT r_name, COUNT(*) AS n_cust, ${oSumR("c_acctbal", 4)} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_left" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orderless
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o_custkey
        |WHERE o_orderkey IS NULL
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(fk, ok) AS custkey,
        |  coalesce(n_f, 0) AS n_f, coalesce(n_o, 0) AS n_o
        |FROM (SELECT o_custkey AS fk, COUNT(*) AS n_f FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS ok, COUNT(*) AS n_o FROM orders
        |      WHERE o_orderstatus = 'O' GROUP BY o_custkey) o ON fk = ok
        |ORDER BY custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '2-HIGH')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name, concat_ws('-', r_name, n_name) AS label
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_bloom" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_items,
         |  ${oSumR("l_extendedprice", 4)} AS sum_price
         |FROM lineitem
         |WHERE EXISTS (SELECT 1 FROM orders
         |              WHERE o_orderkey = l_orderkey
         |                AND o_orderpriority = '1-URGENT')
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_theta" ->
      s"""SELECT p_brand, COUNT(*) AS n_items, ${oSumR("l_extendedprice", 4)} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |  AND l_extendedprice BETWEEN p_retailprice * 0.9 AND p_retailprice * 1.1
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_asof" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
         |  FROM events WHERE event_type IN ('purchase','signup','click'))
         |SELECT event_id, user_id, prior_event_id, ts_us - prior_ts_us AS gap_us
         |FROM (
         |  SELECT event_id, user_id, event_type, ts_us,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS) $asOfWin AS prior_event_id,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS) $asOfWin AS prior_ts_us
         |  FROM ev) t
         |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_join_asof_tol" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
         |  FROM events WHERE event_type IN ('purchase','signup','click'))
         |SELECT event_id, user_id,
         |  CASE WHEN ts_us - prior_ts_us <= 43200000000 THEN prior_event_id END
         |    AS prior_event_id,
         |  CASE WHEN ts_us - prior_ts_us <= 43200000000 THEN ts_us - prior_ts_us END
         |    AS gap_us
         |FROM (
         |  SELECT event_id, user_id, event_type, ts_us,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS) $asOfWin AS prior_event_id,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS) $asOfWin AS prior_ts_us
         |  FROM ev) t
         |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_join_interval" ->
      s"""WITH iv AS (
         |  SELECT o_orderkey,
         |    1704067200000000 + (o_orderkey % 28) * 86400000000 AS start_us,
         |    1704067200000000 + (o_orderkey % 28) * 86400000000 + 2 * 86400000000 AS end_us
         |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 40 = 0)
         |SELECT o_orderkey, COUNT(*) AS n_events,
         |  ${oSumR("value", 4, 6)} AS sum_value
         |FROM events JOIN iv
         |  ON epoch_us(CAST(ts AS TIMESTAMP)) >= start_us
         | AND epoch_us(CAST(ts AS TIMESTAMP)) <  end_us
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin
  )
}
