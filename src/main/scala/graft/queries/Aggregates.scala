package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.4 — aggregation suite. Hash aggregates with automatic
  * partial+final (map-side combine); at 100 TB the shuffle carries only
  * (group key → partial state), never raw rows.
  *
  * Moment statistics (stddev/var/corr) are declared via exact decimal power
  * sums + closed-form combination in DOUBLE, not the engines' native
  * `stddev_samp`/`corr` — those accumulate doubles in engine-specific order
  * and would not hash-match. The closed form from exact sums is
  * deterministic, identical in both engines, and shuffle-friendly at scale
  * (constant-size partial state per group). */
object Aggregates extends QueryGroup {

  /** FLAGSHIP: TPC-H Q1-shaped pricing summary. */
  def pricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsumR($"l_quantity", 4).as("sum_qty"),
        dsumR($"l_extendedprice", 4).as("sum_base_price"),
        dsumR($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4, 6).as("sum_disc_price"),
        r4(davg($"l_quantity")).as("avg_qty"),
        r4(davg($"l_extendedprice")).as("avg_price"),
        r4(davg($"l_discount", 6)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, QFn] = Map(
    "q_agg_pricing" -> (pricing _),

    // HAVING on a scale-free ratio (r13 — the r12 absolute count bar of
    // 250 was vacuous-EMPTY at sf0.001 and vacuous-FULL at sf0.1):
    // segments where > 91.5% of customers have a positive balance,
    // integer-exact as n_pos·200 > n_cust·183 so both engines compare
    // exact BIGINTs. Selective and non-empty at every SF (3/2/1 rows).
    "q_agg_having" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(count(when($"c_acctbal" > 0, 1)).as("n_pos"),
             count(lit(1)).as("n_cust"))
        .filter($"n_pos" * 200L > $"n_cust" * 183L)
        .orderBy($"c_mktsegment")
    }),

    "q_agg_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
             countDistinct($"l_suppkey").as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    "q_agg_rollup" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(dsumR($"o_totalprice", 4).as("revenue"), count(lit(1)).as("n_orders"))
        .select(coalesce($"r_name", lit("ALL")).as("region"),
                coalesce($"n_name", lit("ALL")).as("nation"),
                $"revenue", $"n_orders")
        .orderBy($"region", $"nation")
    }),

    "q_agg_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), dsumR($"o_totalprice", 4).as("revenue"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
                coalesce($"o_orderpriority", lit("ALL")).as("priority"),
                $"n_orders", $"revenue")
        .orderBy($"status", $"priority")
    }),

    "q_agg_gsets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_gsets")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
          |  coalesce(l_linestatus, 'ALL') AS status,
          |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n_rows
          |FROM li_gsets
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY flag, status""".stripMargin)
    }),

    "q_agg_stats" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("h", hour($"ts").cast("double"))
      val agg = ev.groupBy($"event_type").agg(
        count(lit(1)).cast("double").as("n"),
        dsum($"value", 6).as("sx"),
        dsum($"value" * $"value", 6).as("sxx"),
        dsum($"h", 6).as("sy"),
        dsum($"h" * $"h", 6).as("syy"),
        dsum($"value" * $"h", 6).as("sxy"),
        r4(min($"value")).as("min_v"),
        r4(max($"value")).as("max_v"))
      agg.select($"event_type",
          r4(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)).as("var_v"),
          r4(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))).as("stddev_v"),
          $"min_v", $"max_v",
          r4(($"sxy" - $"sx" * $"sy" / $"n") /
             (sqrt($"sxx" - $"sx" * $"sx" / $"n") * sqrt($"syy" - $"sy" * $"sy" / $"n"))).as("corr_vh"))
        .orderBy($"event_type")
    }),

    "q_agg_median" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(r4(median($"o_totalprice")).as("med"),
             r4(percentile($"o_totalprice", lit(0.25))).as("p25"),
             r4(percentile($"o_totalprice", lit(0.75))).as("p75"),
             count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    }),

    // WEIGHTED median — the aggregate Spark's function library lacks
    // (percentile() weights are integer row-repeats, not fractional
    // quantity weights at the semantics level a pricing analyst means):
    // the quantity-weighted median price per returnflag — the price at
    // which half the shipped QUANTITY is cheaper. Declared as the LOWER
    // weighted median (smallest price with 2·cumweight ≥ total), over
    // DISTINCT price buckets so the cumulative scan is tie-free and the
    // pick is deterministic without a row tiebreak. Shape: one (flag,
    // price) hash agg (map-side combinable), a flag-partitioned
    // cumulative window over the per-group distinct prices, one rank-1
    // filter — no data-sized window, no driver work.
    "q_agg_wmedian" -> ((s, dir) => {
      import s.implicits._
      val byPrice = t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_extendedprice")
        .agg(sum($"l_quantity".cast("long")).as("w"))
      val wCum = Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"l_returnflag")
      val wPick = Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")
      byPrice
        .withColumn("cum", sum($"w").over(wCum))
        .withColumn("tot", sum($"w").over(wAll))
        .filter(lit(2L) * $"cum" >= $"tot")
        .withColumn("rk", row_number().over(wPick))
        .filter($"rk" === 1)
        .select($"l_returnflag", $"tot".as("total_qty"),
                r4($"l_extendedprice").as("wmedian_price"))
        .orderBy($"l_returnflag")
    }),

    // Approximate-quantile sketch (Greenwald-Khanna via percentile_approx):
    // the single-pass mergeable-summary path for percentiles at 100 TB —
    // exact percentile() materializes each group's full value set per
    // shuffle partition, the GK sketch carries O(1/ε) state through partial
    // aggregation. Sketch internals differ from DuckDB's t-digest →
    // no oracle; MlSpec pins the rank-error contract vs exact quantiles.
    "m_agg_quantile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(r4(percentile_approx($"l_extendedprice", lit(0.5), lit(10000))).as("p50"),
             r4(percentile_approx($"l_extendedprice", lit(0.95), lit(10000))).as("p95"),
             count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // HLL sketch differs from DuckDB's — property-tested (<5% error), no oracle.
    "q_agg_approx" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
             countDistinct($"l_partkey").as("exact_parts"))
        .orderBy($"l_returnflag")
    }),

    "q_agg_collect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_custkey", year($"o_orderdate").as("y"))
        .groupBy($"o_custkey")
        .agg(array_join(array_sort(collect_list($"y")), ",").as("years"),
             count(lit(1)).as("n_orders"))
        .orderBy($"o_custkey")
    }),

    // Modal value per group. NOT max_by/arg_max: both engines leave their
    // tie-break unspecified, so the deterministic form is a two-level
    // aggregate picking max(struct(count, value)) — count-descending with
    // the LEXICALLY LARGEST value winning ties, identically in both
    // engines. Two hash-agg shuffles, second over |groups| rows only.
    "q_agg_mode" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "orders")
        .groupBy($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy($"o_orderpriority")
        .agg(max(struct($"cnt", $"o_orderstatus")).as("m"),
             sum($"cnt").as("n_orders"))
        .select($"o_orderpriority", $"m.o_orderstatus".as("mode_status"),
                $"m.cnt".as("mode_n"), $"n_orders")
        .orderBy($"o_orderpriority")
    }),

    // Filtered aggregates (r9) — ANSI FILTER-clause semantics as
    // conditional aggregation: one scan computes several
    // differently-predicated measures (the report-query staple that
    // otherwise becomes N self-joins). `count(when(...))` / a CASE inside
    // dsum ride the same single hash agg; NULL-on-false keeps the decimal
    // sums exact over just the matching rows.
    "q_agg_filtered" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
             count(when($"l_quantity" > 25, 1)).as("n_bulk"),
             count(when($"l_returnflag" === "R", 1)).as("n_returned"),
             dsumR(when($"l_discount" > 0.05, $"l_extendedprice"), 4)
               .as("disc_revenue"),
             dsumR(when($"l_tax" === 0.0, $"l_quantity"), 4).as("untaxed_qty"))
        .orderBy($"l_linestatus")
    })
  )

  private val q1Oracle =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${oSumR("l_quantity", 4)} AS sum_qty,
       |  ${oSumR("l_extendedprice", 4)} AS sum_base_price,
       |  ${oSumR("l_extendedprice * (1.0 - l_discount)", 4, 6)} AS sum_disc_price,
       |  round(${oAvg("l_quantity")}, 4) AS avg_qty,
       |  round(${oAvg("l_extendedprice")}, 4) AS avg_price,
       |  round(${oAvg("l_discount", 6)}, 4) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_agg_pricing" -> q1Oracle,

    "q_agg_having" ->
      """SELECT c_mktsegment,
        |  COUNT(*) FILTER (WHERE c_acctbal > 0) AS n_pos,
        |  COUNT(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment
        |HAVING COUNT(*) FILTER (WHERE c_acctbal > 0) * 200 > COUNT(*) * 183
        |ORDER BY c_mktsegment""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
         |  ${oSumR("o_totalprice", 4)} AS revenue, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY region, nation""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n_orders, ${oSumR("o_totalprice", 4)} AS revenue
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "q_agg_gsets" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
         |  coalesce(l_linestatus, 'ALL') AS status,
         |  ${oSumR("l_quantity", 4)} AS sum_qty,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY flag, status""".stripMargin,

    "q_agg_stats" ->
      s"""WITH a AS (
         |  SELECT event_type,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${oSum("value", 6)} AS sx,
         |    ${oSum("value * value", 6)} AS sxx,
         |    ${oSum("CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE)", 6)} AS sy,
         |    ${oSum("CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) * CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE)", 6)} AS syy,
         |    ${oSum("value * CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE)", 6)} AS sxy,
         |    round(MIN(value), 4) AS min_v,
         |    round(MAX(value), 4) AS max_v
         |  FROM events GROUP BY event_type)
         |SELECT event_type,
         |  round((sxx - sx * sx / n) / (n - 1), 4) AS var_v,
         |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_v,
         |  min_v, max_v,
         |  round((sxy - sx * sy / n) /
         |        (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 4) AS corr_vh
         |FROM a ORDER BY event_type""".stripMargin,

    "q_agg_wmedian" ->
      """WITH byprice AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |scan AS (
        |  SELECT l_returnflag, l_extendedprice, w,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM byprice),
        |pick AS (
        |  SELECT l_returnflag, CAST(tot AS BIGINT) AS total_qty,
        |    round(l_extendedprice, 4) AS wmedian_price,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice) AS rk
        |  FROM scan WHERE 2 * cum >= tot)
        |SELECT l_returnflag, total_qty, wmedian_price
        |FROM pick WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,

    "q_agg_median" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS med,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_collect" ->
      """SELECT o_custkey,
        |  string_agg(CAST(y AS VARCHAR), ',' ORDER BY y) AS years,
        |  COUNT(*) AS n_orders
        |FROM (SELECT o_custkey, year(o_orderdate) AS y FROM orders) t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // Mirrors max(struct(cnt, status)): cnt desc, then LARGER status wins.
    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT o_orderpriority, o_orderstatus, cnt,
        |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n_orders,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY cnt DESC, o_orderstatus DESC) AS rn
        |  FROM c)
        |SELECT o_orderpriority, o_orderstatus AS mode_status, cnt AS mode_n,
        |  CAST(n_orders AS BIGINT) AS n_orders
        |FROM r WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,

    "q_agg_filtered" ->
      s"""SELECT l_linestatus,
         |  COUNT(*) AS n_rows,
         |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
         |  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
         |  ${oSumR("CASE WHEN l_discount > 0.05 THEN l_extendedprice END", 4)} AS disc_revenue,
         |  ${oSumR("CASE WHEN l_tax = 0.0 THEN l_quantity END", 4)} AS untaxed_qty
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  )
}
