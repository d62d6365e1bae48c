package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2 extensions — relational reshaping and pipeline utilities a
  * large-scale training-data build needs beyond the core operator set:
  * pivot/unpivot, one-pass column profiling (data-quality gate), batch
  * sessionization, an explicitly skew-salted join, and the raw `spark.sql`
  * ANSI surface (the same SQL text runs unchanged on Spark and DuckDB).
  *
  * Scale notes per operator live on each query; the common theme is that
  * every shuffle is keyed by the grouping column that the next stage needs,
  * and the salted join demonstrates the standard mitigation when one key
  * dominates a shuffle (hot-key rows spread over `nSalt` reducers, the
  * small side replicated `nSalt`×, result provably identical to the plain
  * join — the oracle IS the plain join).
  */
object Reshape extends QueryGroup {

  private val nSalt = 8

  /** Gap-based sessionization core (batch form of what
    * `q_stream_session`'s `session_window` does in streaming): rows within
    * `gapUs` of the previous row of the same user share a session. Exposed
    * for direct unit-testing on synthetic traces (ReshapeSpec).
    * Input: (user_id, event_id, ts_us). Output adds sess_id (1-based per
    * user). One shuffle on user_id; the two window passes and the later
    * per-(user, session) aggregate all reuse that partitioning. */
  def sessionize(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "brk")
  }

  /** The identical ANSI text runs on Spark (over temp views) and DuckDB —
    * TPC-H Q3 shape. Decimal-routed sum per SURVEY §2 determinism rules. */
  private val tpchQ3 =
    """SELECT o_orderkey,
      |  CAST(round(SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: the 6-table join chain with the local-supplier
    * constraint (c_nationkey = s_nationkey). region/nation are broadcast
    * dims; customer⋈orders⋈lineitem shuffle on their keys; revenue goes
    * through DECIMAL per the determinism rules. */
  private val tpchQ5 =
    """SELECT n_name,
      |  CAST(round(SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q21 shape: the multi-semi-join query — EXISTS (another supplier
    * in the order) plans as a left-semi join, the correlated NOT EXISTS
    * (nobody shipped later ⇒ this supplier was the last to ship in a
    * finished order) as a null-safe left-anti join; both are equi-joins on
    * l_orderkey, so at scale they shuffle once on the order key. The
    * fixture has no receipt/commit dates, so "kept waiting" is re-expressed
    * over l_shipdate with identical join structure. */
  private val tpchQ21 =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders   ON o_orderkey = l1.l_orderkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND n_name LIKE 'NATION_1%'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  /** TPC-H Q16 shape: distinct-aggregate over the part⋈supplier
    * association with a NOT IN exclusion subquery (null-free key ⇒ plans
    * as a left-anti join, not the null-aware variant). The fixture has no
    * partsupp, so lineitem provides the association; COUNT(DISTINCT
    * l_suppkey) is Spark's two-phase distinct aggregate — partial
    * de-duplication before the shuffle, never a global sort. */
  private val tpchQ16 =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 20""".stripMargin

  // Q18 (large-volume customer): the GROUP BY + HAVING subquery feeding a
  // semi join on the big fact's own key, then the three-way join and a
  // top-100. SUM(l_quantity) is exact in double — the fixture quantities
  // are integer-valued (checked; the flagship still routes them through
  // DECIMAL where fractional data is possible). (o_totalprice DESC,
  // o_orderkey) is a total order.
  private val tpchQ18 =
    """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
      |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q7 shape (volume shipping): the nation table joined TWICE under
    * different aliases (supplier's nation vs customer's nation) with a
    * symmetric two-country predicate. Both nation sides broadcast; the
    * fact chain shuffles once per equi-key; year comes from l_shipdate.
    * Revenue goes through DECIMAL per the determinism rules. */
  private val tpchQ7 =
    """SELECT supp_nation, cust_nation, l_year,
      |  round(CAST(SUM(volume) AS DOUBLE), 4) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
      |      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
      |    AND l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape (national market share): a share-of-total ratio per
    * year — numerator and denominator are BOTH exact DECIMAL sums, so the
    * one double division at the end is bit-deterministic on both engines
    * (the repo's ratio rule: never divide rounded doubles, divide exact
    * decimals once). region prunes the customer side; the supplier's
    * nation is re-joined under a second alias for the share predicate. */
  private val tpchQ8 =
    """SELECT o_year,
      |  round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
      |                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      |        / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region   ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01'
      |    AND p_type = 'ECONOMY'
      |) all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated scalar
    * subquery (per-part average quantity) — Catalyst de-correlates it into
    * an aggregate + join on p_partkey, so at scale it is one extra keyed
    * shuffle over lineitem, never a per-row re-scan. The threshold compare
    * is deterministic: quantities are integer-valued doubles, so AVG is
    * exact-sum/n on both engines. */
  private val tpchQ17 =
    """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |        / 7.0, 4) AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND p_type = 'SMALL'
      |  AND l_quantity < (
      |    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** TPC-H Q4 shape (order priority checking): EXISTS → left-semi join on
    * the fact's own key; pure integer counts, no FP surface at all. */
  private val tpchQ4 =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q6 shape (forecasting revenue change): the pure scan-filter-agg
    * — no join at all; the predicate must reach the parquet scan. */
  private val tpchQ6 =
    """SELECT CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 shape (returned-item reporting): 4-table join, revenue per
    * customer over one quarter's returns, top-20. */
  private val tpchQ10 =
    """SELECT c_custkey, c_name,
      |  CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue,
      |  n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q12 shape (shipping modes / priority): conditional integer
    * counts per group — the fixture has no l_shipmode, so l_returnflag
    * stands in as the mode column with identical query structure. */
  private val tpchQ12 =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q13 shape (customer order-count distribution): the LEFT OUTER
    * join that must keep zero-order customers, then a two-level aggregate
    * (orders per customer → customers per order-count). Pure integers. */
  private val tpchQ13 =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14 shape (promotion effect): the percent-share ratio — both
    * sums exact DECIMAL, ONE double division, same ratio rule as Q8. */
  private val tpchQ14 =
    """SELECT round(100.0
      |  * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
      |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
      |  4) AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin

  /** TPC-H Q19 shape (discounted revenue, disjunctive brackets): the
    * OR-of-ANDs join predicate — Catalyst must still push the common
    * equi-key (partkey) into the join and the residual brackets into a
    * post-join filter, never a nested loop. */
  private val tpchQ19 =
    """SELECT CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE
      |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity >= 1 AND l_quantity <= 11)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |    AND l_quantity >= 10 AND l_quantity <= 20)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  /** TPC-H Q22 shape (global sales opportunity): customers above the
    * average positive balance with no orders — the anti join + scalar
    * subquery query. The above-average compare is CROSS-MULTIPLIED
    * (balance × count > total) so both sides stay exact DECIMAL/BIGINT —
    * never comparing against a double average whose summation order the
    * engines could disagree on. The fixture has no c_phone (nation stands
    * in for the country code) and every customer has orders, so the anti
    * join excludes URGENT-order customers — same structure, non-vacuous
    * result. */
  private val tpchQ22 =
    """SELECT n_name AS cntry, COUNT(*) AS numcust,
      |  CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 4) AS DOUBLE) AS totacctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE CAST(c_acctbal AS DECIMAL(18,6))
      |    * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      |  > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer
      |     WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q1 shape (pricing summary): the canonical wide scan-agg. Sums
    * route through DECIMAL; the three averages divide an EXACT aggregate
    * (BIGINT or DECIMAL-cast-DOUBLE numerator) by COUNT(*) — one double
    * division per group, deterministic on both engines. */
  private val tpchQ1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_base_price,
      |  CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_charge,
      |  round(CAST(CAST(SUM(l_quantity) AS BIGINT) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
      |  round(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated MIN subquery
    * re-referenced in the outer WHERE — each part keeps only its cheapest
    * (here: lowest-acctbal, via the lineitem association) EUROPE supplier.
    * The equality compares a stored double against the MIN of the same
    * stored values — selection, not arithmetic, so no FP trap. */
  private val tpchQ2 =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      |  AND s_acctbal = (
      |    SELECT MIN(s2.s_acctbal)
      |    FROM supplier s2
      |    JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 shape (product-type profit): profit = revenue − cost per
    * (supplier nation, order year); the fixture has no ps_supplycost, so
    * cost is the 10%-of-retail proxy — identical query structure. Both
    * terms are per-row DECIMAL casts (exact subtraction, exact sum). */
  private val tpchQ9 =
    """SELECT nation, o_year, round(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
      |      - CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6)) AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%gear%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 shape (important stock): per-part shipped value from one
    * nation's suppliers, kept where the part's value exceeds a fixed
    * fraction of the total — the HAVING-against-scalar-subquery query.
    * The fraction compare is CROSS-MULTIPLIED (val × 2000 > total) so it
    * stays in exact DECIMAL, the same rule as Q22. */
  private val tpchQ11 =
    """WITH v AS (
      |  SELECT l_partkey AS partkey,
      |    SUM(CAST(l_quantity * p_retailprice AS DECIMAL(18,6))) AS val
      |  FROM lineitem
      |  JOIN part     ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE n_name LIKE 'NATION_1%'
      |  GROUP BY l_partkey)
      |SELECT partkey, round(CAST(val AS DOUBLE), 4) AS val
      |FROM v
      |WHERE val * 2000 > (SELECT SUM(val) FROM v)
      |ORDER BY val DESC, partkey""".stripMargin

  /** TPC-H Q15 shape (top supplier): the revenue view + equality against
    * its own MAX — compared as the UNROUNDED exact DECIMAL sum (rounding
    * happens only in the projection), so the tie-set is engine-stable. */
  private val tpchQ15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
      |FROM supplier
      |JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q20 shape (excess-stock suppliers): the nested-IN chain — a
    * semi join against a grouped HAVING subquery that itself filters parts
    * by name pattern (lineitem stands in for partsupp, shipped quantity
    * for availqty). Integer-exact threshold. */
  private val tpchQ20 =
    """SELECT s_name, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  GROUP BY l_suppkey
      |  HAVING SUM(l_quantity) > 150)
      |ORDER BY s_name, n_name""".stripMargin

  /** Register every TPC-H view the identical-text queries touch. */
  private def tpchViews(s: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem").foreach { n =>
      t(s, dir, n).createOrReplaceTempView(n)
    }

  /** Gap-filled hourly series (bucket_ms, n_events, sum_value), unordered:
    * hour-bucket hash agg + a `sequence()` grid exploded from ONE bounds
    * row, left-joined so empty hours appear as zeros. Grid size tracks the
    * time range, never input volume. Shared by q_time_resample/q_roll_mean. */
  private[queries] def resampled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = t(s, dir, "events")
      .withColumn("h", expr("(unix_millis(ts) div 3600000) * 3600000"))
      .groupBy($"h")
      .agg(count(lit(1)).as("n_events"), dsumR($"value", 4, 6).as("sum_value"))
    val grid = agg.agg(min($"h").as("lo"), max($"h").as("hi"))
      .select(explode(expr("sequence(lo, hi, 3600000)")).as("h"))
    grid.join(agg, Seq("h"), "left")
      .select($"h".as("bucket_ms"),
              coalesce($"n_events", lit(0L)).as("n_events"),
              coalesce($"sum_value", lit(0.0)).as("sum_value"))
  }

  /** Oracle-side mirror of [[resampled]] (CTEs ending in `res`). */
  private[queries] val resampledCte =
    s"""WITH ev AS (
       |  SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 AS h, value
       |  FROM events),
       |agg AS (
       |  SELECT h, COUNT(*) AS n_events,
       |    ${oSumR("value", 4, 6)} AS sum_value
       |  FROM ev GROUP BY h),
       |b AS (SELECT min(h) AS lo, max(h) AS hi FROM agg),
       |grid AS (SELECT unnest(generate_series(lo, hi, 3600000)) AS h FROM b),
       |res AS (
       |  SELECT g.h AS bucket_ms,
       |    CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       |    COALESCE(a.sum_value, 0.0) AS sum_value
       |  FROM grid g LEFT JOIN agg a ON g.h = a.h)""".stripMargin

  val queries: Map[String, QFn] = Map(
    // Wide pivot: one hash-agg shuffle on the row key; the pivoted columns
    // are plain conditional aggregates, so no extra pass per column.
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsumR($"l_quantity", 4))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .orderBy($"l_returnflag")
    }),

    // unpivot/melt (Spark 3.4+ Dataset.unpivot): long-form metrics table.
    "q_unpivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(r3(davg($"c_acctbal", 2)).as("avg_acctbal"),
             count(lit(1)).cast("double").as("n_cust"))
        .unpivot(Array($"c_mktsegment"), Array($"avg_acctbal", $"n_cust"),
                 "metric", "value")
        .orderBy($"c_mktsegment", $"metric")
    }),

    // One-pass-per-column data-quality profile (null / distinct / range) —
    // the pre-ingest gate of a training-data pipeline. Each branch prunes
    // to its single column at the scan, so total bytes read equal one
    // full-width scan; exact COUNT(DISTINCT) is per-branch (no expand
    // blow-up). At 100 TB swap in approx_count_distinct — kept exact here
    // because the oracle compares exact values.
    "q_profile" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      def prof(c: String, numeric: Boolean) = {
        val range =
          if (numeric) Seq(r4(min(col(c)).cast("double")).as("min_num"),
                           r4(max(col(c)).cast("double")).as("max_num"))
          else Seq(lit(null).cast("double").as("min_num"),
                   lit(null).cast("double").as("max_num"))
        val aggs = Seq(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct")) ++ range
        o.agg(aggs.head, aggs.tail: _*).select(lit(c).as("col"), col("*"))
      }
      Seq(prof("o_orderkey", true), prof("o_custkey", true),
          prof("o_orderstatus", false), prof("o_totalprice", true),
          prof("o_orderpriority", false))
        .reduce(_ unionAll _)
        .orderBy($"col")
    }),

    // Day-of-week seasonal index per event type (the seasonality profile
    // read before detrending/anomaly thresholds): per (type, dow), event
    // count, decimal-exact mean value, and the ratio to the type's overall
    // mean. dow is CALENDAR-FREE integer arithmetic — (epoch_days + 4) % 7,
    // 0 = Sunday — because Spark's dayofweek and DuckDB's extract(dow)
    // disagree on numbering and tz handling; identical integer text on
    // both engines removes the whole class. idx divides two decimal-routed
    // doubles computed identically, so round(4) is belt only. One scan,
    // two hash aggregates, a broadcast-sized per-type join.
    "q_time_seasonal" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type", $"value",
          expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"))
      val per = ev.groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("n"), davg($"value", 6).as("dow_avg"))
      val tot = ev.groupBy($"event_type")
        .agg(davg($"value", 6).as("all_avg"))
      per.join(broadcast(tot), Seq("event_type"))
        .select($"event_type", $"dow", $"n",
          round($"dow_avg", 4).as("avg_val"),
          round($"dow_avg" / $"all_avg", 4).as("idx"))
        .orderBy($"event_type", $"dow")
    }),

    // Batch sessionization: 30-minute inactivity gap, per-user session
    // stats. Single user_id shuffle feeds windows and both aggregates.
    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
      sessionize(ev, 1800L * 1000000L)
        .groupBy($"user_id", $"sess_id")
        .agg(count(lit(1)).as("n"), (max($"ts_us") - min($"ts_us")).as("span_us"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"n").as("n_events"),
             max($"span_us").as("max_span_us"))
        .orderBy($"user_id")
    }),

    // The NATIVE session_window operator (the same physical machinery
    // Structured Streaming's session windows use), exercised in batch
    // through the hash gate. Boundary semantics differ from the
    // gaps-and-islands formulation above by ONE comparison: session_window
    // spans [start, last + gap), so an event at EXACTLY prev + gap opens a
    // new session (islands' `diff > gap` keeps it) — the oracle mirrors
    // that with `>=`, pinning the operator's actual contract rather than
    // assuming the two formulations agree. Output is integer-exact
    // (counts + µs spans from window bounds).
    "q_sessionize_native" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"user_id", $"ts")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
             (unix_micros($"w.end") - unix_micros($"w.start")).as("win_us"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"n").as("n_events"),
             max($"win_us").as("max_win_us"))
        .orderBy($"user_id")
    }),

    // Gaps-and-islands: maximal runs of the SAME event_type per user in
    // time order (the run-length shape — repeated telemetry states, retry
    // storms, quality streaks). Island id = rn_user − rn_user_type, the
    // classic rank difference: constant within a run, distinct across
    // runs of the same type. ONE user_id shuffle serves both windows
    // (hash(user_id) already clusters (user_id, event_type)) and both
    // downstream hash aggregates — no further exchange until the
    // presentation sort. Window orders carry event_id so same-µs rows
    // rank identically in both engines.
    "q_events_streak" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val wt = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts_us", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
                unix_micros($"ts").as("ts_us"))
        .withColumn("isl", row_number().over(w) - row_number().over(wt))
        .groupBy($"user_id", $"event_type", $"isl")
        .agg(count(lit(1)).as("len"))
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n_streaks"), max($"len").as("max_streak"))
        .orderBy($"user_id", $"event_type")
    }),

    // Token-bucket rate limiting — the ingestion-throttle primitive
    // (admit or shed per-entity bursts deterministically BEFORE they hit
    // a downstream store): per user, a bucket holding up to 24 h of
    // credit (= 2 admits), each admit costing 12 h, refilled by elapsed
    // time, starting FULL — events in (ts, event_id) order are admitted
    // while credit suffices, else dropped. The automaton is exact BIGINT
    // µs arithmetic inside ONE codegen `aggregate` HOF fold per user
    // (the q_mine_cep discipline — sequential per-group state, no UDF,
    // no per-step shuffle); the oracle is the recursive-CTE walk over
    // the same sorted arrays. Parameters are sized to the fixture's
    // ~10.7 h mean inter-arrival so BOTH branches run at every SF
    // (every user sheds ≥ 1 event even at sf0.001 — no vacuous green).
    // Streaming twin: streaming/StreamOps.rateLimitStream. At 100 TB
    // the fold runs per (user, day) partition with carried credit.
    "q_events_ratelimit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"ts_us", $"event_id"))).as("a"))
        .select($"user_id", size($"a").cast("long").as("n_events"),
          expr(
            """aggregate(
              |  a,
              |  array(-1L, 0L, 0L),
              |  (acc, p) -> CASE
              |    WHEN (CASE WHEN acc[0] < 0L THEN 86400000000L
              |          ELSE least(86400000000L, acc[1] + (p.ts_us - acc[0]))
              |          END) >= 43200000000L
              |      THEN array(p.ts_us,
              |        (CASE WHEN acc[0] < 0L THEN 86400000000L
              |         ELSE least(86400000000L, acc[1] + (p.ts_us - acc[0]))
              |         END) - 43200000000L,
              |        acc[2] + 1L)
              |    ELSE array(p.ts_us,
              |      CASE WHEN acc[0] < 0L THEN 86400000000L
              |        ELSE least(86400000000L, acc[1] + (p.ts_us - acc[0]))
              |        END,
              |      acc[2]) END
              |)""".stripMargin).as("st"))
        .select($"user_id", $"n_events",
                $"st".getItem(2).as("n_admitted"),
                ($"n_events" - $"st".getItem(2)).as("n_dropped"))
        .orderBy($"user_id")
    }),

    // Skew-salted join: the fact side's hot keys are spread across nSalt
    // shuffle partitions by a deterministic salt; the dim side is exploded
    // nSalt× so every (key, salt) bucket still finds its match. Result is
    // provably the plain join — the oracle runs the unsalted SQL. This is
    // the standard AQE-independent mitigation when one key holds >1 task
    // of data at 100 TB.
    "q_join_salted" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
        // Salt must vary WITHIN a key — hashing the key alone would send
        // every row of a hot key to the same bucket, defeating the spread.
        // (l_orderkey, l_linenumber) is row-unique, so hot-key rows fan out
        // uniformly across the nSalt reducers.
        .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(nSalt.toLong)))
        .drop("l_linenumber")
      val ord = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority")
        .withColumn("salt", explode(sequence(lit(0L), lit(nSalt - 1L))))
      li.join(ord, li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
        .groupBy($"o_orderpriority")
        .agg(dsumR($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4, 6).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    }),

    // Equi-width histogram — the profiling companion to q_profile. One
    // hash-agg over at most 20 bucket keys; integer-exact bucket math is
    // identical in both engines.
    "q_histogram" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("bucket",
          least(floor($"o_totalprice" / 25000.0), lit(19.0)).cast("long"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), dsumR($"o_totalprice", 2, 2).as("sum_price"))
        .withColumn("bucket_lo", ($"bucket" * 25000L).cast("double"))
        .select($"bucket", $"bucket_lo", $"n", $"sum_price")
        .orderBy($"bucket")
    }),

    // CDC/merge pattern: a deltas table (per-user event-value totals)
    // upserted onto customer balances via left join + coalesce — the
    // relational core of MERGE INTO, shuffled on the join key exactly
    // once. Unmatched rows pass through; matched rows apply the delta.
    "q_upsert" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val delta = t(s, dir, "events")
        .groupBy($"user_id").agg(dsum($"value", 6).as("delta"))
      cust.join(delta, cust("c_custkey") === delta("user_id"), "left")
        .withColumn("new_bal", r2($"c_acctbal" + coalesce($"delta", lit(0.0))))
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_cust"), count($"delta").as("n_updated"),
             dsumR($"new_bal", 2, 2).as("total_bal"))
        .orderBy($"c_nationkey")
    }),

    // Raw ANSI SQL surface: the exact same text the oracle runs. Catalyst
    // plans it like the DataFrame version (broadcast customer, shuffled
    // Keep-latest-snapshot dedup: the "newest crawl of each URL" /
    // "current row per entity" operator of a CDC or crawl pipeline. One
    // user_id shuffle, per-partition sort, rank-1 filter; at 100 TB the
    // same shape — never a global sort, and with the table bucketed on the
    // entity key even the shuffle disappears. Ties broken by event_id so
    // the result is total and engine-independent.
    "q_dedup_latest" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id".as("latest_event"),
                $"ts_us".as("latest_ts_us"), $"value")
        .orderBy($"user_id")
    }),

    // SCD type-2 history build: compress each user's event stream into
    // validity intervals of their event_type "attribute" — rows survive
    // only where the attribute CHANGES (lag ≠ current), valid_from = that
    // event's ts, valid_to = the next change's ts (NULL while current),
    // is_current flags the open row. The classic warehouse history-table
    // derivation from an append log: two window passes over ONE user_id
    // shuffle, no self-join, integer-exact timestamps — at 100 TB the cost
    // is the single keyed shuffle the sort already pays.
    "q_scd2" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
        .withColumn("valid_to", lead($"ts_us", 1).over(w))
        // event_id joins the ORDER BY (then drops) because (user_id,
        // valid_from, attr) is not a total order: two surviving change-rows
        // can share a user's timestamp AND attr (types A,B,A at one ts),
        // leaving their order engine-dependent — the usual event_id
        // tie-break discipline, applied pre-projection.
        .select($"user_id", $"event_type".as("attr"),
                $"ts_us".as("valid_from"), $"valid_to",
                $"valid_to".isNull.as("is_current"), $"event_id")
        .orderBy($"user_id", $"valid_from", $"attr", $"event_id")
        .drop("event_id")
    }),

    // Time-series resampling with gap fill: regularize the event stream to
    // a dense hourly grid, zero-filling empty buckets — the missing-bucket
    // repair step before any rolling/seasonal computation. The bucket agg
    // shuffles on the hour key; the grid is sequence()-exploded from ONE
    // bounds row and joined to the (already tiny) aggregate, so grid size
    // tracks the time range, never the input volume — at 100 TB the plan
    // is identical. Buckets are epoch-ms longs (ns-truncation-proof).
    "q_time_resample" -> ((s, dir) =>
      resampled(s, dir).orderBy(col("bucket_ms"))),

    // Rolling 24-bucket mean over the gap-filled hourly series — the
    // moving-average smoother that NEEDS the zero-filled grid (a rolling
    // window over raw buckets would silently skip empty hours). The window
    // is a single global-order pass, which is correct at any input volume:
    // the grid's row count is bounded by the TIME RANGE (one row per hour),
    // not by data size, so even a century of data is under a million rows.
    "q_roll_mean" -> ((s, dir) => {
      import s.implicits._
      // Windowed AVG would sum doubles in engine-specific order (Spark
      // re-scans the frame, DuckDB uses a segment tree) — one ulp apart at
      // round(4); and a decimal-sum/24 quotient can land EXACTLY on a
      // 4th-decimal midpoint, where Spark's BigDecimal HALF_UP and DuckDB's
      // double-math round break the tie differently. So: the event count
      // gets a true mean (an integer/24 provably never hits a midpoint),
      // the value gets the decimal-exact trailing SUM (no division at all).
      val w = Window.orderBy($"bucket_ms").rowsBetween(-23, Window.currentRow)
      resampled(s, dir)
        .withColumn("roll_events",
          r4(sum($"n_events").over(w).cast("double") / count(lit(1)).over(w)))
        .withColumn("roll_value",
          round(sum(expr("CAST(sum_value AS DECIMAL(18,6))")).over(w), 4)
            .cast("double"))
        .select($"bucket_ms", $"n_events", $"roll_events", $"roll_value")
        .orderBy($"bucket_ms")
    }),

    // Z-score anomaly detection over the telemetry values, per event type.
    // Parity-safe by construction: mean and σ are derived from exact
    // decimal-backed Σx / Σx² (identical doubles in both engines), so the
    // per-row |z| > 3 classification can only disagree on a row landing
    // within one ulp of the cut — probability ~0 for continuous values.
    // Two shuffles: the stats hash-agg, then a broadcast of ≤|types| rows
    // back onto the fact scan (the fact table never reshuffles).
    "q_anomaly_zscore" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_type", $"value")
      val st = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             dsum($"value", 6).as("s1"),
             dsum($"value" * $"value", 6).as("s2"))
        .withColumn("mean", $"s1" / $"n")
        // Guarded σ: n=1 would divide by zero, and a (near-)constant type
        // can round the variance operand epsilon-negative — Spark would
        // yield NaN but DuckDB's sqrt(<0) is a hard error, so clamp at 0
        // and emit NULL sd for n=1 on BOTH sides.
        .withColumn("sd", when($"n" > 1,
          sqrt(greatest(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1), lit(0.0)))))
      ev.join(broadcast(st), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
             sum(when($"value" > $"mean" + lit(3.0) * $"sd" ||
                      $"value" < $"mean" - lit(3.0) * $"sd", 1L).otherwise(0L))
               .as("n_outliers"),
             r4(min($"mean")).as("mean"),
             r4(min($"sd")).as("sd"))
        .orderBy($"event_type")
    }),

    // Robust outliers via median/MAD — the heavy-tail-safe twin of
    // q_anomaly_zscore (one wild value drags the mean AND the sd, masking
    // itself; a median moves by at most one rank). Two exact-median passes
    // with the ≤|types| stats rows broadcast back between them — the
    // events scan is never reshuffled. Both medians are round(6)-pinned
    // BEFORE re-entering arithmetic: interpolated middles may differ in
    // the last ulp between engines' sort/average paths, so the deviation
    // and the 3·1.4826·mad fence are built from bit-identical inputs (the
    // ln-parity discipline applied to medians).
    "q_anomaly_mad" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(round(median($"value"), 6).as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs($"value" - $"med"))
      val mad = dev.groupBy($"event_type")
        .agg(round(median($"adev"), 6).as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
             sum(when($"adev" > lit(3.0) * lit(1.4826) * $"mad", 1L).otherwise(0L))
               .as("n_outliers"),
             r4(min($"med")).as("med"), r4(min($"mad")).as("mad"))
        .orderBy($"event_type")
    }),

    // Winsorization: clip telemetry values at the per-type exact p05/p95
    // before aggregation — the outlier guard a training pipeline applies
    // ahead of normalization (clipping, unlike dropping, keeps row counts
    // and downstream joins intact). Same two-pass shape as q_anomaly_mad:
    // one percentile agg, its ≤|types| rows broadcast back onto the fact
    // scan (never reshuffled). Fences are round(6)-pinned BEFORE clamping
    // so both engines clamp at bit-identical cut points; the clipped mean
    // is decimal-routed. At 100 TB the exact percentile becomes
    // percentile_approx/GK (m_agg_quantile IS that path) — kept exact here
    // because the oracle compares exact values.
    "q_winsorize" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_type", $"value")
      val qs = ev.groupBy($"event_type")
        .agg(round(expr("percentile(value, 0.05)"), 6).as("p05"),
             round(expr("percentile(value, 0.95)"), 6).as("p95"))
      ev.join(broadcast(qs), Seq("event_type"))
        .withColumn("clipped", least(greatest($"value", $"p05"), $"p95"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum(when($"value" < $"p05", 1L).otherwise(0L)).as("n_clip_lo"),
             sum(when($"value" > $"p95", 1L).otherwise(0L)).as("n_clip_hi"),
             r4(davg($"value", 6)).as("mean_raw"),
             r4(davg($"clipped", 6)).as("mean_winsor"),
             r4(min($"p05")).as("p05"), r4(min($"p95")).as("p95"))
        .orderBy($"event_type")
    }),

    // Weighted dataset mixture: per-source keep rates (25% for even
    // sources, 75% for odd) applied via an md5 two-nibble threshold on
    // (source, doc_id) — the deterministic downsampling step that rebalances
    // corpus composition before training. Like q_sample_split, the hash key
    // makes the sample stable under re-runs and appends; realized rates
    // concentrate on the target as the corpus grows.
    "q_mix_sources" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("srcnum", regexp_extract($"source", "([0-9]+)$", 1).cast("int"))
        .withColumn("thresh", when(pmod($"srcnum", lit(2)) === 0, "40").otherwise("c0"))
        .withColumn("h2",
          substring(md5(concat($"source", lit(":"), $"doc_id".cast("string"))), 1, 2))
        .withColumn("keep", $"h2" < $"thresh")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
             r4(sum(when($"keep", 1L).otherwise(0L)) * lit(1.0) / count(lit(1)))
               .as("kept_frac"))
        .orderBy($"source")
    }),

    // lineitem⋈orders, partial aggs); TopK via ORDER BY + LIMIT 10 is a
    // TakeOrderedAndProject — no full sort at scale.
    "q_sql_tpch" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem").foreach { n =>
        t(s, dir, n).createOrReplaceTempView(n)
      }
      s.sql(tpchQ3)
    }),

    // Daily conversion funnel view → click → purchase, per (user, day):
    // three stacked running-min windows over ONE (user, day) sort (Catalyst
    // collapses them into a single shuffle + sort; each step's "reached"
    // timestamp is the min qualifying event AFTER the previous step was
    // reached, the strictly-ordered funnel semantics), then a user-day
    // rollup and a ≤4-row depth histogram with integer-exact step-delay
    // sums. Windows are ROWS-framed explicitly so Spark and DuckDB agree
    // on same-timestamp rows (ties broken by event_id in the sort).
    // Cohort retention: users grouped by their first-activity day, then
    // distinct active users per (cohort_day, day_offset) — the
    // product-analytics staple. The cohort day is a min-window over the
    // user partition, NOT a self-join against a first-day aggregate: the
    // window form scans events once and shuffles once on user_id (the join
    // form scans twice and shuffles three times — its two exchange
    // subplans differ, so Catalyst cannot reuse them). The distinct count
    // then rides Spark's two-phase expansion: partial de-dup on
    // (cohort, offset, user) before the final hash agg. Day arithmetic
    // stays in integer ms (the events-ns truncation rule).
    "q_retention" -> ((s, dir) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      t(s, dir, "events")
        .withColumn("day", expr("unix_millis(ts) div 86400000"))
        .withColumn("cohort_day", min($"day").over(wu))
        .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_day", $"day_offset")
    }),

    "q_funnel" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"day").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("day", expr("ts_us div 86400000000"))
        .select($"user_id", $"day", $"event_type", $"ts_us", $"event_id")
      val s3 = e
        .withColumn("sv", min(when($"event_type" === "view", $"ts_us")).over(w))
        .withColumn("sc", min(when($"event_type" === "click" && $"sv".isNotNull,
          $"ts_us")).over(w))
        .withColumn("sp", min(when($"event_type" === "purchase" && $"sc".isNotNull,
          $"ts_us")).over(w))
      s3.groupBy($"user_id", $"day")
        .agg(min($"sv").as("v"), min($"sc").as("c"), min($"sp").as("p"))
        .withColumn("depth",
          when($"p".isNotNull, 3L).when($"c".isNotNull, 2L)
            .when($"v".isNotNull, 1L).otherwise(0L))
        .groupBy($"depth")
        .agg(count(lit(1)).as("n_user_days"),
             sum(when($"c".isNotNull, $"c" - $"v")).as("sum_vc_us"),
             sum(when($"p".isNotNull, $"p" - $"c")).as("sum_cp_us"))
        .orderBy($"depth")
    }),

    "q_sql_tpch_q5" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ5) }),
    "q_sql_tpch_q21" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ21) }),
    "q_sql_tpch_q16" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ16) }),
    "q_sql_tpch_q18" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ18) }),
    "q_sql_tpch_q7"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ7) }),
    "q_sql_tpch_q8"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ8) }),
    "q_sql_tpch_q17" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ17) }),
    "q_sql_tpch_q4"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ4) }),
    "q_sql_tpch_q6"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ6) }),
    "q_sql_tpch_q10" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ10) }),
    "q_sql_tpch_q12" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ12) }),
    "q_sql_tpch_q13" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ13) }),
    "q_sql_tpch_q14" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ14) }),
    "q_sql_tpch_q19" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ19) }),
    "q_sql_tpch_q22" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ22) }),
    "q_sql_tpch_q1"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ1) }),
    "q_sql_tpch_q2"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ2) }),
    "q_sql_tpch_q9"  -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ9) }),
    "q_sql_tpch_q11" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ11) }),
    "q_sql_tpch_q15" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ15) }),
    "q_sql_tpch_q20" -> ((s, dir) => { tpchViews(s, dir); s.sql(tpchQ20) }),

    // Linear interpolation over the gap-filled hourly grid: an empty
    // bucket takes the value on the line between its nearest observed
    // neighbours (edge gaps clamp to the single available neighbour) —
    // the repair step before mean-sensitive features, where zero-fill
    // (q_time_resample) would bias the level. Two window passes over the
    // SAME global order, on a grid whose size tracks the TIME RANGE (one
    // row per hour), never the input volume. FP parity: the interpolation
    // arithmetic runs on sum_value doubles that are already decimal-exact
    // and identical in both engines.
    "q_time_interp" -> ((s, dir) => {
      import s.implicits._
      val wPrev = Window.orderBy($"bucket_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.orderBy($"bucket_ms")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      resampled(s, dir)
        .withColumn("v", when($"n_events" > 0, $"sum_value"))
        .withColumn("pv", last($"v", ignoreNulls = true).over(wPrev))
        .withColumn("pms",
          last(when($"v".isNotNull, $"bucket_ms"), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first($"v", ignoreNulls = true).over(wNext))
        .withColumn("nms",
          first(when($"v".isNotNull, $"bucket_ms"), ignoreNulls = true).over(wNext))
        .withColumn("interp", r4(
          when($"v".isNotNull, $"v")
            .when($"pv".isNull, $"nv")
            .when($"nv".isNull, $"pv")
            .otherwise($"pv" + ($"nv" - $"pv") *
              ($"bucket_ms" - $"pms").cast("double") / ($"nms" - $"pms"))))
        .select($"bucket_ms", $"n_events", $"interp")
        .orderBy($"bucket_ms")
    }),

    // Conversion attribution — the marketing-analytics standard pair of
    // credit rules over each purchase's user timeline: LAST-touch = the
    // nearest preceding non-purchase event's type (the channel that closed),
    // FIRST-touch = the user's first event's type (the channel that
    // acquired). Per channel: conversions and attributed revenue under each
    // rule. ONE fact scan, one user-partitioned window pass (the running-
    // last-non-null idiom q_time_interp/q_time_burst use), two ≤|types|-row
    // aggs full-outer-joined on the channel — purchases with no preceding
    // touch attribute to the 'none' channel rather than silently dropping.
    "q_events_attr" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val a = t(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type", $"value",
          unix_micros($"ts").as("ts_us"))
        .withColumn("nonp",
          when($"event_type" =!= "purchase", $"event_type"))
        .withColumn("lt", coalesce(
          last($"nonp", ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit("none")))
        .withColumn("ft", first($"event_type").over(w))
        .filter($"event_type" === "purchase")
      // ONE fact scan: aggregate to the ≤|types|²-row (lt, ft) pair frame
      // first, then derive both credit views from it — the per-rule
      // re-aggregations run on the tiny pair frame, never the fact table
      val pairs = a.groupBy($"lt", $"ft")
        .agg(count(lit(1)).as("n"),
             sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev"))
        // lazy checkpoint: both credit views read this ≤|types|²-row frame —
        // without it each branch re-derives the whole windowed fact scan
        .localCheckpoint(eager = false)
      val byLast = pairs.groupBy($"lt".as("channel"))
        .agg(sum($"n").as("n_last"),
             round(sum($"rev"), 4).cast("double").as("rev_last"))
      val byFirst = pairs.groupBy($"ft".as("channel"))
        .agg(sum($"n").as("n_first"),
             round(sum($"rev"), 4).cast("double").as("rev_first"))
      byLast.join(byFirst, Seq("channel"), "full_outer")
        .select($"channel",
          coalesce($"n_last", lit(0L)).as("n_last"),
          coalesce($"rev_last", lit(0.0)).as("rev_last"),
          coalesce($"n_first", lit(0L)).as("n_first"),
          coalesce($"rev_first", lit(0.0)).as("rev_first"))
        .orderBy($"channel")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_events_attr" ->
      s"""WITH p AS (
         |  SELECT user_id, event_id, event_type, value,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         |    CASE WHEN event_type <> 'purchase' THEN event_type END AS nonp
         |  FROM events),
         |a AS (
         |  SELECT event_type, value,
         |    COALESCE(last_value(nonp IGNORE NULLS) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'none') AS lt,
         |    first_value(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id) AS ft
         |  FROM p),
         |pur AS (SELECT * FROM a WHERE event_type = 'purchase'),
         |bl AS (SELECT lt AS channel, COUNT(*) AS n_last,
         |         ${oSumR("value", 4)} AS rev_last
         |       FROM pur GROUP BY lt),
         |bf AS (SELECT ft AS channel, COUNT(*) AS n_first,
         |         ${oSumR("value", 4)} AS rev_first
         |       FROM pur GROUP BY ft)
         |SELECT COALESCE(bl.channel, bf.channel) AS channel,
         |  CAST(COALESCE(n_last, 0) AS BIGINT) AS n_last,
         |  COALESCE(rev_last, 0.0) AS rev_last,
         |  CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first,
         |  COALESCE(rev_first, 0.0) AS rev_first
         |FROM bl FULL OUTER JOIN bf ON bl.channel = bf.channel
         |ORDER BY channel""".stripMargin,

    "q_dedup_latest" ->
      """SELECT user_id, event_id AS latest_event, ts_us AS latest_ts_us, value
        |FROM (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
        |    row_number() OVER (
        |      PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_time_resample" -> (resampledCte +
      """
        |SELECT bucket_ms, n_events, sum_value FROM res ORDER BY bucket_ms""".stripMargin),

    "q_roll_mean" -> (resampledCte +
      """
        |SELECT bucket_ms, n_events,
        |  round(CAST(SUM(n_events) OVER w AS DOUBLE) / (COUNT(*) OVER w), 4)
        |    AS roll_events,
        |  CAST(round(SUM(CAST(sum_value AS DECIMAL(18,6))) OVER w, 4) AS DOUBLE)
        |    AS roll_value
        |FROM res
        |WINDOW w AS (ORDER BY bucket_ms ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        |ORDER BY bucket_ms""".stripMargin),

    "q_anomaly_zscore" ->
      s"""WITH st AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    ${oSum("value", 6)} AS s1,
         |    ${oSum("value * value", 6)} AS s2
         |  FROM events GROUP BY event_type),
         |x AS (
         |  SELECT event_type, s1 / n AS mean,
         |    CASE WHEN n > 1
         |         THEN sqrt(GREATEST((s2 - s1 * s1 / n) / (n - 1), 0)) END AS sd
         |  FROM st)
         |SELECT e.event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CASE WHEN e.value > mean + 3.0 * sd
         |                  OR e.value < mean - 3.0 * sd THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers,
         |  round(MIN(mean), 4) AS mean, round(MIN(sd), 4) AS sd
         |FROM events e JOIN x USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // quantile_cont (NOT DuckDB's median: on DECIMAL inputs it returns the
    // lower middle, not the interpolation Spark's median computes).
    "q_anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type,
        |    round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * x.mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(MIN(d.med), 4) AS med, round(MIN(x.mad), 4) AS mad
        |FROM dev d JOIN mad x USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q_winsorize" ->
      """WITH qs AS (
        |  SELECT event_type,
        |    round(quantile_cont(CAST(value AS DOUBLE), 0.05), 6) AS p05,
        |    round(quantile_cont(CAST(value AS DOUBLE), 0.95), 6) AS p95
        |  FROM events GROUP BY event_type),
        |j AS (
        |  SELECT e.event_type, e.value, q.p05, q.p95,
        |    least(greatest(e.value, q.p05), q.p95) AS clipped
        |  FROM events e JOIN qs q USING (event_type))
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 4)
        |    AS mean_raw,
        |  round(CAST(SUM(CAST(clipped AS DECIMAL(18,6))) AS DOUBLE) / COUNT(clipped), 4)
        |    AS mean_winsor,
        |  round(MIN(p05), 4) AS p05, round(MIN(p95), 4) AS p95
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_mix_sources" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 2 = 0
        |         THEN '40' ELSE 'c0' END AS thresh,
        |    substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN h2 < thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(SUM(CASE WHEN h2 < thresh THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
        |    AS kept_frac
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q_pivot" ->
      s"""SELECT l_returnflag,
         |  ${oSumR("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 4)} AS qty_f,
         |  ${oSumR("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 4)} AS qty_o
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_unpivot" ->
      s"""WITH a AS (
         |  SELECT c_mktsegment,
         |    round(${oAvg("c_acctbal", 2)}, 3) AS avg_acctbal,
         |    CAST(COUNT(*) AS DOUBLE) AS n_cust
         |  FROM customer GROUP BY c_mktsegment)
         |SELECT c_mktsegment, 'avg_acctbal' AS metric, avg_acctbal AS value FROM a
         |UNION ALL
         |SELECT c_mktsegment, 'n_cust' AS metric, n_cust AS value FROM a
         |ORDER BY c_mktsegment, metric""".stripMargin,

    "q_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
           |  round(CAST(MIN($c) AS DOUBLE), 4) AS min_num,
           |  round(CAST(MAX($c) AS DOUBLE), 4) AS max_num
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS col, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
           |FROM orders""".stripMargin
      Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
          num("o_totalprice"), str("o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col")
    },

    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (
        |  SELECT user_id, ts_us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM s1),
        |s3 AS (
        |  SELECT user_id, sess_id, COUNT(*) AS n, MAX(ts_us) - MIN(ts_us) AS span_us
        |  FROM s2 GROUP BY user_id, sess_id)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(MAX(span_us) AS BIGINT) AS max_span_us
        |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The q_mine_cep recursive-walk oracle shape with the token-bucket
    // state: prev/credit/admitted per step, the credit expression
    // expanded per column (recursive CTEs bind no locals).
    "q_events_ratelimit" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |arr AS (
        |  SELECT user_id,
        |    list(struct_pack(t := ts_us, e := event_id)
        |         ORDER BY ts_us, event_id) AS a
        |  FROM e GROUP BY user_id),
        |walk(uid, i, prev, credit, adm) AS (
        |  SELECT user_id, 0, CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT) FROM arr
        |  UNION ALL
        |  SELECT w.uid, w.i + 1, t.a[w.i+1].t,
        |    CASE WHEN (CASE WHEN w.prev < 0 THEN 86400000000
        |               ELSE least(86400000000,
        |                          w.credit + (t.a[w.i+1].t - w.prev)) END)
        |              >= 43200000000
        |      THEN (CASE WHEN w.prev < 0 THEN 86400000000
        |            ELSE least(86400000000,
        |                       w.credit + (t.a[w.i+1].t - w.prev)) END)
        |           - 43200000000
        |      ELSE (CASE WHEN w.prev < 0 THEN 86400000000
        |            ELSE least(86400000000,
        |                       w.credit + (t.a[w.i+1].t - w.prev)) END) END,
        |    CASE WHEN (CASE WHEN w.prev < 0 THEN 86400000000
        |               ELSE least(86400000000,
        |                          w.credit + (t.a[w.i+1].t - w.prev)) END)
        |              >= 43200000000
        |      THEN w.adm + 1 ELSE w.adm END
        |  FROM walk w JOIN arr t ON w.uid = t.user_id WHERE w.i < len(t.a))
        |SELECT a2.user_id, CAST(len(a2.a) AS BIGINT) AS n_events,
        |  CAST(w.adm AS BIGINT) AS n_admitted,
        |  CAST(len(a2.a) - w.adm AS BIGINT) AS n_dropped
        |FROM walk w JOIN arr a2 ON w.uid = a2.user_id AND w.i = len(a2.a)
        |ORDER BY a2.user_id""".stripMargin,

    "q_time_seasonal" ->
      s"""WITH ev AS (
         |  SELECT event_type, value,
         |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow
         |  FROM events),
         |per AS (
         |  SELECT event_type, dow, COUNT(*) AS n,
         |    ${Q.oAvg("value", 6)} AS dow_avg
         |  FROM ev GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type AS et, ${Q.oAvg("value", 6)} AS all_avg
         |  FROM ev GROUP BY 1)
         |SELECT event_type, dow, n, round(dow_avg, 4) AS avg_val,
         |  round(dow_avg / all_avg, 4) AS idx
         |FROM per JOIN tot ON per.event_type = tot.et
         |ORDER BY event_type, dow""".stripMargin,

    "q_sessionize_native" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s1 AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s2 AS (
        |  SELECT user_id, ts_us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s1),
        |s3 AS (
        |  SELECT user_id, sid, COUNT(*) AS n,
        |    MAX(ts_us) - MIN(ts_us) + 1800000000 AS win_us
        |  FROM s2 GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(MAX(win_us) AS BIGINT) AS max_win_us
        |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_streak" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts_us, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |                         ORDER BY ts_us, event_id) AS isl
        |  FROM ev),
        |runs AS (
        |  SELECT user_id, event_type, isl, COUNT(*) AS len
        |  FROM marked GROUP BY user_id, event_type, isl)
        |SELECT user_id, event_type, COUNT(*) AS n_streaks,
        |  MAX(len) AS max_streak
        |FROM runs GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q_join_salted" ->
      s"""SELECT o_orderpriority,
         |  ${oSumR("l_extendedprice * (1.0 - l_discount)", 4, 6)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
        |  FROM events),
        |c AS (
        |  SELECT *, lag(event_type, 1) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |  FROM e),
        |ch AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM c
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS attr, ts_us AS valid_from,
        |  lead(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    AS valid_to,
        |  (lead(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    IS NULL) AS is_current
        |FROM ch ORDER BY user_id, valid_from, attr, event_id""".stripMargin,

    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day
        |  FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts_us // 86400000000 AS day, event_type, ts_us, event_id
        |  FROM (SELECT user_id, event_type,
        |          epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
        |        FROM events) x),
        |s1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
        |    OVER (PARTITION BY user_id, day ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv FROM e),
        |s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND sv IS NOT NULL THEN ts_us END)
        |    OVER (PARTITION BY user_id, day ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc FROM s1),
        |s3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND sc IS NOT NULL THEN ts_us END)
        |    OVER (PARTITION BY user_id, day ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sp FROM s2),
        |u AS (SELECT user_id, day, MIN(sv) AS v, MIN(sc) AS c, MIN(sp) AS p
        |      FROM s3 GROUP BY 1, 2)
        |SELECT CAST(CASE WHEN p IS NOT NULL THEN 3 WHEN c IS NOT NULL THEN 2
        |            WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth,
        |  COUNT(*) AS n_user_days,
        |  CAST(SUM(CASE WHEN c IS NOT NULL THEN c - v END) AS BIGINT) AS sum_vc_us,
        |  CAST(SUM(CASE WHEN p IS NOT NULL THEN p - c END) AS BIGINT) AS sum_cp_us
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sql_tpch" -> tpchQ3,
    "q_sql_tpch_q5" -> tpchQ5,
    "q_sql_tpch_q21" -> tpchQ21,
    "q_sql_tpch_q16" -> tpchQ16,
    "q_sql_tpch_q18" -> tpchQ18,
    "q_sql_tpch_q7"  -> tpchQ7,
    "q_sql_tpch_q8"  -> tpchQ8,
    "q_sql_tpch_q17" -> tpchQ17,
    "q_sql_tpch_q4"  -> tpchQ4,
    "q_sql_tpch_q6"  -> tpchQ6,
    "q_sql_tpch_q10" -> tpchQ10,
    "q_sql_tpch_q12" -> tpchQ12,
    "q_sql_tpch_q13" -> tpchQ13,
    "q_sql_tpch_q14" -> tpchQ14,
    "q_sql_tpch_q19" -> tpchQ19,
    "q_sql_tpch_q22" -> tpchQ22,
    "q_sql_tpch_q1"  -> tpchQ1,
    "q_sql_tpch_q2"  -> tpchQ2,
    "q_sql_tpch_q9"  -> tpchQ9,
    "q_sql_tpch_q11" -> tpchQ11,
    "q_sql_tpch_q15" -> tpchQ15,
    "q_sql_tpch_q20" -> tpchQ20,

    "q_time_interp" -> (resampledCte +
      """,
        |iv AS (
        |  SELECT bucket_ms, n_events,
        |    CASE WHEN n_events > 0 THEN sum_value END AS v
        |  FROM res),
        |x AS (
        |  SELECT bucket_ms, n_events, v,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket_ms END IGNORE NULLS)
        |      OVER wp AS pms,
        |    first_value(v IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket_ms END IGNORE NULLS)
        |      OVER wn AS nms
        |  FROM iv
        |  WINDOW wp AS (ORDER BY bucket_ms
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (ORDER BY bucket_ms
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT bucket_ms, n_events,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * CAST(bucket_ms - pms AS DOUBLE)
        |                  / (nms - pms) END, 4) AS interp
        |FROM x ORDER BY bucket_ms""".stripMargin),

    "q_histogram" ->
      s"""SELECT bucket, CAST(bucket * 25000 AS DOUBLE) AS bucket_lo,
         |  COUNT(*) AS n, ${oSumR("o_totalprice", 2, 2)} AS sum_price
         |FROM (SELECT CAST(LEAST(FLOOR(o_totalprice / 25000.0), 19.0) AS BIGINT) AS bucket,
         |             o_totalprice
         |      FROM orders) t
         |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_upsert" ->
      s"""WITH d AS (
         |  SELECT user_id, ${oSum("value", 6)} AS delta
         |  FROM events GROUP BY user_id)
         |SELECT c_nationkey, COUNT(*) AS n_cust, COUNT(delta) AS n_updated,
         |  ${oSumR("round(c_acctbal + COALESCE(delta, 0.0), 2)", 2, 2)} AS total_bal
         |FROM customer LEFT JOIN d ON c_custkey = user_id
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
