package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.12 — user-defined aggregate surface. The declared query uses
  * the decimal-exact log-sum formulation (oracle parity); the reusable
  * [[graft.functions.GeomMean]] `Aggregator` is unit-tested against it. */
object Custom extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_udaf_geomean" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(r4(exp(dsum(log($"o_totalprice"), 6) / count(lit(1)))).as("geomean_price"),
             count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_udaf_geomean" ->
      """SELECT o_orderstatus,
        |  round(exp(CAST(SUM(CAST(ln(o_totalprice) AS DECIMAL(18,6))) AS DOUBLE)
        |            / COUNT(*)), 4) AS geomean_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
