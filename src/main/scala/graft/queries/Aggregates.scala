package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.4 — aggregation suite. Hash aggregates with automatic
  * partial+final (map-side combine); at 100 TB the shuffle carries only
  * (group key → partial state), never raw rows. */
object Aggregates extends QueryGroup {

  /** FLAGSHIP: TPC-H Q1-shaped pricing summary. */
  def pricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r4(dsum($"l_quantity")).as("sum_qty"),
        r4(dsum($"l_extendedprice")).as("sum_base_price"),
        r4(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)).as("sum_disc_price"),
        r4(davg($"l_quantity")).as("avg_qty"),
        r4(davg($"l_extendedprice")).as("avg_price"),
        r4(davg($"l_discount", 6)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, QFn] = Map(
    "q_agg_pricing" -> (pricing _)
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(${oSum("l_quantity")}, 4) AS sum_qty,
         |  round(${oSum("l_extendedprice")}, 4) AS sum_base_price,
         |  round(${oSum("l_extendedprice * (1.0 - l_discount)", 6)}, 4) AS sum_disc_price,
         |  round(${oAvg("l_quantity")}, 4) AS avg_qty,
         |  round(${oAvg("l_extendedprice")}, 4) AS avg_price,
         |  round(${oAvg("l_discount", 6)}, 4) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
