package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.1 — scans/sources. Column pruning must reach the parquet
  * reader: `q_scan_project` reads exactly 4 of lineitem's 11 columns
  * (check `ReadSchema` in explain), which at 100 TB is the difference
  * between scanning 36 TB and 100 TB. */
object Scans extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_scan_project" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_scan_count" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.names.map { name =>
        t(s, dir, name).groupBy().agg(count(lit(1)).as("n"))
          .select(lit(name).as("tbl"), $"n")
      }.reduce(_ unionAll _).orderBy($"tbl")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scan_count" ->
      graft.Tables.names
        .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl")
  )
}
