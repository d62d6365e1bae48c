package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, IntegerType}
import Q._

/** SURVEY §2.8 — scalar function suites (string/date/math/array/json).
  *
  * Cross-engine traps handled here (SURVEY §7.3 item 3): integer-typed
  * results are cast to BIGINT on both sides (Spark length/size are INT,
  * DuckDB's are BIGINT); day-of-week origin differences are avoided; all
  * transcendental per-row results flow into decimal-backed sums so 1-ulp
  * libm-vs-JVM differences are rounded away identically. */
object Scalars extends QueryGroup {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  val queries: Map[String, QFn] = Map(
    "q_str_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part").select(
        $"p_partkey",
        upper($"p_brand").as("up"),
        lower($"p_type").as("lo"),
        substring($"p_name", 1, 8).as("sub"),
        length($"p_name").cast("long").as("len"),
        concat_ws("-", $"p_brand", $"p_type").as("cw"),
        lpad($"p_brand", 12, "*").as("lp"),
        regexp_replace($"p_name", " ", "_").as("rep"),
        trim(concat(lit("  "), $"p_name", lit("  "))).as("trm"),
        regexp_extract($"p_brand", "([0-9]+)$", 1).as("brandnum")
      ).orderBy($"p_partkey")
    }),

    "q_str_split" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .withColumn("toks", split($"p_name", " "))
        // try_element_at: NULL out of range like DuckDB's list[i] — ANSI
        // element_at would throw on a single-word p_name.
        .select(try_element_at($"toks", lit(1)).as("first_word"),
                try_element_at($"toks", lit(2)).as("second_word"))
        .groupBy($"second_word")
        .agg(count(lit(1)).as("n"),
             countDistinct($"first_word").as("n_first"))
        .orderBy($"second_word")
    }),

    "q_date_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("od", $"o_orderdate".cast("date"))
        .groupBy(year($"od").cast("long").as("y"),
                 quarter($"od").cast("long").as("q"))
        .agg(count(lit(1)).as("n_orders"),
             dsumR($"o_totalprice", 4).as("revenue"),
             max(date_format(last_day($"od"), "yyyy-MM-dd")).as("max_lastday"),
             max(date_format(date_add($"od", 30), "yyyy-MM-dd")).as("max_d30"),
             max(date_format(date_trunc("month", $"od"), "yyyy-MM-dd")).as("max_m_trunc"))
        .orderBy($"y", $"q")
    }),

    "q_math_funcs" -> ((s, dir) => {
      import s.implicits._
      val comp =
        sin($"l_quantity") + cos($"l_discount" * 10.0) +
        atan2($"l_tax", lit(1.0) + $"l_discount") +
        sqrt($"l_quantity") + exp(-$"l_discount") +
        log(lit(1.0) + $"l_quantity") + log10(lit(1.0) + $"l_extendedprice") +
        abs(signum($"l_discount" - 0.05)) +
        pow($"l_tax" + 1.0, 2.0) +
        floor($"l_quantity" / 7.0).cast("double") +
        ceil($"l_quantity" / 11.0).cast("double") +
        ($"l_linenumber" % 3).cast("double")
      t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n_rows"), r4(davg(comp, 6)).as("chk"))
        .orderBy($"l_linestatus")
    }),

    "q_arr_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("toks", split($"text", " "))
        .select($"doc_id",
                size($"toks").cast("long").as("n_tokens"),
                array_contains($"toks", "join").as("has_join"),
                size(array_distinct($"toks")).cast("long").as("n_distinct"))
        .orderBy($"doc_id")
    }),

    "q_json_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", from_json($"props", propsSchema).getField("k"))
        .withColumn("bucket", ($"k" % 10).cast("long"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_events"),
             countDistinct($"k").as("n_k"),
             dsumR($"value", 4, 6).as("sum_value"))
        .orderBy($"bucket")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS up, lower(p_type) AS lo,
        |  substring(p_name, 1, 8) AS sub,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  concat_ws('-', p_brand, p_type) AS cw,
        |  lpad(p_brand, 12, '*') AS lp,
        |  replace(p_name, ' ', '_') AS rep,
        |  trim('  ' || p_name || '  ') AS trm,
        |  regexp_extract(p_brand, '([0-9]+)$', 1) AS brandnum
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_split" ->
      """SELECT second_word, COUNT(*) AS n, COUNT(DISTINCT first_word) AS n_first
        |FROM (SELECT string_split(p_name, ' ')[1] AS first_word,
        |             string_split(p_name, ' ')[2] AS second_word FROM part) t
        |GROUP BY second_word ORDER BY second_word""".stripMargin,

    "q_date_funcs" ->
      s"""SELECT CAST(year(od) AS BIGINT) AS y, CAST(quarter(od) AS BIGINT) AS q,
         |  COUNT(*) AS n_orders,
         |  ${oSumR("o_totalprice", 4)} AS revenue,
         |  max(strftime(last_day(od), '%Y-%m-%d')) AS max_lastday,
         |  max(strftime(od + 30, '%Y-%m-%d')) AS max_d30,
         |  max(strftime(date_trunc('month', od), '%Y-%m-%d')) AS max_m_trunc
         |FROM (SELECT *, CAST(o_orderdate AS DATE) AS od FROM orders) t
         |GROUP BY 1, 2 ORDER BY y, q""".stripMargin,

    "q_math_funcs" ->
      s"""SELECT l_linestatus, COUNT(*) AS n_rows,
         |  round(${oAvg(
            "sin(l_quantity) + cos(l_discount * 10.0) + atan2(l_tax, 1.0 + l_discount)" +
            " + sqrt(l_quantity) + exp(-l_discount) + ln(1.0 + l_quantity)" +
            " + log10(1.0 + l_extendedprice) + abs(sign(l_discount - 0.05))" +
            " + pow(l_tax + 1.0, 2.0) + CAST(floor(l_quantity / 7.0) AS DOUBLE)" +
            " + CAST(ceil(l_quantity / 11.0) AS DOUBLE) + CAST(l_linenumber % 3 AS DOUBLE)", 6)}, 4) AS chk
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_arr_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  list_contains(string_split(text, ' '), 'join') AS has_join,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_json_funcs" ->
      s"""SELECT CAST(k % 10 AS BIGINT) AS bucket,
         |  COUNT(*) AS n_events, COUNT(DISTINCT k) AS n_k,
         |  ${oSumR("value", 4, 6)} AS sum_value
         |FROM (SELECT CAST(json_extract_string(props, '$$.k') AS INT) AS k, value
         |      FROM events) t
         |GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
