package graft

/** SURVEY §4 — physical-plan discipline guards. These assertions pin the
  * properties that make the contract queries survive a 100× scale-up:
  * column pruning and predicate pushdown reaching the parquet scan,
  * explicit broadcasts staying broadcast, top-k staying
  * TakeOrderedAndProject (never a full sort), and partial (map-side)
  * aggregation being present. A refactor that silently loses one of these
  * still passes the value-correctness gates — this spec is what fails. */
class PlanSpec extends BaseSpec {

  private def planOf(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  test("q_scan_project prunes lineitem to exactly its 4 columns") {
    val p = planOf("q_scan_project")
    assert(p.contains("ReadSchema"), s"no parquet scan found:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
             .forall(read.contains), s"pruned schema lost a column: $read")
    assert(!read.contains("l_comment") && !read.contains("l_shipdate") &&
           !read.contains("l_discount"), s"unpruned column leaked into scan: $read")
  }

  test("q_filter_pred pushes its predicates into the parquet scan") {
    val p = planOf("q_filter_pred")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") || pushed.contains("GreaterThanOrEqual"),
      s"shipdate bound not pushed: $pushed")
    assert(pushed.contains("l_quantity") || pushed.contains("LessThan"),
      s"quantity bound not pushed: $pushed")
  }

  test("explicit dim-side broadcasts survive planning") {
    for (key <- Seq("q_join_broadcast", "q_join_interval")) {
      val p = planOf(key)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$key lost its broadcast:\n$p")
    }
  }

  test("top-k queries plan as TakeOrderedAndProject, not a global sort") {
    val p = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"q_topk plans a full sort:\n$p")
    val sql = planOf("q_sql_tpch")
    assert(sql.contains("TakeOrderedAndProject"), s"q_sql_tpch plans a full sort:\n$sql")
  }

  test("flagship aggregate keeps partial (map-side) aggregation") {
    val p = planOf("q_agg_pricing")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate pair, got $hashAggs:\n$p")
  }

  test("native expressions stay inside whole-stage codegen") {
    // CosineSim / HaversineDist / BrpBuckets implement doGenCode — the
    // queries that use them must show WholeStageCodegen spans, not
    // fallback row-at-a-time projections.
    for (key <- Seq("q_geo_haversine", "q_sim_cosine")) {
      // Codegen spans only appear once AQE finalizes the plan — run it.
      val df = SparkEntry.queries(key)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$key AQE plan not finalized:\n$p")
      // The simpleString tree marks codegen stages with "*(n)" prefixes.
      assert(p.contains("*("), s"$key fell out of codegen:\n$p")
      val proj = p.linesIterator.filter(l =>
        l.contains("haversine_km") || l.contains("cosine_sim")).toList
      // (the AQE string repeats the tree in its "Initial Plan" section
      // without codegen markers — only the final-plan occurrence counts)
      assert(proj.exists(_.contains("*(")),
        s"$key native expression sits outside a codegen span:\n${proj.mkString("\n")}")
    }
  }
}
