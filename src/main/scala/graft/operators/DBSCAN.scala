package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN(ε, minPts) — MLlib has none, so composed Spark-first
  * (SURVEY §2.10 `m_dbscan`): grid-bucketed candidate pairs + GraphX
  * connected components. No planner extension needed — this is an algorithm,
  * not an operator.
  *
  * Scale design: cell size = ε, so every ε-neighbor of a point lies in its
  * 3×3 cell neighborhood. Candidate generation is an equi-join on cell key
  * (shuffle on cell, no N² pairs); each point is replicated 9× on the probe
  * side only. Core flags and degrees are hash aggregates. Only core–core
  * ε-edges enter connected components, whose iterations shuffle O(|edges|).
  * At 100 TB density skew (one hot cell) is the risk — the mitigation is
  * two-level partitioning (split hot cells by a salted sub-grid), noted here
  * and property-tested at small scale.
  *
  * Cluster ids are the minimum point id in each component → deterministic.
  */
object DBSCAN {

  /** @param pts DataFrame with (id: Long, x: Double, y: Double)
    * @return (id, role ∈ {core,border,noise}, cluster: Long — -1 for noise)
    */
  def run(spark: SparkSession, pts: DataFrame, eps: Double, minPts: Int): DataFrame = {
    import spark.implicits._
    val p = pts.select($"id".cast("long"), $"x".cast("double"), $"y".cast("double"))

    val withCell = p
      .withColumn("cx", floor($"x" / eps).cast("long"))
      .withColumn("cy", floor($"y" / eps).cast("long"))

    // Probe side: 9 shifted copies so an equi-join on (cx,cy) yields every
    // pair at Chebyshev cell distance ≤ 1 — a superset of all ε-pairs.
    val shifts = Seq(-1L, 0L, 1L)
    val probe = shifts.flatMap(dx => shifts.map(dy =>
      withCell.select($"id".as("id2"), $"x".as("x2"), $"y".as("y2"),
        ($"cx" + dx).as("cx"), ($"cy" + dy).as("cy")))).reduce(_ unionAll _)

    val pairs = withCell.join(probe, Seq("cx", "cy"))
      .filter(($"x" - $"x2") * ($"x" - $"x2") + ($"y" - $"y2") * ($"y" - $"y2") <= eps * eps)
      .select($"id", $"id2")

    // |N_ε(p)| includes p itself (the id==id2 self-pair from the (0,0) shift).
    val degrees = pairs.groupBy($"id").agg(count(lit(1)).as("deg"))
    val core = degrees.filter($"deg" >= minPts).select($"id".as("core_id"))

    val coreEdges = pairs
      .join(core, pairs("id") === core("core_id")).drop("core_id")
      .join(core, pairs("id2") === core("core_id")).drop("core_id")
      .filter($"id" < $"id2")

    val edgeRdd = coreEdges.as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val coreVerts = core.as[Long].rdd.map(id => (id, ()))
    val graph = Graph(coreVerts, edgeRdd)
    // GraphX CC labels each component with its minimum vertex id → deterministic.
    val cc = graph.connectedComponents().vertices.toDF("id", "cluster")

    val coreOut = cc.select($"id", lit("core").as("role"), $"cluster")

    // Border: non-core point within ε of ≥1 core → join pairs against core
    // assignments, take the minimum cluster id for determinism.
    val nonCore = p.select($"id").except(core.select($"core_id".as("id")))
    val borderOut = pairs.join(nonCore, Seq("id"))
      .join(cc.select($"id".as("id2"), $"cluster"), Seq("id2"))
      .groupBy($"id").agg(min($"cluster").as("cluster"))
      .select($"id", lit("border").as("role"), $"cluster")

    val assigned = coreOut.unionAll(borderOut)
    val noiseOut = p.select($"id").except(assigned.select($"id"))
      .select($"id", lit("noise").as("role"), lit(-1L).as("cluster"))

    assigned.unionAll(noiseOut)
  }
}
