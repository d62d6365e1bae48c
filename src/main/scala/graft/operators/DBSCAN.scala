package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN(ε, minPts) — MLlib has none, so composed Spark-first
  * (SURVEY §2.10 `m_dbscan`): grid-bucketed candidate pairs + pointer-
  * jumping connected components (see [[ConnectedComponents]]). No planner
  * extension needed — this is an algorithm, not an operator.
  *
  * Scale design: cell size = ε, so every ε-neighbor of a point lies in its
  * 3×3 cell neighborhood. Candidate generation is an equi-join on cell key
  * (shuffle on cell, no N² pairs); each point is replicated 9× on the probe
  * side only. Core flags and degrees are hash aggregates. Only core–core
  * ε-edges enter connected components — O(log diameter) rounds, each
  * shuffling O(|edges|).
  * At 100 TB density skew (one hot cell) is the risk — the known mitigation
  * is two-level partitioning (split hot cells by a salted sub-grid); it is
  * documented here but not implemented, since the ε-sized grid plus AQE skew
  * handling covers the tested densities.
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

    // Probe side: each point exploded into its 9 neighbor cells, so an
    // equi-join on (cx,cy) yields every pair at Chebyshev cell distance ≤ 1
    // — a superset of all ε-pairs. One scan, not nine.
    val probe = withCell
      .select($"id".as("id2"), $"x".as("x2"), $"y".as("y2"),
        explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(cx + dx AS cx, cy + dy AS cy))))"))
          .as("cell"))
      .select($"id2", $"x2", $"y2", $"cell.cx", $"cell.cy")

    // Materialized once: pairs feed degrees, core edges, and the border
    // assignment — without this the grid join would replay per consumer.
    val pairs = withCell.join(probe, Seq("cx", "cy"))
      .filter(($"x" - $"x2") * ($"x" - $"x2") + ($"y" - $"y2") * ($"y" - $"y2") <= eps * eps)
      .select($"id", $"id2")
      .localCheckpoint()

    // |N_ε(p)| includes p itself (the id==id2 self-pair from the (0,0) shift).
    val degrees = pairs.groupBy($"id").agg(count(lit(1)).as("deg"))
    val core = degrees.filter($"deg" >= minPts).select($"id".as("core_id"))
      .localCheckpoint()

    val coreEdges = pairs
      .join(core, pairs("id") === core("core_id")).drop("core_id")
      .join(core, pairs("id2") === core("core_id")).drop("core_id")
      .filter($"id" < $"id2")

    // Pointer-jumping CC labels each component with its min vertex id →
    // deterministic (see ConnectedComponents for why not GraphX Pregel).
    val cc = ConnectedComponents.run(spark,
        core.select($"core_id".as("id")),
        coreEdges.select($"id".as("src"), $"id2".as("dst")))
      .withColumnRenamed("comp", "cluster")

    val coreOut = cc.select($"id", lit("core").as("role"), $"cluster")

    // Border: non-core point within ε of ≥1 core → join pairs against core
    // assignments, take the minimum cluster id for determinism. Anti-joins,
    // not EXCEPT: ids are unique, and anti-join skips EXCEPT's distinct.
    val nonCore = p.select($"id")
      .join(core.select($"core_id".as("id")), Seq("id"), "left_anti")
    val borderOut = pairs.join(nonCore, Seq("id"))
      .join(cc.select($"id".as("id2"), $"cluster"), Seq("id2"))
      .groupBy($"id").agg(min($"cluster").as("cluster"))
      .select($"id", lit("border").as("role"), $"cluster")

    val assigned = coreOut.unionAll(borderOut).localCheckpoint()
    val noiseOut = p.select($"id")
      .join(assigned.select($"id"), Seq("id"), "left_anti")
      .select($"id", lit("noise").as("role"), lit(-1L).as("cluster"))

    assigned.unionAll(noiseOut)
  }
}
