package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN(ε, minPts) — MLlib has none, so composed Spark-first
  * (SURVEY §2.10 `m_dbscan`): position contraction + grid-bucketed candidate
  * pairs + large-star/small-star connected components (see
  * [[ConnectedComponents]]). No planner extension needed — this is an
  * algorithm, not an operator.
  *
  * Scale design, in pipeline order:
  *  1. **Position contraction.** Colocated points have identical
  *     ε-neighborhoods, hence identical role and cluster — so identical
  *     (x, y) positions are contracted to one node carrying
  *     (pid = min point id, weight = point count) BEFORE any pairing.
  *     Quantized/lattice coordinates (GPS fixes, derived grids) repeat
  *     heavily, so this shrinks every downstream join and the CC input by
  *     the duplication factor; with all-distinct positions it degrades to a
  *     single extra keyed shuffle.
  *  2. **Grid-bucketed pairs.** Cell size = ε, so every ε-neighbor of a
  *     position lies in its 3×3 cell neighborhood. Candidate generation is
  *     an equi-join on cell key (shuffle on cell, never N² pairs); each
  *     position is replicated 9× on the probe side only.
  *  3. **Weighted degrees.** |N_ε(p)| = Σ weight over positions within ε
  *     (own weight included via the self-pair) — a hash aggregate.
  *  4. **Star-contraction CC** over core positions only — edge set shrinks
  *     every round (see ConnectedComponents scaladoc).
  *  At extreme density skew (one hot cell) a two-level salted sub-grid
  *  split is a known mitigation; it is NOT implemented here — contraction
  *  plus the ε-sized grid and AQE skew handling cover the tested densities.
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

    // 1. Contract identical positions. Reused by pairs and all three role
    // expansions — materialize once.
    val positions = p.groupBy($"x", $"y")
      .agg(min($"id").as("pid"), count(lit(1)).as("w"))
      .localCheckpoint(eager = false)

    val withCell = positions
      .withColumn("cx", floor($"x" / eps).cast("long"))
      .withColumn("cy", floor($"y" / eps).cast("long"))

    // Probe side: each position exploded into its 9 neighbor cells, so an
    // equi-join on (cx,cy) yields every ordered position pair at Chebyshev
    // cell distance ≤ 1 exactly once — a superset of all ε-pairs.
    val probe = withCell
      .select($"pid".as("pid2"), $"x".as("x2"), $"y".as("y2"), $"w".as("w2"),
        explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(cx + dx AS cx, cy + dy AS cy))))"))
          .as("cell"))
      .select($"pid2", $"x2", $"y2", $"w2", $"cell.cx", $"cell.cy")

    // Ordered ε-pairs of distinct positions (self-pair included). Feeds
    // degrees, core edges, and border assignment — materialize once.
    val pairs = withCell.join(probe, Seq("cx", "cy"))
      .filter(($"x" - $"x2") * ($"x" - $"x2") + ($"y" - $"y2") * ($"y" - $"y2") <= eps * eps)
      .select($"pid", $"pid2", $"w2")
      .localCheckpoint(eager = false)

    // Weighted degree: each point at position pid has |N_ε| = Σ w2 over the
    // ε-reachable positions (the self-pair contributes the colocated count).
    val degrees = pairs.groupBy($"pid").agg(sum($"w2").as("deg"))
    val core = degrees.filter($"deg" >= minPts).select($"pid".as("core_pid"))
      .localCheckpoint(eager = false)

    val coreEdges = pairs
      .join(core, pairs("pid") === core("core_pid")).drop("core_pid")
      .join(core, pairs("pid2") === core("core_pid")).drop("core_pid")
      .filter($"pid" < $"pid2")

    // CC labels every core component with its min pid — and pid is the min
    // point id at its position, so the label IS the min core point id.
    val cc = ConnectedComponents.run(spark,
        core.select($"core_pid".as("id")),
        coreEdges.select($"pid".as("src"), $"pid2".as("dst")))
      .withColumnRenamed("comp", "cluster")
      .localCheckpoint(eager = false)

    val corePos = cc.select($"id".as("pid"), lit("core").as("role"), $"cluster")

    // Border: non-core position within ε of ≥1 core position → minimum
    // neighboring cluster id for determinism. Anti-join, not EXCEPT: pids
    // are unique, and anti-join skips EXCEPT's distinct.
    val nonCorePos = positions.select($"pid")
      .join(core.select($"core_pid".as("pid")), Seq("pid"), "left_anti")
    val borderPos = pairs.join(nonCorePos, Seq("pid"))
      .join(cc.select($"id".as("pid2"), $"cluster"), Seq("pid2"))
      .groupBy($"pid").agg(min($"cluster").as("cluster"))
      .select($"pid", lit("border").as("role"), $"cluster")

    val assignedPos = corePos.unionAll(borderPos).localCheckpoint(eager = false)
    val noisePos = positions.select($"pid")
      .join(assignedPos.select($"pid"), Seq("pid"), "left_anti")
      .select($"pid", lit("noise").as("role"), lit(-1L).as("cluster"))

    // Expand position roles back to every point through the (x, y) key.
    val roles = assignedPos.unionAll(noisePos)
    p.join(positions.select($"x", $"y", $"pid"), Seq("x", "y"))
      .join(roles, Seq("pid"))
      .select($"id", $"role", $"cluster")
  }
}
