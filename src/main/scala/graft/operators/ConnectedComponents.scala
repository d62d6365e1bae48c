package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-native connected components via min-label propagation with
  * pointer jumping.
  *
  * Why not GraphX `ConnectedComponents`: that is Pregel min-propagation,
  * which needs O(graph diameter) supersteps — on geometric graphs (ε-edges
  * over point sets) the giant component's diameter is huge and the Pregel
  * chain dominates the whole DBSCAN runtime. Min-propagation + pointer
  * jumping (label ← label-of-label each round) converges in O(log diameter)
  * rounds, every round two shuffles on (vertex id) — the MapReduce CC
  * construction of Kiveris et al., "Connected Components in MapReduce and
  * Beyond" (SOCC'14), expressed in plain joins so Catalyst/AQE manage the
  * physical plan. Labels are vertex-id minima → deterministic output.
  */
object ConnectedComponents {

  /** @param vertices single `id` column
    * @param edges `src`,`dst` (each undirected edge once is enough)
    * @return (id, comp) — comp is the min vertex id reachable */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIter: Int = 25): DataFrame = {
    import spark.implicits._
    // Empty graph: zero vertices means zero labels — and `sum` over zero
    // rows is NULL, so the convergence read below would NPE. Guard here.
    if (vertices.isEmpty) return vertices.select($"id", $"id".as("comp"))
    val sym = edges.select($"src", $"dst")
      .unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
      .localCheckpoint()

    var labels = vertices.select($"id", $"id".as("comp")).localCheckpoint()
    var prevSum = labels.agg(coalesce(sum($"comp"), lit(0L))).as[Long].head()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min over own label and all neighbor labels
      val nbrMin = sym
        .join(labels.select($"id".as("dst"), $"comp"), Seq("dst"))
        .groupBy($"src").agg(min($"comp").as("nc"))
        .withColumnRenamed("src", "id")
      // Materialized before the self-join below: both sides of the pointer
      // jump read `stepped`, and without the checkpoint each side would
      // replay the full neighbor-min shuffle join — the round-1 bench
      // showed that double recompute dominating the whole DBSCAN runtime.
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select($"id", least($"comp", coalesce($"nc", $"comp")).as("comp"))
        .localCheckpoint()
      // pointer jump: comp ← comp(comp); comp values are vertex ids
      val jumped = stepped
        .join(stepped.select($"id".as("comp"), $"comp".as("cc2")), Seq("comp"), "left")
        .select($"id", coalesce($"cc2", $"comp").as("comp"))
        .localCheckpoint() // cut lineage; also materializes for the sum check
      // Labels only ever decrease, so an unchanged sum ⟺ a fixpoint; the
      // agg scans the just-checkpointed partitions — no shuffle replay.
      val newSum = jumped.agg(coalesce(sum($"comp"), lit(0L))).as[Long].head()
      converged = newSum == prevSum
      prevSum = newSum
      labels = jumped
      i += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] ConnectedComponents: no fixpoint after $maxIter rounds — labels may be unconverged")
    labels
  }
}
