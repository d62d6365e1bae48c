package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over an undirected edge list — the
  * reachability/radius primitive the graph-mining suite was missing beside
  * PageRank (influence), label propagation (communities), triangles
  * (clustering), and CC (dedup components).
  *
  * Frontier-synchronous expansion: layer d+1 is frontier ⋈ edges minus the
  * visited set, so the first layer that reaches a vertex IS its hop
  * distance (the BFS invariant — all seeds start at layer 0). Everything
  * is an id-keyed equi-join or distinct: the frontier join shuffles on the
  * frontier's vertex ids, the anti-join on the candidate ids — both
  * content-keyed, nothing driver-sized. At 100 TB the visited set is the
  * large operand and stays partitioned; each round touches only the
  * frontier's adjacency, which is the property that makes synchronous BFS
  * the standard distributed choice (Pregel's canonical example).
  *
  * Driver-action cadence follows the PageRank/LabelProp discipline: the
  * frontier-empty check runs every `checkEvery` rounds (an empty frontier
  * makes the remaining rounds no-op joins, so a late exit costs cheap
  * empty-frame plans, never wrong results), and checkpoints are eager only
  * on cadence rounds — lineage is cut lazily in between.
  */
object Bfs {
  @volatile var lastIterations: Int = 0

  /** @param edges  undirected pair list (u1, u2), each pair once
    * @param seeds  (id) — distance-0 vertex set
    * @return (id, dist) for every vertex within `maxHops` of a seed */
  def run(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
          maxHops: Int = 8, checkEvery: Int = 2): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"u1".as("src"), $"u2".as("dst"))
      .unionAll(edges.select($"u2".as("src"), $"u1".as("dst")))
      .localCheckpoint(eager = true)

    var visited = seeds.select($"id", lit(0).as("dist"))
      .localCheckpoint(eager = true)
    var frontier = visited.select($"id")
    var d = 0
    var done = false
    while (d < maxHops && !done) {
      d += 1
      val cadence = d % checkEvery == 0 || d == maxHops
      val next = frontier.join(sym, frontier("id") === sym("src"))
        .select(sym("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .select($"id", lit(d).as("dist"))
        .localCheckpoint(eager = cadence)
      visited = visited.unionAll(next).localCheckpoint(eager = false)
      frontier = next.select($"id")
      if (cadence && d < maxHops) done = next.isEmpty
    }
    lastIterations = d
    visited
  }

  /** Per-source BFS: hop distances from EVERY vertex of `sources` to every
    * vertex within `maxHops` — the all-pairs substrate of the closeness /
    * harmonic-centrality key. The identical frontier-synchronous loop,
    * keyed on (src, id): the frontier join still shuffles on the frontier's
    * vertex ids, the anti-join on the composite key — content-keyed
    * equi-joins only, state sized like the oracle's recursive walk
    * (Σ reachable pairs, vertex-set-squared at worst — the CC-scale
    * argument: the USER graph, never the event log). Same cadence
    * discipline as [[run]].
    *
    * @return (src, id, dist) with dist = 0 at each source itself */
  def runFromEach(spark: SparkSession, edges: DataFrame, sources: DataFrame,
                  maxHops: Int = 8, checkEvery: Int = 2): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"u1".as("sv"), $"u2".as("dst"))
      .unionAll(edges.select($"u2".as("sv"), $"u1".as("dst")))
      .localCheckpoint(eager = true)

    var visited = sources.select($"id".as("src"), $"id", lit(0).as("dist"))
      .localCheckpoint(eager = true)
    var frontier = visited.select($"src", $"id")
    var d = 0
    var done = false
    while (d < maxHops && !done) {
      d += 1
      val cadence = d % checkEvery == 0 || d == maxHops
      val next = frontier.join(sym, frontier("id") === sym("sv"))
        .select($"src", sym("dst").as("id")).distinct()
        .join(visited, Seq("src", "id"), "left_anti")
        .select($"src", $"id", lit(d).as("dist"))
        .localCheckpoint(eager = cadence)
      visited = visited.unionAll(next).localCheckpoint(eager = false)
      frontier = next.select($"src", $"id")
      if (cadence && d < maxHops) done = next.isEmpty
    }
    lastIterations = d
    visited
  }
}
