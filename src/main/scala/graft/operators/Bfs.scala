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

  /** Driver-local frontier loop — the [[ConnectedComponents]] hybrid
    * endgame applied to BFS (round 18): below `localThreshold` edges the
    * distributed rounds are pure fixed job overhead (each round ≈ 4 tiny
    * AQE-materialized exchanges whatever the data size), so the same
    * layer-synchronous expansion runs over a driver adjacency map. Same
    * cadence-deferred exit, same lastIterations, identical output set
    * (integer hop distances have no fp noise; BfsSpec pins set equality
    * on both paths). */
  private def buildAdj(sym: Array[(Long, Long)]): Map[Long, Array[Long]] =
    sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  private def runLocal(adj: Map[Long, Array[Long]], seedIds: Array[Long],
                       maxHops: Int, checkEvery: Int): (Seq[(Long, Int)], Int) = {
    val visited = scala.collection.mutable.LongMap.empty[Int]
    seedIds.foreach(visited(_) = 0)
    var frontier: Array[Long] = seedIds.distinct
    var d = 0
    var done = false
    while (d < maxHops && !done) {
      d += 1
      val cadence = d % checkEvery == 0 || d == maxHops
      val next = frontier.iterator
        .flatMap(v => adj.getOrElse(v, Array.empty[Long]))
        .filterNot(visited.contains).toArray.distinct
      next.foreach(visited(_) = d)
      frontier = next
      if (cadence && d < maxHops) done = next.isEmpty
    }
    (visited.toSeq.sortBy(_._1), d)
  }

  /** @param edges  undirected pair list (u1, u2), each pair once
    * @param seeds  (id) — distance-0 vertex set
    * @param localThreshold run the driver-local endgame when the
    *        symmetrized edge list (and the seed set) is at most this many
    *        rows; 0 forces distributed rounds (the spec pin)
    * @return (id, dist) for every vertex within `maxHops` of a seed */
  def run(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
          maxHops: Int = 8, checkEvery: Int = 2,
          localThreshold: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"u1".as("src"), $"u2".as("dst"))
      .unionAll(edges.select($"u2".as("src"), $"u1".as("dst")))
      .localCheckpoint(eager = true)

    // Both gates are DISTRIBUTED counts taken before any collect: the seed
    // frame must prove it is under budget before it is allowed on the driver.
    if (sym.count() <= localThreshold && seeds.count() <= localThreshold) {
      val seedIds = seeds.select($"id".cast("long")).as[Long].collect()
      val (out, d) = runLocal(buildAdj(sym.as[(Long, Long)].collect()),
        seedIds, maxHops, checkEvery)
      lastIterations = d
      return spark.createDataset(out).toDF("id", "dist")
    }

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
                  maxHops: Int = 8, checkEvery: Int = 2,
                  localThreshold: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"u1".as("sv"), $"u2".as("dst"))
      .unionAll(edges.select($"u2".as("sv"), $"u1".as("dst")))
      .localCheckpoint(eager = true)

    // Hybrid endgame (see [[run]]): per-source BFS over the same driver
    // adjacency map — Σ reachable pairs is |sources|·|V|-bounded, the same
    // budget class as the distributed state it replaces.
    // Distributed source count gates the collect (same discipline as [[run]]);
    // the adjacency map is built ONCE and shared across the per-source loops.
    if (sym.count() <= localThreshold &&
        sources.count() * 4 <= localThreshold) {
      val srcIds = sources.select($"id".cast("long")).as[Long].collect()
      val adj = buildAdj(sym.as[(Long, Long)].collect())
      var maxD = 0
      val out = srcIds.distinct.sorted.flatMap { s =>
        val (one, d) = runLocal(adj, Array(s), maxHops, checkEvery)
        maxD = math.max(maxD, d)
        one.map { case (v, dist) => (s, v, dist) }
      }
      lastIterations = maxD
      return spark.createDataset(out.toSeq).toDF("src", "id", "dist")
    }

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
