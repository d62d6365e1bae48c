package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edge-list PageRank (SURVEY §2.10 graph-mining extension,
  * `m_graph_pagerank`): power iteration expressed as DataFrame joins —
  * no GraphX, same design choice as [[ConnectedComponents]] (Pregel's
  * per-superstep scheduling overhead dominates on few-iteration jobs;
  * an edge-list join IS the message exchange, and Catalyst/AQE handle
  * partitioning and skew).
  *
  * Scale shape per iteration: ranks ⋈ edges on src (one keyed shuffle),
  * contributions hash-aggregated on dst (second keyed shuffle) — both on
  * stable keys, so at 100 TB the two exchanges reuse co-partitioning
  * round to round; `localCheckpoint(eager)` cuts lineage each iteration
  * exactly like the CC loop. Dangling mass (nodes with no out-edges) is
  * redistributed uniformly each round, keeping Σrank = 1 an invariant
  * (PageRankSpec asserts it together with node-wise equality to a
  * driver-side reference iteration).
  *
  * Determinism note: double contributions are summed in shuffle order, so
  * node ranks carry ~1e-15 noise run to run; consumers round (r6) before
  * ranking, far above the noise floor — structurally-symmetric nodes get
  * mathematically equal ranks and round identically.
  */
object PageRank {

  /** @param edges DIRECTED (src, dst) edge list, duplicates allowed
    *        (weights by multiplicity); pass both directions for an
    *        undirected graph
    * @param tol L1 convergence tolerance: the loop ends as soon as
    *        Σ|rankᵢ − rankᵢ₋₁| < tol (one extra distributed agg per round,
    *        cheap next to the two keyed joins) — `iterations` stays the
    *        hard cap. The residual any later iteration could still add is
    *        ≤ tol·d/(1−d) ≈ 5.7·tol, so the 1e-10 default keeps early-exit
    *        ranks within 1e-9 of the fixed-cap fixpoint — fast-mixing
    *        graphs stop in a few rounds instead of burning the cap.
    *        Pass 0 to disable the check entirely.
    * @return (id, rank) for every vertex appearing in `edges`, Σrank = 1 */
  def run(spark: SparkSession, edges: DataFrame, damping: Double = 0.85,
          iterations: Int = 15, tol: Double = 1e-10): DataFrame =
    runCounted(spark, edges, damping, iterations, tol)._1

  /** As [[run]], also returning the number of iterations actually executed
    * (< `iterations` when the L1 certificate ended the loop early). */
  def runCounted(spark: SparkSession, edges: DataFrame, damping: Double = 0.85,
                 iterations: Int = 15, tol: Double = 1e-10): (DataFrame, Int) = {
    import spark.implicits._
    val e = edges.select($"src".cast("long"), $"dst".cast("long"))
      .localCheckpoint(eager = true)
    val verts = e.select($"src".as("id")).unionAll(e.select($"dst".as("id")))
      .distinct().localCheckpoint(eager = true)
    val n = verts.count().toDouble
    val outDeg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))

    // Dangling vertex SET is iteration-invariant — compute it once. The
    // common undirected case (co-travel graph: every vertex has out-edges)
    // has none, and then the loop runs ZERO driver actions per iteration
    // beyond the checkpoint itself; only a true dangling set pays the
    // per-iteration mass aggregation.
    val danglingVerts = verts.join(outDeg, Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
    val hasDangling = !danglingVerts.isEmpty

    var ranks = verts.withColumn("rank", lit(1.0 / n))
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      val danglingMass =
        if (hasDangling)
          ranks.join(danglingVerts, Seq("id"), "left_semi")
            .agg(coalesce(sum($"rank"), lit(0.0))).as[Double].head()
        else 0.0
      val contribs = ranks.join(outDeg, Seq("id"))
        .select($"id".as("src"), ($"rank" / $"deg").as("c"))
        .join(e, Seq("src"))
        .groupBy($"dst".as("id")).agg(sum($"c").as("in_mass"))
      val base = (1.0 - damping) / n + damping * danglingMass / n
      // prev rides INSIDE the update plan (the id-keyed joins co-partition),
      // so the L1-delta check is an agg over the already-checkpointed
      // per-vertex frame — near-free — instead of a separate keyed-join job
      // per iteration, which would tax graphs that never converge under tol
      // (contraction is ~damping^k: tol=1e-10 needs ~140 rounds, so a
      // slow-mixing graph pays the check on every one of its capped rounds).
      val next = verts.join(contribs, Seq("id"), "left")
        .join(ranks.select($"id", $"rank".as("prev")), Seq("id"))
        .select($"id",
          (lit(base) + lit(damping) * coalesce($"in_mass", lit(0.0))).as("rank"),
          $"prev")
        .localCheckpoint(eager = true)
      if (tol > 0)
        converged = next.agg(coalesce(sum(abs($"rank" - $"prev")), lit(0.0)))
          .as[Double].head() < tol
      ranks = next.drop("prev")
      i += 1
    }
    (ranks, i)
  }
}
