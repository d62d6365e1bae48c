package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph (Tarjan's partition,
  * computed distributively): scc(u) = min id over the set of vertices
  * mutually reachable with u — the directed-connectivity primitive the
  * suite's CC (undirected) cannot express: u→v alone puts them in one weak
  * component but NOT one SCC.
  *
  * Algorithm: transitive closure by PATH DOUBLING — R₀ = E, R_{k+1} =
  * R_k ∪ (R_k ∘ R_k) — reaches the full closure in ⌈log₂ diameter⌉ + 1
  * rounds (each round doubles the certified path length), then one
  * self-join intersects the closure with its transpose to get the mutual
  * pairs, and a per-vertex min over mutual partners labels each SCC by its
  * minimum member.
  *
  * Scale contract: closure size is |V|²-bounded, so this operator is
  * declared for LATTICE-BOUNDED vertex universes (grid cells, category
  * codes — universes whose size is fixed by the domain, not the data
  * volume). The caller's one data-sized job is producing the distinct edge
  * list; every round here shuffles at most |V|² pairs regardless of how
  * many trillion events voted for each edge. For data-sized vertex sets
  * (users, documents) a Forward-Backward / coloring decomposition would be
  * the right tool instead — out of scope by declaration, enforced by
  * `maxVertices` (a closure over an unbounded universe must fail loudly,
  * not OOM an executor).
  *
  * The closure join can square the pair count in one round, so cadence
  * tricks buy nothing (rounds are ≤ ~log₂|V| and each MUST be checked for
  * the fixpoint anyway — count equality is the convergence test); every
  * round pays one count action and an eager checkpoint to cut the doubled
  * lineage, the CC eager-checkpoint lesson.
  */
object Scc {
  @volatile var lastIterations: Int = -1

  /** @param vertices single `id` (LONG) column — every vertex, including
    *                 isolated ones (they come back as singleton SCCs)
    * @param edges    directed (src, dst) LONG pairs; self-loops ignored
    * @param maxVertices closure-safety bound: throws if |V| exceeds it
    *                    rather than materializing an unbounded |V|² closure
    * @return (id, scc_id) — scc_id = min vertex id of u's SCC
    * @throws IllegalStateException if the closure fixpoint is not reached
    *         within `maxIter` doubling rounds, or |V| > `maxVertices` */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIter: Int = 20, maxVertices: Long = 10000L): DataFrame = {
    import spark.implicits._
    val nV = vertices.count()
    if (nV > maxVertices)
      throw new IllegalStateException(
        s"SCC closure is |V|²-bounded and |V| = $nV exceeds maxVertices = " +
          s"$maxVertices — this operator is declared for lattice-bounded " +
          "universes; decompose data-sized graphs with Forward-Backward instead")

    var r = edges.select($"src", $"dst")
      .filter($"src" =!= $"dst").distinct()
      .localCheckpoint(eager = true)
    var prev = r.count()
    var i = 0
    var done = prev == 0L
    while (i < maxIter && !done) {
      i += 1
      val next = r
        .unionAll(
          r.as("a").join(r.as("b"), col("a.dst") === col("b.src"))
            .select(col("a.src").as("src"), col("b.dst").as("dst"))
            .filter($"src" =!= $"dst"))
        .distinct()
        .localCheckpoint(eager = true)
      val n = next.count()
      done = n == prev
      prev = n
      r = next
    }
    lastIterations = i
    if (!done)
      throw new IllegalStateException(
        s"SCC path-doubling closure did not reach its fixpoint in $maxIter " +
          "rounds — the mutual-pair set may be incomplete; raise maxIter")

    // closure ∩ transpose = mutual reachability; label = min mutual partner
    // (or the vertex itself — singleton SCCs never appear in `mutual`)
    val mutual = r.as("f")
      .join(r.as("b"),
        col("f.src") === col("b.dst") && col("f.dst") === col("b.src"))
      .select(col("f.src").as("id"), col("f.dst").as("m"))
    vertices
      .join(mutual.groupBy($"id").agg(min($"m").as("mm")), Seq("id"), "left")
      .select($"id", least($"id", coalesce($"mm", $"id")).as("scc_id"))
  }
}
