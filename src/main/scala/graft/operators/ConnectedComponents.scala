package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-native connected components via alternating large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SOCC'14).
  *
  * Why not GraphX `ConnectedComponents`: that is Pregel min-propagation,
  * which needs O(graph diameter) supersteps — on geometric graphs (ε-edges
  * over point sets) the giant component's diameter is huge and the Pregel
  * chain dominates the whole DBSCAN runtime. Large-star/small-star instead
  * contracts every tree toward its minimum vertex: each round is two
  * grouped-min + join passes over the edge list, the edge set only shrinks
  * toward the star forest, and convergence is O(log² n) rounds worst case
  * (far fewer in practice on geometric graphs). Expressed in plain joins so
  * Catalyst/AQE manage the physical plan; labels are component minima →
  * deterministic output.
  *
  * Both operations keep edges directed (hi, lo) with hi > lo:
  *  - large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u}).
  *  - small-star(u): connect u and every neighbor v ≤ u to that minimum.
  * Both preserve connectivity and never change a component's minimum; the
  * unique common fixpoint is the star forest rooted at component minima.
  */
object ConnectedComponents {

  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("hi").as("u"), col("lo").as("v"))
      .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo")) // v > u ≥ m, never a loop
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    // m = min(N(hi) ∪ {hi}) = min(lo) since every lo < hi. The lo == m row
    // re-emits as (hi, m) — exactly the one parent edge small-star keeps —
    // and every other lo re-emits as (lo, m): one output row per input row.
    val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
    e.join(mins, "hi")
      .select(
        when(col("lo") === col("m"), col("hi")).otherwise(col("lo")).as("hi"),
        col("m").as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
  }

  /** @param vertices single `id` column
    * @param edges `src`,`dst` (each undirected edge once is enough)
    * @return (id, comp) — comp is the min vertex id reachable */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val selfLabels = vertices.select($"id", $"id".as("comp"))
    var e = edges
      .select(greatest($"src", $"dst").as("hi"), least($"src", $"dst").as("lo"))
      .filter($"hi" =!= $"lo")
      .distinct()
      .localCheckpoint()

    // Fingerprint = (count, xxhash64 xor-fold): unchanged ⟺ the round was a
    // no-op, and the only edge set both ops fix is the star forest. bit_xor,
    // not sum — an order-independent fold that cannot ANSI-overflow. The
    // definitive star-forest assertion below makes a (astronomically
    // unlikely) fingerprint collision a hard failure, never a wrong answer.
    def fingerprint(df: DataFrame): (Long, Long) = {
      df.agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L)))
        .as[(Long, Long)].head()
    }

    if (!e.isEmpty) {
      var prev = fingerprint(e)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        e = smallStar(largeStar(e)).localCheckpoint()
        val cur = fingerprint(e)
        converged = cur == prev
        prev = cur
        i += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"ConnectedComponents: no fixpoint after $maxIter large/small-star rounds")
      // Star forest ⟺ every child has exactly one parent and no parent is
      // itself a child. Anything else here is a bug — fail loudly.
      val multiParent = e.groupBy($"hi").agg(count(lit(1)).as("c"))
        .filter($"c" > 1).limit(1).count()
      val chained = e.as("a")
        .join(e.as("b"), col("a.lo") === col("b.hi"), "left_semi")
        .limit(1).count()
      if (multiParent > 0 || chained > 0)
        throw new IllegalStateException(
          "ConnectedComponents: converged edge set is not a star forest")
    }

    selfLabels.as("v")
      .join(e.select($"hi".as("id"), $"lo".as("root")), Seq("id"), "left")
      .select($"id", coalesce($"root", $"comp").as("comp"))
  }
}
