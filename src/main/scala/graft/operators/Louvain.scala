package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Louvain level-1 community detection (SURVEY §2.10 graph-mining
  * extension, `m_graph_louvain`) — the local-move phase of Blondel,
  * Guillaume, Lambiotte & Lefebvre (J. Stat. Mech. 2008, P10008),
  * expressed as edge-list joins like [[LabelProp]] (no GraphX; the join
  * IS the message exchange). Where label propagation adopts the
  * PLURALITY neighbour label, Louvain moves each vertex to the
  * neighbouring community with the best MODULARITY GAIN — the operator
  * that OPTIMIZES the Q score `m_graph_modularity` only measures.
  *
  * Update rule (synchronous, deterministic): every vertex starts in its
  * own community. Each round, vertex i scores every community c among
  * {its neighbours' communities} ∪ {its own}:
  *
  *   score(i, c) = 2m·k_{i,c} − k_i · d_{c∖i}
  *
  * the modularity gain of joining c, rescaled by the positive constant
  * 2m² (ΔQ(a→b) = (k_{i,b} − k_{i,a∖i})/m − k_i(d_b − d_{a∖i})/2m²), so
  * the comparison runs in EXACT integer arithmetic: k_{i,c} = #edges
  * from i into c, k_i = degree, d_{c∖i} = total degree of c excluding i,
  * m = #undirected edges. The vertex moves to the argmax — ties broken
  * toward the SMALLEST community id — iff the move strictly improves on
  * staying. All moves apply simultaneously; the synchronous schedule
  * makes the labelling after any round a pure function of the graph
  * (property-testable node-wise, LouvainSpec), at the cost of the known
  * two-cycle risk, which two guards bound: the strict-improvement rule
  * (equal-score oscillation cannot start) and the singleton-swap rule of
  * Lu, Halappanavar & Kalyanaraman (Parallel Computing 47, 2015): when
  * BOTH i's community and the target are singletons, the move is allowed
  * only toward the smaller community id — the deterministic mediator
  * that collapses the classic pairwise swap cycle of round 1.
  *
  * Scale shape per round: one (dst ⋈ community) shuffle for the
  * neighbour-community tallies, one community-keyed aggregate for
  * (d_c, |c|), one vertex-keyed argmax — all on stable keys; driver
  * actions follow [[LabelProp]]'s amortized cadence (lazy checkpoints
  * between probes, fixpoint = a round with zero moves). Integer scores
  * stay exact while 2m·max(k_ic) < 2⁶³ — at 2m ≈ 10¹⁰ edges that allows
  * k_ic ≈ 10⁸, far past any real vertex neighbourhood. */
object Louvain {

  /** Rounds executed by the most recent [[runCounted]] on this JVM —
    * read by `graft.Bench`'s note line. Diagnostic only. */
  @volatile var lastIterations: Int = -1

  /** @param pairs UNDIRECTED simple graph as distinct (u1, u2) rows,
    *        u1 ≠ u2, each edge once (the co-traveler pair convention)
    * @return (id, c) for every vertex; vertices sharing c are one
    *         community */
  def run(spark: SparkSession, pairs: DataFrame, iterations: Int = 10,
          checkEvery: Int = 2): DataFrame =
    runCounted(spark, pairs, iterations, checkEvery)._1

  /** As [[run]], also returning the number of rounds executed
    * (< `iterations` when a round moved nothing — a fixpoint of the
    * synchronous update). */
  def runCounted(spark: SparkSession, pairs: DataFrame,
                 iterations: Int = 10, checkEvery: Int = 2): (DataFrame, Int) = {
    import spark.implicits._
    val p = pairs.select($"u1".cast("long"), $"u2".cast("long"))
      .localCheckpoint(eager = true)
    val e = p.select($"u1".as("src"), $"u2".as("dst"))
      .unionAll(p.select($"u2".as("src"), $"u1".as("dst")))
      .localCheckpoint(eager = true)
    val deg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("k"))
      .localCheckpoint(eager = true)
    val m2 = e.count() // = 2m; one action, amortized over all rounds

    var comm = deg.select($"id", $"id".as("c"))
    var i = 0
    var stable = false
    while (i < iterations && !stable) {
      // community totals: Σ degree and size (size feeds the swap guard)
      val cstat = comm.join(deg, Seq("id"))
        .groupBy($"c").agg(sum($"k").as("d_c"), count(lit(1)).as("csize"))
      // k_{i,c}: edges from i into each neighbouring community. The own
      // community needs no separate candidate row: when i has a
      // neighbour in it the tally includes it, and when it doesn't the
      // own score is −k·(d_c − k) exactly (k_ic = 0), recovered below
      // from the cstat join — the argmax-vs-own comparison is identical
      // either way, so no candidate-union re-aggregation is needed.
      val nbr = e.join(comm.select($"id".as("dst"), $"c".as("nc")), Seq("dst"))
        .groupBy($"src".as("id"), $"nc").agg(count(lit(1)).as("k_ic"))
      val scored = nbr
        .join(deg, Seq("id"))
        .join(comm, Seq("id"))
        .join(cstat.select($"c".as("nc"), $"d_c", $"csize"), Seq("nc"))
        .withColumn("d_eff",
          when($"nc" === $"c", $"d_c" - $"k").otherwise($"d_c"))
        .withColumn("score", lit(m2) * $"k_ic" - $"k" * $"d_eff")
      // argmax by (score desc, community id asc) over the neighbour
      // communities (own included whenever a neighbour shares it); `cur`
      // picks the own-community row when present
      val best = scored.groupBy($"id").agg(
        max(struct($"score", (-$"nc").as("negc"), $"csize".as("tsize"))).as("w"),
        max(when($"nc" === $"c", struct($"score", $"csize"))).as("cur"),
        max($"c").as("c"), max($"k").as("k"))
      i += 1
      val cadence = i % checkEvery == 0 || i == iterations
      val next = best
        .join(cstat, Seq("c")) // own-community stats for the k_ic = 0 case
        .withColumn("curScore",
          coalesce($"cur.score", -$"k" * ($"d_c" - $"k")))
        .select($"id",
          when($"w.score" > $"curScore" &&
               !($"csize" === 1 && $"w.tsize" === 1 && -$"w.negc" > $"c"),
            -$"w.negc").otherwise($"c").as("c2"),
          $"c".as("c_prev"))
        .select($"id", $"c2".as("c"), ($"c2" =!= $"c_prev").as("changed"))
        .localCheckpoint(eager = cadence)
      if (cadence && i < iterations)
        stable = next.filter($"changed").isEmpty
      comm = next.drop("changed")
    }
    lastIterations = i
    (comm, i)
  }
}
