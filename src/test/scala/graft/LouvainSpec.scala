package graft

import graft.operators.Louvain
import org.apache.spark.sql.functions._

/** Property tests for Louvain level-1 local moves: node-wise equality
  * against an in-memory reference of the exact synchronous update rule
  * (integer scores, smallest-id ties, strict improvement, singleton-swap
  * guard), planted-structure recovery, the swap-cycle guard, fixpoint
  * early-exit, and the fixture pins the whole point of the operator:
  * Q(louvain) ≥ Q(lp). */
class LouvainSpec extends BaseSpec {

  /** In-memory mirror of [[Louvain.runCounted]]'s update rule. */
  private def refLouvain(pairs: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val sym = pairs ++ pairs.map { case (a, b) => (b, a) }
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val m2 = sym.size.toLong
    var comm: Map[Long, Long] = deg.keys.map(k => k -> k).toMap
    var i = 0
    var stable = false
    while (i < iterations && !stable) {
      val members = comm.keys.toSeq.groupBy(comm)
      val dC = members.map { case (c, vs) => c -> vs.map(deg).sum }
      val csize = members.map { case (c, vs) => c -> vs.size }
      val next = adj.map { case (v, ns) =>
        val k = deg(v)
        val c = comm(v)
        val tally = ns.groupBy(comm).map { case (cc, xs) => cc -> xs.size.toLong }
        def score(cc: Long): Long = {
          val dEff = if (cc == c) dC(cc) - k else dC(cc)
          m2 * tally.getOrElse(cc, 0L) - k * dEff
        }
        val best = (tally.keySet + c).toSeq.map(cc => (score(cc), -cc)).max
        val bc = -best._2
        val move = best._1 > score(c) &&
          !(csize(c) == 1 && csize(bc) == 1 && bc > c)
        v -> (if (move) bc else c)
      }
      stable = next == comm
      comm = next
      i += 1
    }
    comm
  }

  private def sparkLouvain(pairs: Seq[(Long, Long)], iterations: Int = 10) = {
    import spark.implicits._
    Louvain.run(spark, pairs.toDF("u1", "u2"), iterations)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver modularity Q = Σ_c (e_c/m − (d_c/2m)²) — shares no code with
    * the operator or the m_graph_modularity key. */
  private def refModularity(pairs: Seq[(Long, Long)], lab: Map[Long, Long]): Double = {
    val m = pairs.size.toDouble
    val eC = pairs.filter { case (a, b) => lab(a) == lab(b) }
      .groupBy { case (a, _) => lab(a) }.view.mapValues(_.size.toDouble).toMap
    val dC = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(lab).view.mapValues(_.size.toDouble).toMap
    dC.map { case (c, d) => eC.getOrElse(c, 0.0) / m - math.pow(d / (2 * m), 2) }.sum
  }

  test("planted cliques: each collapses to one community, separated") {
    val cliqueA = for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j)
    val cliqueB = for (i <- 100L until 108L; j <- (i + 1) until 108L) yield (i, j)
    val got = sparkLouvain(cliqueA ++ cliqueB)
    val aLabels = (0L until 8L).map(got).toSet
    val bLabels = (100L until 108L).map(got).toSet
    assert(aLabels.size == 1 && bLabels.size == 1,
      s"cliques must be community-uniform: A=$aLabels B=$bLabels")
    assert(aLabels != bLabels, "disconnected cliques must get distinct communities")
  }

  test("singleton-swap guard: a single edge merges instead of 2-cycling") {
    import spark.implicits._
    val (comm, rounds) =
      Louvain.runCounted(spark, Seq((0L, 1L)).toDF("u1", "u2"), 10)
    val got = comm.as[(Long, Long)].collect().toMap
    assert(got(0L) == got(1L), s"edge endpoints must merge: $got")
    assert(rounds < 10, s"must reach a fixpoint early, ran $rounds")
  }

  test("node-wise equality with the in-memory reference on a random graph") {
    val rnd = new scala.util.Random(29)
    // two noisy clusters + sparse cross edges, deduped to a simple graph
    val intra = for {
      base <- Seq(0L, 50L); _ <- 1 to 120
    } yield (base + rnd.nextInt(20), base + rnd.nextInt(20))
    val cross = for (_ <- 1 to 5) yield (rnd.nextInt(20).toLong, 50L + rnd.nextInt(20))
    val edges = (intra ++ cross)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val ref = refLouvain(edges, 10)
    val got = sparkLouvain(edges, 10)
    assert(got == ref,
      s"diff=${(got.toSet -- ref.toSet).take(5)} / ${(ref.toSet -- got.toSet).take(5)}")
  }

  test("fixpoint early-exit: a clique stops before the cap, matches the reference") {
    import spark.implicits._
    val clique = for (i <- 0L until 6L; j <- (i + 1) until 6L) yield (i, j)
    val (labs, rounds) = Louvain.runCounted(spark, clique.toDF("u1", "u2"), 10)
    assert(rounds < 10, s"clique must reach a fixpoint early, ran $rounds")
    assert(labs.as[(Long, Long)].collect().toMap == refLouvain(clique, 10))
  }

  test("m_graph_louvain sizes sum to the co-traveler vertex count; Q(louvain) >= Q(lp)") {
    import spark.implicits._
    val hist = SparkEntry.queries("m_graph_louvain")(spark, sf)
      .as[(Long, Long)].collect()
    assert(hist.nonEmpty)
    val total = hist.map { case (size, n) => size * n }.sum
    val verts = SparkEntry.queries("q_graph_degree")(spark, sf)
      .agg(sum($"n_users")).as[Long].head()
    assert(total == verts, s"community sizes cover $total of $verts vertices")

    // the operator must not LOSE quality vs the LP baseline it upgrades —
    // Q from one driver formula over the same fixture pair set
    val pts = Tables(spark, sf, "events")
      .withColumn("lat", (col("event_id") * 37L % 1700L) / 10.0 - 85.0)
      .withColumn("lon", (col("event_id") * 131L % 3600L) / 10.0 - 180.0)
      .withColumn("ts_us", unix_micros(col("ts")))
    val pairs = graft.operators.Convoy.coTravelers(pts, cellDeg = 20.0, minHours = 2)
      .select($"u1", $"u2").as[(Long, Long)].collect().toSeq
    val qLouvain = refModularity(pairs, refLouvain(pairs, 10))
    val lpLab = {
      val sym = pairs ++ pairs.map { case (a, b) => (b, a) }
      graft.operators.LabelProp.run(spark,
        sym.toDF("src", "dst")).as[(Long, Long)].collect().toMap
    }
    val qLp = refModularity(pairs, lpLab)
    assert(qLouvain >= qLp - 1e-12,
      s"Louvain must not lose to LP on the fixture: $qLouvain vs $qLp")
  }
}
