package graft

import graft.operators.LabelProp
import org.apache.spark.sql.functions._

/** Property tests for synchronous label propagation: node-wise equality
  * against an in-memory reference iteration (the determinism contract of
  * the synchronous variant), planted-structure community separation, and
  * the declared `m_graph_lp` key's shape invariants. */
class LabelPropSpec extends BaseSpec {

  /** In-memory mirror of [[LabelProp.runCounted]]: synchronous plurality
    * update, ties to the smallest label, stop on fixpoint or cap. */
  private def refLp(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab = adj.keys.map(k => k -> k).toMap
    var i = 0
    var stable = false
    while (i < iterations && !stable) {
      val next = adj.map { case (v, ns) =>
        val byLabel = ns.groupBy(lab).map { case (l, xs) => l -> xs.size }
        val best = byLabel.toSeq.map { case (l, c) => (c, -l) }.max
        v -> -best._2
      }
      stable = next == lab
      lab = next
      i += 1
    }
    lab
  }

  private def sparkLp(edges: Seq[(Long, Long)], iterations: Int = 10) = {
    import spark.implicits._
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    LabelProp.run(spark, sym.toDF("src", "dst"), iterations)
      .as[(Long, Long)].collect().toMap
  }

  test("planted cliques: each collapses to one label, separated communities") {
    val cliqueA = for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j)
    val cliqueB = for (i <- 100L until 108L; j <- (i + 1) until 108L) yield (i, j)
    val got = sparkLp(cliqueA ++ cliqueB)
    val aLabels = (0L until 8L).map(got).toSet
    val bLabels = (100L until 108L).map(got).toSet
    assert(aLabels.size == 1 && bLabels.size == 1,
      s"cliques must be label-uniform: A=$aLabels B=$bLabels")
    assert(aLabels != bLabels, "disconnected cliques must get distinct labels")
  }

  test("node-wise equality with the in-memory reference on a random graph") {
    val rnd = new scala.util.Random(13)
    // 40 nodes in two noisy clusters + sparse cross edges — enough
    // structure that plurality votes and ties both occur
    val intra = for {
      base <- Seq(0L, 50L); _ <- 1 to 120
    } yield (base + rnd.nextInt(20), base + rnd.nextInt(20))
    val cross = for (_ <- 1 to 5) yield (rnd.nextInt(20).toLong, 50L + rnd.nextInt(20))
    val edges = (intra ++ cross).filter { case (a, b) => a != b }
    val ref = refLp(edges, 10)
    val got = sparkLp(edges, 10)
    assert(got == ref,
      s"diff=${(got.toSet -- ref.toSet).take(5)} / ${(ref.toSet -- got.toSet).take(5)}")
  }

  test("fixpoint early-exit: a clique stops before the cap, labels unchanged") {
    import spark.implicits._
    val clique = for (i <- 0L until 6L; j <- (i + 1) until 6L) yield (i, j)
    val sym = clique ++ clique.map { case (a, b) => (b, a) }
    val (labs, rounds) = LabelProp.runCounted(spark, sym.toDF("src", "dst"), 10)
    assert(rounds < 10, s"clique must reach a fixpoint early, ran $rounds")
    val ref = refLp(clique, 10)
    assert(labs.as[(Long, Long)].collect().toMap == ref)
  }

  test("m_graph_lp sizes sum to the co-traveler vertex count") {
    import spark.implicits._
    val hist = SparkEntry.queries("m_graph_lp")(spark, sf)
      .as[(Long, Long)].collect()
    assert(hist.nonEmpty)
    val total = hist.map { case (size, n) => size * n }.sum
    val verts = SparkEntry.queries("q_graph_degree")(spark, sf)
      .agg(sum($"n_users")).as[Long].head()
    assert(total == verts, s"community sizes cover $total of $verts vertices")
  }
}
