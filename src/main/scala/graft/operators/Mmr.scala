package graft.operators

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein SIGIR
  * '98) — the diversity step between a similarity top-k and what a
  * retrieval pipeline actually returns: greedily pick the candidate
  * maximizing λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), so
  * near-duplicate hits stop crowding the list (`q_sim_mmr` is the
  * declared key; `q_sim_rrf` fuses lists, MMR de-redunds one).
  *
  * Runs DRIVER-SIDE over a PROBE-SIZED candidate list (the AnnPQ
  * collect discipline): the distributed half of the key is the
  * candidate generation + exact rel scoring; the greedy loop touches
  * k·|C| cosine evaluations over ≤ dozens of rows — never data-sized.
  * Deterministic: ties break on the smaller id at every step.
  */
object Mmr {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** @param cands (id, relevance, vector) — probe-sized
    * @return up to k picks in selection order: (id, rel, mmr score at
    *         selection time); the FIRST pick is always argmax rel
    *         (max-sim over an empty selected set is 0) */
  def rerank(cands: Seq[(Long, Double, Array[Double])], k: Int,
             lambda: Double): Seq[(Long, Double, Double)] = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val remaining = scala.collection.mutable.LinkedHashMap(cands.map(c => c._1 -> c): _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double])]
    val out = Seq.newBuilder[(Long, Double, Double)]
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.values.map { case c @ (id, rel, v) =>
        val maxSim = if (selected.isEmpty) 0.0
                     else selected.map(s => cos(v, s._3)).max
        (lambda * rel - (1.0 - lambda) * maxSim, id, c)
      }
      val best = scored.minBy { case (score, id, _) => (-score, id) }
      remaining.remove(best._2)
      selected += best._3
      out += ((best._3._1, best._3._2, best._1))
    }
    out.result()
  }
}
