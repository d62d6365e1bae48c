package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: LSH parameter-selection probe for the embcos scale path
  * (`q_dedup_embcos` rides `VectorLSH.candidatePairs(…, 1.2, numTables = 12)`
  * with the default bucketLen 2.0).
  *
  * Prints, per (numTables, bucketLen) and scale factor: candidate-set size,
  * cos≥0.4 truth pairs MISSED (must be 0 — candidates must be a strict
  * superset for the oracle hash to match), recall vs the edist≤1.2 truth
  * (the m_sim_lsh property bar), and wall time.
  *
  * Why (12, 2.0) and not the ~1 s-faster (12, 1.5): both miss zero truth
  * pairs on today's fixtures, but the per-pair boundary miss probability is
  * ~1.9e-5 at w=2.0 vs ~3e-4 at w=1.5 (inferred from the measured misses at
  * lower table counts) — ~14× more margin against a regenerated fixture for
  * one extra second of bench. Correctness keys never trade on that. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val emb = Tables(spark, dir, "embeddings")
      val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      def cos4(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var sa = 0.0; var sb = 0.0
        var i = 0
        while (i < a.length) { dot += a(i).toDouble * b(i); sa += a(i).toDouble * a(i); sb += b(i).toDouble * b(i); i += 1 }
        BigDecimal(dot / (math.sqrt(sa) * math.sqrt(sb))).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      def edist(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
        math.sqrt(s)
      }
      val truthCos = (for { (i, vi) <- vecs; (j, vj) <- vecs if i < j; if cos4(vi, vj) >= 0.4 } yield (i, j)).toSet
      val truthE12 = (for { (i, vi) <- vecs; (j, vj) <- vecs if i < j; if edist(vi, vj) <= 1.2 } yield (i, j)).toSet
      for ((nt, w) <- Seq((12, 2.0), (12, 1.5), (16, 1.0), (8, 1.5))) {
        val t0 = System.nanoTime()
        val cand = graft.operators.VectorLSH.candidatePairs(spark, emb, 1.2, nt, w)
          .select($"va", $"vb").as[(Long, Long)].collect().toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val mCos = (truthCos -- cand).size
        val recE = if (truthE12.isEmpty) 1.0 else truthE12.count(cand).toDouble / truthE12.size
        println(f"TUNE sf=$sf nt=$nt w=$w cand=${cand.size} missedCos=$mCos recallE12=$recE%.3f t=$secs%.2f")
      }
    }
    spark.stop()
  }
}
