package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local probe mains for the round-16 verdict asks (#2 reopen-skips-fit,
  * #6 iterative-fit contract-vs-habit). Prints one JSON line per probe
  * row; numbers land in PREFLIGHT_r16.md.
  * `sbt "Test/runMain graft.IterProbe [sfDir]"` */
object IterProbe {
  private def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val v = f; (v, (System.nanoTime() - t0) / 1e9)
    }
    def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq

    // --- LDA: does maxIter / optimizer change the pinned top-terms? -----
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val (base, tBase) = timed(rows(queries.Ml.ldaTopics(spark, docs, 3, 7L)))
    for ((label, it, opt) <- Seq(("em_iter5", 5, "em"), ("em_iter3", 3, "em"),
                                 ("online_iter10", 10, "online"))) {
      val (v, t) = timed(rows(queries.Ml.ldaTopics(spark, docs, 3, 7L, it, opt)))
      val sameTerms = v.map(_.split(",")(2)) == base.map(_.split(",")(2))
      println(s"""{"metric":"iterprobe","key":"lda_$label","sec":${r3(t)},"base_sec":${r3(tBase)},"rows_equal":${v == base},"terms_equal":$sameTerms}""")
    }

    // --- FPGrowth: is the minCount=2 bar contract or habit? -------------
    import org.apache.spark.ml.fpm.FPGrowth
    val baskets = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("items"))
      .localCheckpoint(eager = true)
    val n = baskets.count()
    for ((label, minSup) <- Seq(("minCount2", 2.0 / n), ("sup_0.1pct", 0.001),
                                ("sup_1pct", 0.01))) {
      val (cnt, t) = timed {
        new FPGrowth().setItemsCol("items").setMinSupport(minSup)
          .setMinConfidence(0.5).fit(baskets)
          .freqItemsets.filter(size(col("items")) >= 2).count()
      }
      println(s"""{"metric":"iterprobe","key":"fpgrowth_$label","sec":${r3(t)},"itemsets_ge2":$cnt}""")
    }

    // --- AnnIndex: reopen skips the k-means fit ------------------------
    // fresh sessions so the SessionMemo cannot leak the fit across arms
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_probe").toString
    val s1 = spark.newSession()
    val (_, tFit) = timed {
      operators.AnnIVF.topK(s1, Tables(s1, sf, "embeddings"),
        0L until 10L, k = 5, nlist = 16, nprobe = 4).collect()
    }
    operators.AnnIndex.writeIvf(s1, Tables(s1, sf, "embeddings"), dir, nlist = 16)
    val s2 = spark.newSession()
    val (_, tReopen) = timed {
      val (assigned, cents) = operators.AnnIndex.readIvf(s2, dir)
      operators.AnnIVF.topKFrom(s2, assigned, cents, 0L until 10L,
        k = 5, nprobe = 4).collect()
    }
    println(s"""{"metric":"iterprobe","key":"annidx_reopen","fit_and_query_sec":${r3(tFit)},"reopen_and_query_sec":${r3(tReopen)}}""")
    spark.stop()
  }
}
