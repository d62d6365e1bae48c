package graft
import org.apache.spark.sql.SparkSession
/** Local helper: time the trajectory keys at a given SF
  * (`sbt "Test/runMain graft.TrajProbe /root/testdata/sf0.1"`). */
object TrajProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- Seq("m_traj_frechet", "m_traj_lcss"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, dir).count()
      println(f"$k run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
