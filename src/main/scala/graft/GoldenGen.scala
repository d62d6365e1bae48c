package graft

import org.apache.spark.sql.SparkSession

/** Regenerate the golden row counts fixture (SURVEY §5.4):
  * `runMain graft.GoldenGen > src/test/resources/golden_counts_sf0.001.txt` */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"$name ${fn(spark, sfDir).count()}")
    }
    spark.stop()
  }
}
