package graft
import org.apache.spark.sql.SparkSession
/** Local helper: print sf0.001 golden counts for the named keys
  * (`sbt "Test/runMain graft.Counts q_foo q_bar"`). */
object Counts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { k =>
      println(s"GOLDEN $k ${SparkEntry.queries(k)(spark, "/root/testdata/sf0.001").count()}")
    }
    spark.stop()
  }
}
