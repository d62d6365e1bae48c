package graft
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { k =>
      val plan = SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      val reused = "ReusedExchange".r.findAllIn(plan).size
      println(s"SCANS $k scans=$scans reused=$reused")
    }
    spark.stop()
  }
}
