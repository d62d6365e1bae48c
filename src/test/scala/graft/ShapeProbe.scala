package graft
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { k =>
      val plan = SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val hp = "Exchange hashpartitioning".r.findAllIn(plan).size
      val sp = "Exchange SinglePartition".r.findAllIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val cart = plan.contains("CartesianProduct")
      val bhj = plan.contains("BroadcastHashJoin")
      println(s"SHAPE $k hp=$hp sp=$sp bnlj=$bnlj cart=$cart bhj=$bhj")
    }
    spark.stop()
  }
}
