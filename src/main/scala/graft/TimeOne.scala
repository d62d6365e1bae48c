package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      val it = graft.operators.LastIterations.get(name)
        .map(i => s" rounds=$i").getOrElse("")
      println(s"TIMING $name rows=$n sec=${(System.nanoTime()-t0)/1e9}$it")
    }
    spark.stop()
  }
}
