package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.TrajSketchFns.register(spark, 500.0)
    val tr = graft.queries.Trajectory.tracks(spark, "/root/testdata/sf0.001")
    val lhs = tr.select($"user_id".as("u1"), $"track".as("ta"), $"pb".as("sa"))
      .repartition(4)
    val rhs = tr.select($"user_id".as("u2"), $"track".as("tb"), $"pb".as("sb"))
    val q = lhs.join(broadcast(rhs), $"u1" < $"u2")
      .select(graft.functions.TrajSketchFns.lcssSparse($"sa", $"ta", $"sb", $"tb").as("x"))
      .agg(sum($"x"))
    q.head()
    println(q.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
