package graft

import java.nio.file.{Files, Paths}

/** Round-18 optimization evidence tool: dump `explain("formatted")` for
  * named declared queries to `<outDir>/<key>_<suffix>.txt` — the
  * before/after plan artifacts the optimization rounds commit under
  * `plans/rNN/`. Usage:
  * `sbt "runMain graft.PlanDump <outDir> <suffix> <key> [key ...]"`.
  * Plans are captured at sf0.1 (the bench SF) on the bench session shape
  * (local[32], shuffle.partitions=32) so Exchange counts and join
  * strategies match what the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // Data dir from the bench's own env contract (portable across hosts);
    // the local sf0.1 layout stays the default.
    val dataDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dataDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${k}_$suffix.txt"), txt)
      println(s"[plandump] $k -> $outDir/${k}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
