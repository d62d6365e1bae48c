package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the m_dbscan pipeline at sf0.1.
  *
  * The stages below (position contraction → ε-cell probe join → degree /
  * core filter → core edges → CC) are a hand-inlined copy of
  * `DBSCAN.run`'s internals as of commit 015676c, with minPts = 5 and the
  * Geo.scala derived lat/lon columns. If `DBSCAN.scala` changes shape,
  * re-sync this file or its stage timings will silently measure the old
  * pipeline — the `full-run` stage at the end runs the real operator and is
  * the drift check: its total should ≈ the sum of the stages above it.
  */
object ProfileDbscan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val eps = 1.0
    val p = Tables(spark, sfDir, "events")
      .withColumn("lat", ((col("event_id") * 37L) % 1700L) / 10.0 - 85.0)
      .withColumn("lon", ((col("event_id") * 131L) % 3600L) / 10.0 - 180.0)
      .select($"event_id".as("id").cast("long"), $"lat".as("y"), $"lon".as("x"))

    // warm up session
    time("warmup")(p.count())

    val positions = p.groupBy($"x", $"y")
      .agg(min($"id").as("pid"), count(lit(1)).as("w")).localCheckpoint(eager = false)
    time("positions")(println("  n=" + positions.count()))

    val withCell = positions
      .withColumn("cx", floor($"x" / eps).cast("long"))
      .withColumn("cy", floor($"y" / eps).cast("long"))
    val probe = withCell
      .select($"pid".as("pid2"), $"x".as("x2"), $"y".as("y2"), $"w".as("w2"),
        explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(cx + dx AS cx, cy + dy AS cy))))"))
          .as("cell"))
      .select($"pid2", $"x2", $"y2", $"w2", $"cell.cx", $"cell.cy")
    val pairs = withCell.join(probe, Seq("cx", "cy"))
      .filter(($"x" - $"x2") * ($"x" - $"x2") + ($"y" - $"y2") * ($"y" - $"y2") <= eps * eps)
      .select($"pid", $"pid2", $"w2")
      .localCheckpoint(eager = false)
    time("pairs")(println("  n=" + pairs.count()))

    val degrees = pairs.groupBy($"pid").agg(sum($"w2").as("deg"))
    val core = degrees.filter($"deg" >= 5).select($"pid".as("core_pid"))
      .localCheckpoint(eager = false)
    time("core")(println("  n=" + core.count()))

    val coreEdges = pairs
      .join(core, pairs("pid") === core("core_pid")).drop("core_pid")
      .join(core, pairs("pid2") === core("core_pid")).drop("core_pid")
      .filter($"pid" < $"pid2")
    time("coreEdges")(println("  n=" + coreEdges.count()))

    val cc = time("cc")(graft.operators.ConnectedComponents.run(spark,
        core.select($"core_pid".as("id")),
        coreEdges.select($"pid".as("src"), $"pid2".as("dst")))
      .withColumnRenamed("comp", "cluster")
      .localCheckpoint(eager = false))
    time("cc-count")(println("  n=" + cc.count()))

    val full = time("full-run")(
      graft.operators.DBSCAN.run(spark, p, eps, 5)
        .groupBy($"role").agg(count(lit(1)).as("n")).orderBy($"role").collect().toList)
    println(full)
    spark.stop()
  }
}
