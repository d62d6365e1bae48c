package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-generated parquet testdata (TESTDATA.md).
  *
  * Plain `spark.read.parquet` per call: the returned value is only a logical
  * plan, so Catalyst still sees the scan directly and can push filters and
  * prune columns into the vectorized parquet reader. At 100 TB the same
  * pattern holds — the scan node is the pushdown target, never a cached
  * materialization that would read all columns.
  */
object Tables {
  import org.apache.spark.sql.functions._

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // Spark 4 rejects parquet TIMESTAMP(NANOS) unless read as raw Long.
      // ns div 1000 → µs timestamp == DuckDB's truncation of the same file,
      // so both engines see identical µs values (SURVEY §1.2 pitfall).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
