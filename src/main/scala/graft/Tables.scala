package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-generated parquet testdata (TESTDATA.md).
  *
  * The returned DataFrame is memoized per (session, sfDir, table). What is
  * cached is the LOGICAL PLAN OBJECT only — never materialized data — so
  * Catalyst still sees the raw scan node and pushes filters / prunes columns
  * into the vectorized parquet reader exactly as with a fresh read. What the
  * memo removes is the per-call driver work of `spark.read.parquet`: file
  * listing and footer/schema inference, which at ~200 table reads across a
  * 92-query bench run is pure fixed overhead (SURVEY §6). At 100 TB the
  * same pattern holds — one resolved relation per table, shared by every
  * query plan, with the scan node as the pushdown target.
  */
object Tables {
  import org.apache.spark.sql.functions._

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, sfDir, name), { _ =>
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
    })
}
