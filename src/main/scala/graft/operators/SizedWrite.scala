package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Target-sized parquet output — the small-files/giant-files guard of a
  * 100 TB pipeline sink.
  *
  * A naive `df.write.parquet` emits one file per task: a 32-partition
  * fixture write makes 32 splinter files, and at cluster scale a
  * 20k-partition shuffle output makes 20k — metadata pressure on every
  * downstream listing — while a blind `coalesce(1)` serializes the write.
  * This sink sizes the file count from the DATA: in-memory bytes come from
  * Catalyst's plan statistics (`optimizedPlan.stats.sizeInBytes` — the
  * same estimate the broadcast planner trusts; no extra job when the scan
  * has stats), scaled by an observed parquet compression ratio, and the
  * frame is re-distributed to ceil(bytes / targetBytes) partitions before
  * the write.
  *
  * Distribution choice: `repartition(n)` (round-robin) balances skewed
  * upstream partitions — the right default for a SINK, where downstream
  * reads re-plan their own partitioning anyway. Callers preserving a keyed
  * layout for bucketed readers should pre-partition and skip this sink.
  */
object SizedWrite {

  /** Parquet-vs-in-memory compression ratio: columnar encoding + snappy on
    * text-heavy data lands near 3-5×; 4 is the conservative middle — files
    * come out a bit under target rather than over. */
  val DefaultCompressionRatio = 4.0

  /** Hard file-count ceiling. Per-file sizing is a SMALL-files guard; a
    * sink that wants more files than this should use a partitioned layout
    * (or raise targetBytes). It also bounds the damage when the plan's
    * sizeInBytes is an optimizer ESTIMATE rather than a measurement —
    * join-selectivity products can claim terabytes for a KB-sized frame
    * (measured in r16: a 12k-task repartition of a tiny join-derived
    * adjacency frame, each task minutes of closure deserialization). */
  val MaxFiles = 4096

  /** Partition count that lands `df` near `targetBytes` per output file. */
  def plannedFileCount(df: Dataset[_], targetBytes: Long,
                       compressionRatio: Double = DefaultCompressionRatio): Int = {
    val memBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Unknown-stats sentinel: plans that cannot propagate a size (LogicalRDD
    // from a localCheckpoint, RDD-backed frames) report
    // spark.sql.defaultSizeInBytes = Long.MaxValue. Sizing from the sentinel
    // asked for ceil(2^63/ratio/target) ≈ 2^31 partitions and the shuffle
    // writer's per-partition array threw `Requested array size exceeds VM
    // limit`. Anything within 100× of the sentinel is a flag, not a
    // measurement (a real 2^56-byte frame does not fit any cluster) — keep
    // the frame's current partitioning instead of resizing on a fiction.
    if (memBytes >= BigInt(Long.MaxValue) / 100)
      math.max(1, df.rdd.getNumPartitions)
    else {
      val onDisk = (BigDecimal(memBytes) / compressionRatio).toDouble
      math.min(MaxFiles, math.max(1, math.ceil(onDisk / targetBytes.toDouble).toInt))
    }
  }

  /** Write `df` as parquet files of ≈`targetBytes` each. Returns the file
    * count used so callers (and tests) can assert the sizing decision. */
  def parquet(df: DataFrame, path: String, targetBytes: Long,
              compressionRatio: Double = DefaultCompressionRatio): Int = {
    val n = plannedFileCount(df, targetBytes, compressionRatio)
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
