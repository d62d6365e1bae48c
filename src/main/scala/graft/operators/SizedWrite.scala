package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

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

  // ---- compacted streaming sink (round 18, r17 verdict ask #4) ----------
  //
  // A foreachBatch parquet sink accretes one file set per micro-batch —
  // after a week of 30-second triggers that is ~20k batch_id partitions of
  // splinter files, metadata pressure on every downstream listing. This
  // surface closes the loop with the BucketedTables idiom: data lives
  // under VERSIONED subdirs of a sink root, a `_current` marker names the
  // live one (checked three-step swap, crash windows recovered on read),
  // and `compact` folds the committed batches into SizedWrite-planned
  // files inside a fresh version before flipping the marker and GC'ing —
  // keeping the immediately superseded version as a GRACE copy so a
  // reader holding a pre-compaction plan still reads intact files (it
  // re-resolves within one more compaction cycle; same declared contract
  // as BucketedTables' re-write).
  //
  // Layout:   root/_current              -> "v<nanos>"  (live version)
  //           root/v<nanos>/batch_id=N/  (idempotent per-batch commits)
  //           root/v<nanos>/batch_id=W/  (the folded blob, W = watermark)
  //           root/v<nanos>/_compacted_upto  (W as text)
  //
  // Folding trades per-batch attribution BELOW the watermark for the file
  // collapse (folded rows read batch_id = W — the standard log-compaction
  // trade; Kafka compacted topics and Delta OPTIMIZE rewrite transaction
  // attribution the same way). The ledger invariant that survives:
  // batch_id > W  ⇔  the batch committed individually after the fold.
  //
  // Replay safety: Structured Streaming replays only batches AFTER the
  // last checkpoint commit, and `compact` never folds the highest present
  // id — so a replayable id is always a live partition whose overwrite
  // stays exactly-once. Defense in depth anyway: `sinkBatch` drops ids ≤
  // the watermark (their rows are already durable in the blob).
  // Single-compactor per root (the AnnIndex append discipline); the sink
  // itself may keep committing NEW batch ids concurrently — they land in
  // the version the marker named when their write started, and the grace
  // copy means a batch racing the flip is re-committed idempotently by
  // the replay machinery rather than lost silently.

  private def hfs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(spark: SparkSession, path: String, value: String): Unit = {
    val out = hfs(spark, path).create(new org.apache.hadoop.fs.Path(path), true)
    out.write(value.getBytes("UTF-8")); out.close()
  }

  private def readText(spark: SparkSession, path: String): Option[String] = {
    val fs = hfs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Flip the `_current` marker with the AnnIndex.writeMeta checked swap:
    * stage `_current_new`, back the live marker up, rename the stage in,
    * drop the backup — every rename result verified. */
  private def flipMarker(spark: SparkSession, root: String, version: String): Unit = {
    val fs = hfs(spark, root)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$root/$n")
    writeText(spark, s"$root/_current_new", version)
    if (fs.exists(p("_current_old"))) fs.delete(p("_current_old"), false)
    if (fs.exists(p("_current")))
      require(fs.rename(p("_current"), p("_current_old")),
        s"$root: could not stage marker backup")
    require(fs.rename(p("_current_new"), p("_current")),
      s"$root: could not swap sink marker")
    fs.delete(p("_current_old"), false)
  }

  /** Live version name, recovering the flip's crash windows (prefer the
    * fully-written `_current_new`, else the `_current_old` backup). */
  def currentVersion(spark: SparkSession, root: String): Option[String] = {
    val fs = hfs(spark, root)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$root/$n")
    if (!fs.exists(p("_current"))) {
      if (fs.exists(p("_current_new")))
        require(fs.rename(p("_current_new"), p("_current")),
          s"$root: marker recovery from _current_new failed")
      else if (fs.exists(p("_current_old")))
        require(fs.rename(p("_current_old"), p("_current")),
          s"$root: marker recovery from _current_old failed")
    }
    readText(spark, s"$root/_current")
  }

  private def uptoPath(versionDir: String) = s"$versionDir/_compacted_upto"

  /** Fold watermark of a version dir: every batch id ≤ this is already
    * durable inside the blob partition. Long.MinValue before any fold. */
  def compactedUpto(spark: SparkSession, root: String): Long =
    currentVersion(spark, root)
      .flatMap(v => readText(spark, uptoPath(s"$root/$v")))
      .map(_.toLong).getOrElse(Long.MinValue)

  /** foreachBatch-compatible committer for a compacted sink root: resolves
    * (or initializes) the live version and lands the batch in its own
    * `batch_id=N` partition with overwrite semantics — the replay-
    * idempotent commit of `StreamOps.commitBatch`, versioned. Ids at or
    * below the fold watermark are DROPPED: their rows are already durable
    * in the blob, so the replay is answered, not re-appended. */
  def sinkBatch(root: String): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val cur = currentVersion(spark, root).getOrElse {
      val v = s"v${System.nanoTime()}"
      hfs(spark, root).mkdirs(new org.apache.hadoop.fs.Path(s"$root/$v"))
      flipMarker(spark, root, v)
      v
    }
    val upto = readText(spark, uptoPath(s"$root/$cur")).map(_.toLong)
      .getOrElse(Long.MinValue)
    if (batchId > upto)
      batch.write.mode("overwrite").parquet(s"$root/$cur/batch_id=$batchId")
  }

  /** The reader's view of a compacted sink root: the live version as one
    * partition-discovered parquet table (batch_id present; folded rows
    * carry the watermark id). Lazy — Catalyst prunes/pushes into it. */
  def readSink(spark: SparkSession, root: String): DataFrame = {
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root: no _current marker — not a compacted sink root"))
    spark.read.parquet(s"$root/$cur")
  }

  /** Compact the sink: fold every committed batch EXCEPT the highest
    * present id (the replay window stays live) into one blob partition of
    * [[plannedFileCount]]-sized files inside a fresh version dir, carry
    * the live batch over, flip the marker, GC all versions except the new
    * one and its immediate predecessor (the reader grace copy). Returns
    * the blob's file count (0 = nothing to fold). */
  def compact(spark: SparkSession, root: String, targetBytes: Long,
              compressionRatio: Double = DefaultCompressionRatio): Int = {
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root: no _current marker — not a compacted sink root"))
    val curPath = s"$root/$cur"
    val fs = hfs(spark, root)
    val ids = fs.listStatus(new org.apache.hadoop.fs.Path(curPath))
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted.toSeq
    if (ids.size <= 1) return 0
    val maxId = ids.max
    val watermark = ids.filter(_ != maxId).max
    val newV = s"v${System.nanoTime()}"
    val newPath = s"$root/$newV"
    val base = spark.read.option("basePath", curPath)
      .parquet(ids.map(i => s"$curPath/batch_id=$i"): _*)
    val folded = base.filter(col("batch_id") =!= maxId).drop("batch_id")
    val n = plannedFileCount(folded, targetBytes, compressionRatio)
    folded.repartition(n).write.mode("overwrite")
      .parquet(s"$newPath/batch_id=$watermark")
    base.filter(col("batch_id") === maxId).drop("batch_id")
      .write.mode("overwrite").parquet(s"$newPath/batch_id=$maxId")
    writeText(spark, uptoPath(newPath), watermark.toString)
    flipMarker(spark, root, newV)
    // GC with grace: the superseded version serves readers that resolved
    // before the flip; everything older goes
    fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath).filter(p => p.getName.startsWith("v"))
      .filter(p => p.getName != newV && p.getName != cur)
      .foreach(p => fs.delete(p, true))
    n
  }
}
