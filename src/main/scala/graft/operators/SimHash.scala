package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate fingerprinting (SURVEY §2.11 extension,
  * `m_dedup_simhash`) — the constant-space alternative to MinHash: one
  * 64-bit fingerprint per document, near-dups = small Hamming distance.
  *
  * Banding gives exact completeness at scale: with 4 bands of 16 bits,
  * any pair at Hamming ≤ 3 shares ≥1 band (pigeonhole), so an equi-join
  * on (band index, band bits) finds all such pairs without N² work.
  *
  * Fingerprints are computed entirely in whole-stage codegen: token hashes
  * are Spark's builtin `xxhash64` (explode → hash), and the per-bit
  * majority vote is a single 64-column hash aggregate (sum of ±1 per bit,
  * then one bitwise fold) — no JVM lambdas, no per-token allocations, and
  * map-side partial aggregation bounds the shuffle at 64 longs per doc per
  * partition. The Scala [[simhash64]] mirror (used by the property tests as
  * the brute-force reference) calls the same XxHash64 kernel, so both paths
  * produce identical fingerprints. */
object SimHash {

  /** Same 64-bit hash Spark's `xxhash64(col)` computes for a STRING (seed
    * 42) — the single source of token-hash truth for both paths. */
  def tokenHash(tok: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(tok),
      org.apache.spark.sql.types.StringType, 42L)

  /** 64-bit simhash of a token multiset (driver-side reference mirror of
    * the DataFrame aggregate below; ties: count 0 → bit clear). */
  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { tok =>
      val h = tokenHash(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** (doc_id, sh) fingerprints — explode to (doc, token-hash) rows, then one
    * 64-slot ±1 hash aggregate per doc and a bitwise fold. */
  def fingerprints(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = documents
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    val bitVotes = (0 until 64).map(b =>
      sum(when(expr(s"shiftrightunsigned(h, $b) & 1") === 1L, 1).otherwise(-1))
        .as(s"s$b"))
    val fold: Column = (0 until 64)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    toks.groupBy($"doc_id").agg(bitVotes.head, bitVotes.tail: _*)
      .select($"doc_id", fold.as("sh"))
  }

  /** All pairs with Hamming(sh) ≤ maxHamming. At the default (uncapped)
    * maxBucket the 4-band pigeonhole guarantee is unconditional: every
    * pair at Hamming ≤ 3 shares at least one intact 16-bit band and IS
    * returned. When a maxBucket cap is passed, that completeness becomes
    * CONDITIONAL on every shared (band, bits) bucket holding ≤ maxBucket
    * fingerprints — pairs living only in over-cap buckets are dropped.
    * Thresholds above 3 may miss pairs either way — raise the band count
    * for completeness beyond 3.
    *
    * @param maxBucket hot-bucket guard (the MinHashDedup discipline),
    *        OPT-IN — default uncapped. A (band, bits) bucket of B docs
    *        yields B²/2 pairs, so one fingerprint crowd — identical or
    *        near-identical documents replicated at depth — costs
    *        quadratically. Capped call sites trade in-bucket completeness
    *        (usually an exact-duplicate crowd, hash dedup's linear job)
    *        for survival on replication-heavy corpora, and should run
    *        behind an exact-dedup first pass. */
  def nearDupPairs(spark: SparkSession, documents: DataFrame, maxHamming: Int,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val fp = fingerprints(spark, documents)
    val banded = fp.select($"doc_id", $"sh",
      // & mask, not % — for band 0 the shift is 0 and Java's % keeps the
      // sign of a negative fingerprint, so opposite-sign pairs sharing only
      // band 0 would never equi-join; bitwise AND is sign-safe.
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, shiftrightunsigned(sh, b * 16) & 65535 AS bits))"))
        .as("bb"))
      .select($"doc_id", $"sh", $"bb.band", $"bb.bits")
    // Uncapped path pays no bucket-census shuffle at all.
    val kept = if (maxBucket == Int.MaxValue) banded else {
      val keep = banded.groupBy($"band", $"bits").agg(count(lit(1)).as("bsz"))
        .filter($"bsz" <= maxBucket).select($"band", $"bits")
      banded.join(keep, Seq("band", "bits"))
    }
    kept.as("a").join(kept.as("b"), Seq("band", "bits"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), $"a.sh".as("sh1"), $"b.sh".as("sh2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh1 ^ sh2)").cast("long"))
      .filter($"hamming" <= maxHamming)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }
}
