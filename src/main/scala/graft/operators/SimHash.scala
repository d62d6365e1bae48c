package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate fingerprinting (SURVEY §2.11 extension,
  * `m_dedup_simhash`) — the constant-space alternative to MinHash: one
  * 64-bit fingerprint per document, near-dups = small Hamming distance.
  *
  * Banding gives exact completeness at scale: with 4 bands of 16 bits,
  * any pair at Hamming ≤ 3 shares ≥1 band (pigeonhole), so an equi-join
  * on (band index, band bits) finds all such pairs without N² work.
  * Token hashes are the first 8 bytes of md5 — deterministic everywhere. */
object SimHash {

  /** 64-bit simhash of a token multiset. */
  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { tok =>
      val d = MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
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

  /** (doc_id, sh) fingerprints. */
  def fingerprints(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) => (id, simhash64(text.split(" ").toSeq)) }
      .toDF("doc_id", "sh")
  }

  /** All pairs with Hamming(sh) ≤ maxHamming (≤ 3 guaranteed complete
    * with 4 bands; larger thresholds may miss pairs — callers that need
    * completeness beyond 3 should raise the band count). */
  def nearDupPairs(spark: SparkSession, documents: DataFrame, maxHamming: Int): DataFrame = {
    import spark.implicits._
    val fp = fingerprints(spark, documents)
    val banded = fp.select($"doc_id", $"sh",
      // & mask, not % — for band 0 the shift is 0 and Java's % keeps the
      // sign of a negative fingerprint, so opposite-sign pairs sharing only
      // band 0 would never equi-join; bitwise AND is sign-safe.
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, shiftrightunsigned(sh, b * 16) & 65535 AS bits))"))
        .as("bb"))
      .select($"doc_id", $"sh", $"bb.band", $"bb.bits")
    banded.as("a").join(banded.as("b"), Seq("band", "bits"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), $"a.sh".as("sh1"), $"b.sh".as("sh2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh1 ^ sh2)").cast("long"))
      .filter($"hamming" <= maxHamming)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }
}
