package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalable near-duplicate candidate generation via MinHash banding — the
  * 100 TB path of SURVEY §2.11 (`m_dedup_minhash`), property-tested against
  * the exact shingle-Jaccard truth (`q_dedup_jaccard`).
  *
  * Spark-native pipeline (no MLlib — every step is a codegen'd builtin):
  *  1. 3-gram token shingles → distinct 64-bit `xxhash64` values per doc
  *     (Jaccard over these equals Jaccard over distinct shingles up to
  *     2⁻⁶⁴-probability hash collisions — tighter than hashing into
  *     HashingTF's 2¹⁸ buckets);
  *  2. `numBands` permutation minima, perm_i(h) = xxhash64(h, i) — the
  *     classic "min over a keyed re-hash" MinHash family, one
  *     `array_min(transform(...))` per band, all inside whole-stage codegen;
  *  3. banding equi-join on (band, min) — a pair becomes a candidate iff it
  *     agrees on ANY band minimum, P(candidate) = 1 − (1 − J)^numBands, the
  *     same OR-amplification as MLlib MinHashLSH with numHashTables bands;
  *  4. exact Jaccard verification of the candidates only
  *     (`array_intersect`/`array_union` on the signature arrays), keeping
  *     pairs at distance ≤ `maxJaccardDistance`.
  *
  * At scale the only shuffles are the (band, min) bucket join — never all
  * pairs — and the doc_id-keyed verify join over the surviving candidates;
  * signatures are integers, so no raw text moves after step 1. */
object MinHashDedup {

  /** OR-amplification width. 6 single-row bands keep the borderline
    * J ≈ 0.565 fixture pair at P = 1 − 0.435⁶ ≈ 0.993 while the exact
    * verify step keeps precision at 1.0 regardless. Shared with the
    * streaming ingestion path ([[graft.streaming.StreamOps.minHashDupStream]])
    * so batch and stream band the same way. */
  private[graft] val NumBands = 6

  /** The shingle→signature SQL, factored so the streaming path computes a
    * BIT-IDENTICAL signature (same tokenizer, same 3-gram join, same
    * xxhash64) — the batch≡stream property in StreamingSpec rests on one
    * derivation existing, not two that agree today. Input column `toks`,
    * output the distinct shingle-hash array. */
  private[graft] val ShinglesExpr =
    "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
  private[graft] val HashesExpr =
    "array_distinct(transform(shingles, s -> xxhash64(s)))"

  /** Per-band minima over the signature column `hs` — perm_i(h) =
    * xxhash64(h, i), min per band. */
  private[graft] def bandMinsExpr(bands: Int): String =
    s"transform(sequence(0, ${bands - 1}), i -> array_min(transform(hs, h -> xxhash64(h, i))))"

  /** @param maxBucket hot-bucket guard (the inverted-index df ≤ 1000 cap
    *        applied to banding), OPT-IN — the default is uncapped, so
    *        candidate recall is exact for every caller that does not ask
    *        otherwise. A (band, min) bucket of B docs yields B²/2
    *        candidate pairs, so ONE viral bucket — boilerplate, or a
    *        heavily replicated document — costs quadratically in its
    *        duplication depth (measured: the 100× replicated corpus
    *        overflows local spill space through exactly this join).
    *        When a cap IS passed, buckets larger than it are DROPPED and
    *        the caller owns the recall contract: a mega-bucket is usually
    *        an exact-duplicate crowd whose linear representation is hash
    *        dedup (q_dedup_exact) / the cluster representative
    *        (q_dedup_keep) — but a templated NEAR-duplicate family can
    *        also fill every band's bucket, so capped call sites must run
    *        behind an exact-dedup first pass (the m_dedup_minhash /
    *        ScaleProbe composition) or accept the loss. */
  def candidatePairs(spark: SparkSession, documents: DataFrame,
                     maxJaccardDistance: Double,
                     maxBucket: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    // Distinct shingle hashes per doc — reused by the band explode and by
    // BOTH sides of the verify join, so materialize once.
    val sig = documents
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .withColumn("shingles", expr(ShinglesExpr))
      .select($"doc_id", expr(HashesExpr).as("hs"))
      .localCheckpoint(eager = false)

    val bands = sig.select($"doc_id",
      posexplode(expr(bandMinsExpr(NumBands))).as(Seq("band", "mh")))

    // Uncapped path pays no bucket-census shuffle at all.
    val kept = if (maxBucket == Int.MaxValue) bands else {
      val keep = bands.groupBy($"band", $"mh").agg(count(lit(1)).as("bsz"))
        .filter($"bsz" <= maxBucket).select($"band", $"mh")
      bands.join(keep, Seq("band", "mh"))
    }

    val cand = kept.as("a").join(kept.as("b"), Seq("band", "mh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()

    cand
      .join(sig.select($"doc_id".as("d1"), $"hs".as("h1")), Seq("d1"))
      .join(sig.select($"doc_id".as("d2"), $"hs".as("h2")), Seq("d2"))
      .withColumn("jdist_exact", lit(1.0) -
        size(array_intersect($"h1", $"h2")).cast("double") / size(array_union($"h1", $"h2")))
      // Threshold on the UNROUNDED distance (rounding first would admit
      // pairs up to maxJaccardDistance + 5e-5); round only the output.
      .filter($"jdist_exact" <= maxJaccardDistance)
      .withColumn("jdist", round($"jdist_exact", 4))
      .select($"d1", $"d2", $"jdist")
      .orderBy($"d1", $"d2")
  }
}
