package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate vector-similarity join via bucketed random projections
  * (SURVEY §2.11 `m_sim_lsh`) — the euclidean LSH scale path for the
  * embedding column, property-tested for recall against the exact cosine
  * truth (`q_sim_cosine` / `q_sim_knn_vec`).
  *
  * At scale `approxSimilarityJoin` shuffles on (hash bucket), so the pair
  * candidate set is bucket-local, never N². bucketLength trades recall for
  * bucket size; pair distances on unit-norm 64-dim vectors concentrate near
  * √2, so thresholds live in [1, 1.4] and bucketLength 2.0 keeps buckets small. */
object VectorLSH {

  def candidatePairs(spark: SparkSession, embeddings: DataFrame,
                     maxEuclideanDistance: Double): DataFrame = {
    import spark.implicits._
    val vecs = embeddings
      .withColumn("features", array_to_vector($"embedding"))
      .select($"vec_id", $"features")

    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vecs)

    // Materialize the projections ONCE (same fix as MinHashDedup):
    // approxSimilarityJoin self-joins its input, and without this both
    // sides replay array→vector + 4 random projections per row; with the
    // output column present it skips re-transforming.
    val hashed = model.transform(vecs).localCheckpoint()

    model.approxSimilarityJoin(hashed, hashed, maxEuclideanDistance, "edist")
      .select(col("datasetA.vec_id").as("va"), col("datasetB.vec_id").as("vb"),
              round(col("edist"), 4).as("edist"))
      .filter($"va" < $"vb")
      .orderBy($"va", $"vb")
  }
}
