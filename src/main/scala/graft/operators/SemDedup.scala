package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** SemDeDup (Abbas, Tirumala, Simig, Ganguli & Morcos, arXiv 2303.09540,
  * 2023): SEMANTIC deduplication of an embedding corpus — cluster with a
  * k-means coarse quantizer, find near-duplicate pairs ONLY within each
  * cluster, and keep one representative per duplicate group, chosen as the
  * member LEAST similar to its cluster centroid (the paper's rule: when a
  * semantic group collapses to one example, keep the most atypical one —
  * it preserves more diversity than keeping the medoid).
  *
  * Position in the dedup family: exact-hash (`q_dedup_exact`) catches
  * byte-dups, MinHash/SimHash catch lexical near-dups, embedding-LSH
  * (`q_dedup_embcos`) catches pairwise semantic dups with guaranteed
  * recall at a radius; SemDeDup is the CORPUS-level semantic pass — the
  * cluster structure bounds the pair search (never all-pairs) and the
  * keep rule is global per group, which a pairwise radius join cannot
  * express. The published trade-off is DECLARED: a near-dup pair split
  * across two k-means cells is missed (k-means is not a cover — the
  * paper accepts this; the LSH key is the recall-guaranteed alternative).
  *
  * Scale shape: the pair search is a cell equi-join of the assignment
  * frame against itself — bucket-local, cell population constant when
  * nlist ∝ N (the AnnNsw build argument), so the quadratic is per-cell
  * and bounded; components come from the same star-contraction CC every
  * dedup key uses; the keep rule is one groupBy over the (tiny) duplicate
  * set. The k-means fit is the memoized one-off batch job shared with the
  * IVF/NSW keys ([[AnnIVF.assignments]]) — at 100 TB the cell is the
  * physical partition column and the self-join is partition-local. */
object SemDedup {

  /** @param assigned  (vec_id, v, cell) — [[AnnIVF.assignments]]._1
    * @param centroids (cell, cv) — [[AnnIVF.assignments]]._2
    * @param tauCos    duplicate threshold on exact cosine
    * @return one row per vector: (vec_id, cell, comp, ccos, keep) — comp
    *         is the duplicate-group id (min vec_id, singleton = itself),
    *         ccos the centroid cosine, keep the SemDeDup survivorship */
  def run(spark: SparkSession, assigned: DataFrame, centroids: DataFrame,
          tauCos: Double): DataFrame = {
    import spark.implicits._
    VectorOps.register(spark)
    val a = assigned.select($"vec_id", $"v", $"cell")
    // bucket-local candidate pairs + exact cosine gate, map-side before
    // any distinct (the Traclus discipline)
    val pairs = a.select($"cell", $"vec_id".as("src"), $"v".as("v1"))
      .join(a.select($"cell", $"vec_id".as("dst"), $"v".as("v2")), Seq("cell"))
      .filter($"src" < $"dst")
      .filter(VectorOps.cosineSim($"v1", $"v2") >= tauCos)
      .select($"src", $"dst")
    val comps = ConnectedComponents
      .run(spark, a.select($"vec_id".as("id")), pairs)
      .select($"id".as("vec_id"), $"comp")
    // keep rule: per group, the member least similar to its centroid
    // (tie → smallest vec_id); singletons trivially keep themselves
    val scored = a.join(broadcast(centroids), Seq("cell"))
      .withColumn("ccos", VectorOps.cosineSim($"v", $"cv"))
      .join(comps, Seq("vec_id"))
    val keepers = scored.groupBy($"comp")
      .agg(min(struct($"ccos", $"vec_id")).as("k"))
      .select($"comp", $"k.vec_id".as("keep_id"))
    scored.join(keepers, Seq("comp"))
      .select($"vec_id", $"cell", $"comp", $"ccos",
        ($"vec_id" === $"keep_id").as("keep"))
  }
}
