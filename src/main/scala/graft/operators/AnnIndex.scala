package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted / reloadable ANN index (r15 verdict missing #1): the IVF /
  * PQ / IVFADC / NSW build products — centroids, codebooks, coded
  * postings, graph adjacency — written as plain parquet TABLES and
  * reopened in a later session, so a training-data pipeline builds the
  * index ONCE and serves many query batches across jobs instead of
  * re-fitting the quantizer per session (the [[graft.SessionMemo]]
  * entries die with the session; these files do not).
  *
  * Layout under `dir` (one directory per family, self-describing):
  *  - `meta` — single-row parquet: (family, nlist, m, ksub) build params,
  *    so a reader can refuse a family mismatch instead of mis-decoding.
  *  - data-sized artifacts (postings/codes/vecs/adjacency) are written
  *    with their INHERITED partitioning: their lineage is narrow from the
  *    embeddings scan (already `maxPartitionBytes`-sized), so file sizes
  *    come out scan-shaped without a resize. They deliberately do NOT go
  *    through [[SizedWrite]]'s stats sizing: these frames are
  *    join/window-derived, and optimizer sizeInBytes on such plans is a
  *    selectivity ESTIMATE, not a measurement — r16 measured a KB-sized
  *    adjacency frame estimated at terabytes, turning the sizing
  *    repartition into a 12k-task stall (SizedWrite.MaxFiles now bounds
  *    that failure mode for its own callers).
  *  - query-sized artifacts (centroids, codebooks, seeds) coalesce to
  *    one file each (they are nlist / m·ksub rows).
  *
  * Reopened artifacts feed the operators' `topKFrom` entry points, which
  * share every line of query code with the in-session path — the
  * AnnIndexSpec property is reopened ≡ in-session RESULTS, not "similar
  * recall". Doubles round-trip parquet bit-exactly, so equality is exact.
  *
  * Reads are memoized per (session, dir) — the memo holds the LAZY
  * parquet plans (footer/schema listing done once), never materialized
  * data, so Catalyst still prunes/pushes into the scans per query. */
object AnnIndex {

  private val readMemo = new graft.SessionMemo[String, Map[String, DataFrame]]

  /** Data-sized artifact write: inherited (scan-shaped) partitioning —
    * see the class scaladoc for why this is NOT SizedWrite. */
  private def writeData(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  private def writeMeta(spark: SparkSession, dir: String, family: String,
                        nlist: Int, m: Int, ksub: Int): Unit = {
    import spark.implicits._
    Seq((family, nlist, m, ksub)).toDF("family", "nlist", "m", "ksub")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def checkMeta(spark: SparkSession, dir: String, family: String): Unit = {
    import spark.implicits._
    val got = spark.read.parquet(s"$dir/meta")
      .select($"family").as[String].head()
    require(got == family,
      s"$dir holds a '$got' index, not '$family' — refusing to mis-decode")
  }

  /** Codebooks as a table: (j, c, vals) — subspace, code, centroid. */
  private def booksDf(spark: SparkSession,
                      books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      j <- books.indices
      c <- books(j).indices
    } yield (j, c, books(j)(c).toSeq)).toDF("j", "c", "vals")
  }

  private def readBooks(df: DataFrame): Array[Array[Array[Double]]] = {
    import df.sparkSession.implicits._
    df.select($"j", $"c", $"vals").as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray).toArray).toArray
  }

  // ---- IVF: postings (vec_id, v, cell) + centroids (cell, cv) ----------

  def writeIvf(spark: SparkSession, embeddings: DataFrame, dir: String,
               nlist: Int): Unit = {
    val (assigned, centroids) = AnnIVF.assignments(spark, embeddings, nlist)
    writeMeta(spark, dir, "ivf", nlist, 0, 0)
    writeData(assigned, s"$dir/postings")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** (assigned, centroids) — feed [[AnnIVF.topKFrom]]. */
  def readIvf(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val t = readMemo.getOrCompute(spark, dir) {
      checkMeta(spark, dir, "ivf")
      Map("postings" -> spark.read.parquet(s"$dir/postings"),
        "centroids" -> spark.read.parquet(s"$dir/centroids"))
    }
    (t("postings"), t("centroids"))
  }

  // ---- PQ: codes (vec_id, v, code) + codebooks --------------------------

  def writePq(spark: SparkSession, embeddings: DataFrame, dir: String,
              m: Int, ksub: Int): Unit = {
    val (codes, books) = AnnPQ.fitEncode(spark, embeddings, m, ksub)
    writeMeta(spark, dir, "pq", 0, m, ksub)
    writeData(codes, s"$dir/codes")
    booksDf(spark, books).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/books")
  }

  /** (codes, books) — feed [[AnnPQ.topKFrom]]. */
  def readPq(spark: SparkSession, dir: String)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    val t = readMemo.getOrCompute(spark, dir) {
      checkMeta(spark, dir, "pq")
      Map("codes" -> spark.read.parquet(s"$dir/codes"),
        "books" -> spark.read.parquet(s"$dir/books"))
    }
    (t("codes"), readBooks(t("books")))
  }

  // ---- IVFADC: codes (vec_id, v, cell, code) + centroids + books --------

  def writeIvfPq(spark: SparkSession, embeddings: DataFrame, dir: String,
                 nlist: Int, m: Int, ksub: Int): Unit = {
    import spark.implicits._
    val (codes, cents, books) =
      AnnIvfPq.fitEncode(spark, embeddings, nlist, m, ksub)
    writeMeta(spark, dir, "ivfpq", nlist, m, ksub)
    writeData(codes, s"$dir/codes")
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cv").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    booksDf(spark, books).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/books")
  }

  /** (codes, centroids, books) — feed [[AnnIvfPq.topKFrom]]. */
  def readIvfPq(spark: SparkSession, dir: String)
      : (DataFrame, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    import spark.implicits._
    val t = readMemo.getOrCompute(spark, dir) {
      checkMeta(spark, dir, "ivfpq")
      Map("codes" -> spark.read.parquet(s"$dir/codes"),
        "centroids" -> spark.read.parquet(s"$dir/centroids"),
        "books" -> spark.read.parquet(s"$dir/books"))
    }
    val cents = t("centroids").select($"cell", $"cv")
      .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    (t("codes"), cents, readBooks(t("books")))
  }

  // ---- NSW: vecs + adjacency + seeds ------------------------------------

  def writeNsw(spark: SparkSession, embeddings: DataFrame, dir: String,
               m: Int, nlist: Int): Unit = {
    val (vecs, adjacency, seeds) = AnnNsw.buildGraph(spark, embeddings, m, nlist)
    writeMeta(spark, dir, "nsw", nlist, m, 0)
    writeData(vecs, s"$dir/vecs")
    writeData(adjacency, s"$dir/adjacency")
    seeds.coalesce(1).write.mode("overwrite").parquet(s"$dir/seeds")
  }

  /** (vecs, adjacency, seeds) — feed [[AnnNsw.topKFrom]]. */
  def readNsw(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val t = readMemo.getOrCompute(spark, dir) {
      checkMeta(spark, dir, "nsw")
      Map("vecs" -> spark.read.parquet(s"$dir/vecs"),
        "adjacency" -> spark.read.parquet(s"$dir/adjacency"),
        "seeds" -> spark.read.parquet(s"$dir/seeds"))
    }
    (t("vecs"), t("adjacency"), t("seeds"))
  }
}
