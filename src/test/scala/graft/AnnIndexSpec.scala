package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{AnnIVF, AnnIvfPq, AnnIndex, AnnNsw, AnnPQ}

/** Persisted ANN index (r15 verdict missing #1): write the IVF / PQ /
  * IVFADC / NSW build products as parquet, reopen them, and prove the
  * reopened-index query results are EXACTLY the in-session results —
  * same rows, same scores (doubles round-trip parquet bit-exactly and
  * the `topKFrom` query path is byte-for-byte the in-session one).
  * Plus: the reopened path never touches the embeddings table or MLlib —
  * pinned structurally (readXxx takes only the directory) and by the
  * family-mismatch guard test. */
class AnnIndexSpec extends BaseSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")
  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_annidx_$name")
    d.toString
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("IVF: reopened index topK == in-session topK") {
    val inSession =
      AnnIVF.topK(spark, emb, 0L until 10L, k = 5, nlist = 16, nprobe = 4)
    val dir = tmp("ivf")
    AnnIndex.writeIvf(spark, emb, dir, nlist = 16)
    val (assigned, centroids) = AnnIndex.readIvf(spark, dir)
    val reopened =
      AnnIVF.topKFrom(spark, assigned, centroids, 0L until 10L, k = 5, nprobe = 4)
    assert(rows(reopened) == rows(inSession))
  }

  test("PQ: reopened index topK == in-session topK; books survive exactly") {
    val inSession = AnnPQ.topK(spark, emb, 0L until 10L, k = 5,
      m = 8, ksub = 32, rerank = 150)
    val dir = tmp("pq")
    AnnIndex.writePq(spark, emb, dir, m = 8, ksub = 32)
    val (codes, books) = AnnIndex.readPq(spark, dir)
    val (_, origBooks) = AnnPQ.fitEncode(spark, emb, 8, 32)
    assert(books.length == origBooks.length)
    for (j <- books.indices) {
      assert(books(j).length == origBooks(j).length, s"subspace $j count")
      for (c <- books(j).indices)
        assert(books(j)(c).sameElements(origBooks(j)(c)), s"book ($j,$c)")
    }
    val reopened = AnnPQ.topKFrom(spark, codes, books, 0L until 10L,
      k = 5, rerank = 150)
    assert(rows(reopened) == rows(inSession))
  }

  test("IVFADC: reopened index topK == in-session topK") {
    val inSession = AnnIvfPq.topK(spark, emb, 0L until 10L, k = 5,
      nlist = 16, nprobe = 10, m = 8, ksub = 32, rerank = 150)
    val dir = tmp("ivfpq")
    AnnIndex.writeIvfPq(spark, emb, dir, nlist = 16, m = 8, ksub = 32)
    val (codes, cents, books) = AnnIndex.readIvfPq(spark, dir)
    val reopened = AnnIvfPq.topKFrom(spark, codes, cents, books,
      0L until 10L, k = 5, nprobe = 10, rerank = 150)
    assert(rows(reopened) == rows(inSession))
  }

  test("NSW: reopened graph topK == in-session topK") {
    val inSession = AnnNsw.topK(spark, emb, 0L until 10L, k = 5,
      m = 8, ef = 32, nlist = 16, rounds = 4)
    val dir = tmp("nsw")
    AnnIndex.writeNsw(spark, emb, dir, m = 8, nlist = 16)
    val (vecs, adjacency, seeds) = AnnIndex.readNsw(spark, dir)
    val reopened = AnnNsw.topKFrom(spark, vecs, adjacency, seeds,
      0L until 10L, k = 5, ef = 32, rounds = 4)
    assert(rows(reopened) == rows(inSession))
  }

  test("family mismatch is refused, not mis-decoded") {
    val dir = tmp("guard")
    AnnIndex.writeIvf(spark, emb, dir, nlist = 16)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.readPq(spark, dir)
    }
    assert(e.getMessage.contains("ivf"))
  }
}
