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

  // ---- incremental append (round 17, r16 verdict missing #2) -----------

  private lazy val embA = emb.filter($"vec_id" % 2 === 0)
  private lazy val embB = emb.filter($"vec_id" % 2 =!= 0)

  test("IVF append: appended index == fitted postings ∪ frozen-encoded new rows; staleness bumps") {
    val dir = tmp("ivf_app")
    AnnIndex.writeIvf(spark, embA, dir, nlist = 8)
    // pin the PRE-append artifacts (eager checkpoint = no re-read of the
    // files the append is about to add to)
    val (postA0, cents0) = AnnIndex.readIvf(spark, dir)
    val postA = postA0.localCheckpoint(true)
    val cents = cents0.localCheckpoint(true)
    val nA = postA.count()
    val nB = AnnIndex.appendIvf(spark, embB, dir)
    assert(nB == embB.count(), "every new vector must append")
    assert(AnnIndex.staleness(spark, dir) == (nA, nB))
    // the postings TABLE is exactly the union (doubles round-trip parquet
    // bit-exactly, so string equality is exact equality) ...
    val (postU, centsU) = AnnIndex.readIvf(spark, dir)
    val expected = postA.union(AnnIVF.encodeFrozen(spark, embB, cents))
    assert(rows(postU) == rows(expected))
    // ... and so are the query results over the union
    val got = AnnIVF.topKFrom(spark, postU, centsU, 0L until 10L, k = 5, nprobe = 4)
    val want = AnnIVF.topKFrom(spark, expected, cents, 0L until 10L, k = 5, nprobe = 4)
    assert(rows(got) == rows(want))
  }

  test("PQ append: appended codes == fitted ∪ frozen-encoded; query results match the union") {
    val dir = tmp("pq_app")
    AnnIndex.writePq(spark, embA, dir, m = 8, ksub = 16)
    val (codesA0, books) = AnnIndex.readPq(spark, dir)
    val codesA = codesA0.localCheckpoint(true)
    val nA = codesA.count()
    val nB = AnnIndex.appendPq(spark, embB, dir)
    assert(AnnIndex.staleness(spark, dir) == (nA, nB))
    val (codesU, booksU) = AnnIndex.readPq(spark, dir)
    val expected = codesA.union(AnnPQ.encodeFrozen(spark, embB, books))
    assert(rows(codesU) == rows(expected))
    val got = AnnPQ.topKFrom(spark, codesU, booksU, 0L until 10L, k = 5, rerank = 50)
    val want = AnnPQ.topKFrom(spark, expected, books, 0L until 10L, k = 5, rerank = 50)
    assert(rows(got) == rows(want))
  }

  test("IVFADC append: appended codes == fitted ∪ frozen-encoded; query results match the union") {
    val dir = tmp("ivfpq_app")
    AnnIndex.writeIvfPq(spark, embA, dir, nlist = 8, m = 8, ksub = 16)
    val (codesA0, cents, books) = AnnIndex.readIvfPq(spark, dir)
    val codesA = codesA0.localCheckpoint(true)
    val nA = codesA.count()
    val nB = AnnIndex.appendIvfPq(spark, embB, dir)
    assert(AnnIndex.staleness(spark, dir) == (nA, nB))
    val (codesU, centsU, booksU) = AnnIndex.readIvfPq(spark, dir)
    val expected = codesA.union(AnnIvfPq.encodeFrozen(spark, embB, cents, books))
    assert(rows(codesU) == rows(expected))
    val got = AnnIvfPq.topKFrom(spark, codesU, centsU, booksU,
      0L until 10L, k = 5, nprobe = 6, rerank = 80)
    val want = AnnIvfPq.topKFrom(spark, expected, cents, books,
      0L until 10L, k = 5, nprobe = 6, rerank = 80)
    assert(rows(got) == rows(want))
  }

  test("append retries are idempotent: a replayed batch adds no duplicate vectors") {
    // post-r17 review: an orchestrator re-running an append after a crash
    // (data committed, success not recorded) must not duplicate vec_ids
    val dir = tmp("ivf_retry")
    AnnIndex.writeIvf(spark, embA, dir, nlist = 8)
    val n1 = AnnIndex.appendIvf(spark, embB, dir)
    val (postings1, _) = AnnIndex.readIvf(spark, dir)
    val rows1 = rows(postings1)
    val n2 = AnnIndex.appendIvf(spark, embB, dir) // full replay
    assert(n2 == 0L, s"replayed append claimed $n2 new rows")
    assert(AnnIndex.staleness(spark, dir) == (embA.count(), n1))
    val (postings2, _) = AnnIndex.readIvf(spark, dir)
    assert(rows(postings2) == rows1, "replay changed the postings table")
  }

  test("append refuses past the declared drift budget instead of silently degrading") {
    val dir = tmp("ivf_budget")
    AnnIndex.writeIvf(spark, embA, dir, nlist = 8)
    AnnIndex.appendIvf(spark, embB, dir) // |B| <= |A|: inside the budget
    // a second batch of genuinely NEW vectors (fresh ids — a replay would
    // dedup to zero and pass) pushes appended past MaxAppendFraction
    val e = intercept[IllegalArgumentException] {
      AnnIndex.appendIvf(spark,
        embB.withColumn("vec_id", $"vec_id" + 1000000L), dir)
    }
    assert(e.getMessage.contains("drift budget") && e.getMessage.contains("re-fit"))
  }

  test("meta swap crash windows recover on the next read") {
    // simulate the two kill-points inside writeMeta's checked swap: the
    // next metadata read must restore a usable meta from whichever of
    // meta_new / meta_old survived
    val dir = tmp("ivf_meta")
    AnnIndex.writeIvf(spark, embA, dir, nlist = 8)
    val want = AnnIndex.staleness(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$dir/$n")
    // window A: live staged aside to meta_old, replacement never landed
    assert(fs.rename(p("meta"), p("meta_old")))
    assert(AnnIndex.staleness(spark, dir) == want, "recovery from meta_old")
    // window B: live gone, fully-written meta_new present
    assert(fs.rename(p("meta"), p("meta_new")))
    assert(AnnIndex.staleness(spark, dir) == want, "recovery from meta_new")
    // and the full read path works after recovery
    assert(AnnIndex.readIvf(spark, dir)._1.count() == embA.count())
  }

  test("same-session rewrite invalidates the cached read plans (r16 advice)") {
    val dir = tmp("ivf_evict")
    AnnIndex.writeIvf(spark, embA, dir, nlist = 8)
    val nA = AnnIndex.readIvf(spark, dir)._1.count()
    assert(nA == embA.count())
    AnnIndex.writeIvf(spark, emb, dir, nlist = 8) // full rewrite, same dir
    val nFull = AnnIndex.readIvf(spark, dir)._1.count()
    assert(nFull == emb.count(),
      s"reopen after rewrite served stale plans: $nFull != ${emb.count()}")
  }
}
