package graft

import org.apache.spark.sql.functions._
import graft.operators.TrajLsh

/** [[TrajLsh]] — the MinHash-LSH near-duplicate trajectory join: planted-
  * corridor recall, exact-verify precision, the candidate-scan reduction
  * vs all pairs, and determinism. The negative result that scoped this
  * operator (LSH cannot serve the top-10-nearest keys on this fixture) is
  * measured in the operator scaladoc and enforced by TrajectorySpec's
  * exact-tier equalities instead. */
class TrajLshSpec extends BaseSpec {
  import spark.implicits._

  /** Synthetic fleet: `nNoise` users with random low-overlap cell sets,
    * plus planted corridor clusters that share most cells. */
  private def fleet(nNoise: Int, seed: Int): Seq[(Long, Seq[Int])] = {
    val rnd = new scala.util.Random(seed)
    val noise = (0 until nNoise).map { u =>
      (u.toLong, Seq.fill(30)(rnd.nextInt(2000)).distinct)
    }
    // three corridors: pairs (1000,1001) J≈0.9, (1002,1003) J≈0.6,
    // (1004,1005) J≈0.5 — all inside the near-dup contract
    val base1 = Seq.tabulate(30)(i => 5000 + i)
    val base2 = Seq.tabulate(30)(i => 6000 + i)
    val base3 = Seq.tabulate(30)(i => 7000 + i)
    noise ++ Seq(
      (1000L, base1), (1001L, base1.drop(2) ++ Seq(5100, 5101)),
      (1002L, base2), (1003L, base2.drop(8) ++ Seq.tabulate(7)(i => 6100 + i)),
      (1004L, base3), (1005L, base3.drop(10) ++ Seq.tabulate(10)(i => 7100 + i)))
  }

  test("planted corridors found with exact Jaccard; nothing below threshold; deterministic") {
    val users = fleet(60, 421).toDF("user_id", "cells")
      .withColumn("cells", $"cells".cast("array<int>"))
    val got = TrajLsh.candidatePairs(spark, users, minJaccard = 0.45)
      .as[(Long, Long, Double)].collect().toSeq
    val pairs = got.map(p => (p._1, p._2)).toSet
    assert(Set((1000L, 1001L), (1002L, 1003L), (1004L, 1005L)).subsetOf(pairs),
      s"planted corridors missing from $pairs")
    // exact-verify precision: every reported J must equal the driver-side
    // set Jaccard and clear the threshold
    val cellMap = fleet(60, 421).toMap
    got.foreach { case (u1, u2, j) =>
      val (a, b) = (cellMap(u1).toSet, cellMap(u2).toSet)
      val want = math.rint(a.intersect(b).size.toDouble / a.union(b).size * 1e4) / 1e4
      assert(j == want && j >= 0.45, s"($u1,$u2): reported $j vs exact $want")
    }
    // determinism: fixed hash family, identical output on a second run
    val again = TrajLsh.candidatePairs(spark, users, minJaccard = 0.45)
      .as[(Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("candidate scan is a real reduction: bulk-J pairs mostly never reach the verify") {
    // 120 noise users -> 7140 all-pairs; with J ~ 0.02-0.05 bulk overlap the
    // r=2 AND-banding admits ~6% — assert the candidate count stays well
    // under all-pairs (the 100x-users argument: admission is per-pair
    // probability, independent of U)
    val rnd = new scala.util.Random(17)
    val users = (0 until 120)
      .map(u => (u.toLong, Seq.fill(40)(rnd.nextInt(1200)).distinct))
      .toDF("user_id", "cells").withColumn("cells", $"cells".cast("array<int>"))
    val nHash = 48 // r=2, b=24 defaults
    val sig = users
      .withColumn("mh", expr(
        s"transform(sequence(0, ${nHash - 1}), i -> array_min(transform(cells, c -> xxhash64(c, i))))"))
    val bands = sig.select($"user_id", posexplode(expr(
      "transform(sequence(0, 23), t -> xxhash64(element_at(mh, t * 2 + 1), element_at(mh, t * 2 + 2)))"))
      .as(Seq("band", "bk")))
    val nCand = bands.as("a").join(bands.as("b"), Seq("band", "bk"))
      .filter(col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id"), col("b.user_id")).distinct().count()
    val allPairs = 120L * 119 / 2
    assert(nCand < allPairs / 4,
      s"banding admitted $nCand of $allPairs pairs - no reduction")
    // and none of those bulk pairs survives the exact verify at J >= 0.45
    val verified = TrajLsh.candidatePairs(spark, users, minJaccard = 0.45).count()
    assert(verified == 0L, s"bulk fleet produced $verified false near-dups")
  }
}
