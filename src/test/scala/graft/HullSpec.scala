package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.HullStats

/** SURVEY §2.10 — convex hull (m_geo_hull): the monotone-chain kernel
  * against hand geometry (squares, triangles, collinear chains, interior-
  * point and duplicate invariance), randomized equality against an
  * independent gift-wrapping (Jarvis march) reference, and the key on the
  * sf0.001 fixture (hull ⊆ bbox, row count, area sanity). */
class HullSpec extends BaseSpec {
  import spark.implicits._

  /** interleaved [lat, lon, ...] from (lat, lon) pairs. */
  private def pts(ps: (Double, Double)*): Array[Double] =
    ps.flatMap(p => Seq(p._1, p._2)).toArray

  private def hull(ps: (Double, Double)*): (Long, Double, Double) = {
    val r = HullStats.compute(ArrayData.toArrayData(pts(ps: _*))).toDoubleArray()
    (r(0).toLong, r(1), r(2))
  }

  test("unit square: 4 vertices, area 1, perimeter 4 — interior and edge points excluded") {
    val corners = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
    val extras = Seq((0.5, 0.5), (0.25, 0.75), (0.0, 0.5), (1.0, 0.5)) // interior + edge-collinear
    assert(hull(corners: _*) == ((4L, 1.0, 4.0)))
    assert(hull(scala.util.Random.shuffle(corners ++ extras): _*) == ((4L, 1.0, 4.0)))
  }

  test("triangle with duplicated vertices: 3 vertices, shoelace area") {
    // (0,0), (0,4), (3,0) in (lat, lon): area = 6, perimeter = 3 + 4 + 5
    val t = Seq((0.0, 0.0), (0.0, 4.0), (3.0, 0.0), (0.0, 0.0), (3.0, 0.0))
    assert(hull(t: _*) == ((3L, 6.0, 12.0)))
  }

  test("collinear chain degenerates to 2 endpoints, zero area") {
    val (n, a, p) = hull((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0))
    assert(n == 2L && a == 0.0)
    assert(math.abs(p - 2.0 * 3.0 * math.sqrt(2.0)) < 1e-12)
  }

  test("single distinct point: n_hull 1, zero area and perimeter") {
    assert(hull((2.0, 3.0), (2.0, 3.0)) == ((1L, 0.0, 0.0)))
  }

  test("interior-point invariance: adding points inside the hull changes nothing") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(40)((rnd.nextInt(100) / 10.0, rnd.nextInt(100) / 10.0))
    val h0 = hull(base: _*)
    // centroid-ward shrunk copies are inside the hull (convexity)
    val cLat = base.map(_._1).sum / base.size
    val cLon = base.map(_._2).sum / base.size
    val inner = base.map { case (la, lo) =>
      (cLat + 0.5 * (la - cLat), cLon + 0.5 * (lo - cLon)) }
    assert(hull(base ++ inner: _*) == h0)
  }

  /** Independent reference: Jarvis march (gift wrapping) — O(n·h), a
    * different algorithm family from the kernel's monotone chain. */
  private def jarvis(ps: Seq[(Double, Double)]): (Long, Double, Double) = {
    val d = ps.map(p => (p._2, p._1)).distinct // (x, y) = (lon, lat)
    if (d.size == 1) return (1L, 0.0, 0.0)
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def d2(a: (Double, Double), b: (Double, Double)) = {
      val dx = b._1 - a._1; val dy = b._2 - a._2; dx * dx + dy * dy
    }
    val start = d.minBy(identity)
    val h = scala.collection.mutable.ArrayBuffer[(Double, Double)](start)
    var cur = start
    var done = false
    while (!done) {
      var cand = d.find(_ != cur).get
      d.foreach { p =>
        if (p != cur) {
          val c = cross(cur, cand, p)
          // pick the most counter-clockwise; on ties (collinear) the farthest,
          // so collinear boundary points are skipped like the kernel does
          if (c < 0 || (c == 0 && d2(cur, p) > d2(cur, cand))) cand = p
        }
      }
      if (cand == start) done = true
      else { h += cand; cur = cand }
    }
    if (h.size == 2)
      return (2L, 0.0, 2.0 * math.sqrt(d2(h(0), h(1))))
    var area2 = 0.0; var perim = 0.0
    for (i <- h.indices) {
      val a = h(i); val b = h((i + 1) % h.size)
      area2 += a._1 * b._2 - b._1 * a._2
      perim += math.sqrt(d2(a, b))
    }
    (h.size.toLong, math.abs(area2) / 2.0, perim)
  }

  test("randomized equality vs the gift-wrapping reference (200 point sets)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      // 0.1°-lattice points like the fixture, duplicates allowed
      val ps = Seq.fill(n)((rnd.nextInt(60) / 10.0, rnd.nextInt(60) / 10.0))
      val got = hull(ps: _*)
      val want = jarvis(ps)
      assert(got._1 == want._1, s"n_hull mismatch on $ps: $got vs $want")
      assert(math.abs(got._2 - want._2) < 1e-9, s"area mismatch on $ps")
      assert(math.abs(got._3 - want._3) < 1e-9, s"perimeter mismatch on $ps")
    }
  }

  test("m_geo_hull key: one row per user, hull inside the user bbox, non-vacuous") {
    val out = SparkEntry.queries("m_geo_hull")(spark, sf).collect()
    assert(out.length == 15)
    out.foreach { r =>
      val nHull = r.getAs[Long]("n_hull")
      val area = r.getAs[Double]("area_deg2")
      assert(nHull >= 1L && nHull <= r.getAs[Long]("n_pts"))
      assert(area >= 0.0 && area <= 360.0 * 170.0, s"area out of world bounds: $r")
    }
    assert(out.count(_.getAs[Long]("n_hull") >= 3L) > 0, "no user produced a 2-D hull")
    // cross-check one user against the reference on the raw fixture points
    // (the derived-coordinate formula, same as the ptsCte both engines use)
    val u = graft.Tables(spark, sf, "events").filter($"user_id" === 1L)
      .selectExpr(
        "CAST(((event_id * 37) % 1700) / 10.0 - 85.0 AS DOUBLE) AS lat",
        "CAST(((event_id * 131) % 3600) / 10.0 - 180.0 AS DOUBLE) AS lon")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val want = jarvis(u)
    val got = out.find(_.getAs[Long]("user_id") == 1L).get
    assert(got.getAs[Long]("n_hull") == want._1)
    assert(math.abs(got.getAs[Double]("area_deg2") - (math.rint(want._2 * 1e4) / 1e4)) <= 1e-4)
  }
}
