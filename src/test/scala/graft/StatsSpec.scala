package graft

import org.apache.spark.sql.functions._

/** Independent driver-side recomputation of the nonparametric test keys
  * (q_stat_ks / q_stat_kruskal) — the TimeseriesSpec discipline: the spec
  * rebuilds each statistic from the raw parquet with its own arithmetic
  * (BigInt cumulative scans, midranks from first principles) and requires
  * exact equality, plus planted-distribution sanity checks of the
  * statistics themselves. */
class StatsSpec extends BaseSpec {
  import spark.implicits._

  private def rnd(x: Double, s: Int): Double =
    new java.math.BigDecimal(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue

  private lazy val binned: List[(Long, String, Long)] =
    Tables(spark, sf, "events")
      .select(least(floor($"value").cast("long"), lit(999L)).as("bin"), $"event_type")
      .groupBy($"bin", $"event_type").count()
      .as[(Long, String, Long)].collect().toList

  test("q_stat_ks equals a BigInt-exact driver ECDF scan") {
    val got = SparkEntry.queries("q_stat_ks")(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toList
    assert(got.size == 1)
    val (n1g, n2g, ksD, atBin) = got.head

    val c1 = binned.filter(_._2 == "click").map(r => r._1 -> r._3).toMap
    val c2 = binned.filter(_._2 == "purchase").map(r => r._1 -> r._3).toMap
    val bins = (c1.keySet ++ c2.keySet).toList.sorted
    val n1 = BigInt(c1.values.sum)
    val n2 = BigInt(c2.values.sum)
    var a1 = BigInt(0); var a2 = BigInt(0)
    val scan = bins.map { b =>
      a1 = a1 + BigInt(c1.getOrElse(b, 0L)); a2 = a2 + BigInt(c2.getOrElse(b, 0L))
      ((a1 * n2 - a2 * n1).abs, b)
    }
    val best = scan.minBy { case (d, b) => (-d, b) } // max d, smallest bin
    assert(n1g == n1.toLong && n2g == n2.toLong)
    assert(atBin == best._2, s"argmax bin: got $atBin want ${best._2}")
    assert(ksD == rnd(best._1.toDouble / (n1 * n2).toDouble, 6))
    assert(ksD >= 0.0 && ksD <= 1.0)
  }

  test("KS scaled-integer form: identical samples give 0, disjoint give 1") {
    // the statistic's own sanity, on planted per-bin counts
    def ks(c1: Map[Long, Long], c2: Map[Long, Long]): Double = {
      val bins = (c1.keySet ++ c2.keySet).toList.sorted
      val n1 = BigInt(c1.values.sum); val n2 = BigInt(c2.values.sum)
      var a1 = BigInt(0); var a2 = BigInt(0)
      val ds = bins.map { b =>
        a1 = a1 + BigInt(c1.getOrElse(b, 0L)); a2 = a2 + BigInt(c2.getOrElse(b, 0L))
        (a1 * n2 - a2 * n1).abs
      }
      ds.max.toDouble / (n1 * n2).toDouble
    }
    val same = Map(1L -> 5L, 4L -> 3L, 9L -> 2L)
    assert(ks(same, same) == 0.0)
    assert(ks(Map(1L -> 7L, 2L -> 3L), Map(50L -> 4L)) == 1.0)
  }

  test("q_stat_kruskal equals a driver midrank recomputation; planted shift raises H") {
    val got = SparkEntry.queries("q_stat_kruskal")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().toList
    assert(got.size == 1)
    val (n, k, h, hCorr, eps2) = got.head

    val types = binned.map(_._2).distinct.sorted
    val binTot = binned.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val bins = binTot.keys.toList.sorted
    // doubled midrank per bin: 2*(cumBefore) + t + 1
    var cum = 0L
    val r2 = bins.map { b =>
      val t = binTot(b); val r = 2L * cum + t + 1L; cum += t; b -> r
    }.toMap
    val perType = types.map { tp =>
      val rows = binned.filter(_._2 == tp)
      val ni = rows.map(_._3).sum
      val rr2 = rows.map(r => BigInt(r._3) * r2(r._1)).sum
      (ni, rr2)
    }
    val bigN = perType.map(_._1).sum
    // identical-double H terms summed exactly (the key's DECIMAL route)
    val sr = perType.map { case (ni, rr2) =>
      val term = (rr2.toDouble / 2.0) * (rr2.toDouble / 2.0) / ni
      new java.math.BigDecimal(term).setScale(6, java.math.RoundingMode.HALF_UP)
    }.reduce(_ add _).doubleValue
    val hExp = 12.0 / (bigN * (bigN + 1L)) * sr - 3.0 * (bigN + 1L)
    val tie3 = bins.map { b => val t = BigInt(binTot(b)); t * t * t - t }.sum
    val c = 1.0 - tie3.toDouble / (BigInt(bigN) * bigN * bigN - bigN).toDouble
    assert(n == bigN && k == types.length.toLong)
    assert(h == rnd(hExp, 4), s"H: got $h want ${rnd(hExp, 4)}")
    assert(hCorr == rnd(hExp / c, 4))
    assert(eps2 == rnd((hExp / c - k + 1) / (n - k), 6))
    assert(hCorr >= 0.0, "tie-corrected H is nonnegative for these group sizes")

    // planted: one group shifted far right must dominate the H of equal
    // groups — the statistic detects the location difference
    def hOf(groups: List[Map[Long, Long]]): Double = {
      val tot = groups.flatMap(_.toList).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      var c0 = 0L
      val rk = tot.keys.toList.sorted.map { b =>
        val t = tot(b); val r = 2L * c0 + t + 1L; c0 += t; b -> r
      }.toMap
      val pt = groups.map { g =>
        val ni = g.values.sum
        val rr2 = g.map { case (b, cnt) => BigInt(cnt) * rk(b) }.sum
        (rr2.toDouble / 2.0) * (rr2.toDouble / 2.0) / ni
      }
      val nn = groups.map(_.values.sum).sum
      12.0 / (nn * (nn + 1L)) * pt.sum - 3.0 * (nn + 1L)
    }
    val flat = List(Map(1L -> 10L, 2L -> 10L), Map(1L -> 10L, 2L -> 10L))
    val shifted = List(Map(1L -> 10L, 2L -> 10L), Map(100L -> 20L))
    assert(math.abs(hOf(flat)) < 1e-9)
    assert(hOf(shifted) > 10.0)
  }
}
