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

  test("q_stat_kruskal all-ties degenerate case: h_corr and eps2 are NULL, not Inf/NaN") {
    // every value in one bin → tie3 = n³−n → corr_c = 0: the corrected
    // statistic is undefined, and the guard must return NULL (the pearsonR
    // zero-variance convention) instead of dividing by zero
    val dir = java.nio.file.Files.createTempDirectory("kruskal-allties").toString
    Seq(("click", 5.25), ("purchase", 5.5), ("click", 5.75), ("view", 5.0))
      .toDF("event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = SparkEntry.queries("q_stat_kruskal")(spark, dir).collect().head
    assert(row.getLong(0) == 4L && row.getLong(1) == 3L)
    assert(row.getDouble(2) == 0.0, "H is exactly 0 when every rank ties")
    assert(row.isNullAt(3), "h_corr must be NULL when corr_c = 0")
    assert(row.isNullAt(4), "eps2 must be NULL when corr_c = 0")
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

  test("q_stat_mwu equals a driver rank-sum recomputation; AUC consistent with U") {
    val got = SparkEntry.queries("q_stat_mwu")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().toList
    assert(got.size == 1)
    val (n1g, n2g, u1, z, auc) = got.head

    val c1 = binned.filter(_._2 == "click").map(r => r._1 -> r._3).toMap
    val c2 = binned.filter(_._2 == "purchase").map(r => r._1 -> r._3).toMap
    val bins = (c1.keySet ++ c2.keySet).toList.sorted
    var cum = 0L
    var rr1 = BigInt(0); var tie3 = BigInt(0)
    bins.foreach { b =>
      val t = c1.getOrElse(b, 0L) + c2.getOrElse(b, 0L)
      val r2 = 2L * cum + t + 1L; cum += t
      rr1 += BigInt(c1.getOrElse(b, 0L)) * r2
      tie3 += BigInt(t) * t * t - t
    }
    val n1 = c1.values.sum; val n2 = c2.values.sum
    val u2x = rr1 - BigInt(n1) * (n1 + 1) // = 2·U1
    assert(n1g == n1 && n2g == n2)
    assert(u1 == u2x.toDouble / 2.0)
    val n = n1 + n2
    val sigma2 = (n1 * n2).toDouble / 12.0 *
      ((n + 1).toDouble - tie3.toDouble / (n.toDouble * (n - 1).toDouble))
    assert(z == rnd(((u2x - BigInt(n1) * n2).toDouble / 2.0) / math.sqrt(sigma2), 4))
    assert(auc == rnd(u2x.toDouble / (2.0 * (n1.toDouble * n2)), 6))
    assert(auc >= 0.0 && auc <= 1.0)
    // identity the three keys share one substrate for: k=2 Kruskal H ≈ z²
    // (exactly equal with the same tie correction; both are round-pinned,
    // so compare loosely at their published precision)
    assert(u1 >= 0.0 && u1 <= (n1.toDouble * n2))
  }

  test("MWU doubled-rank form: disjoint samples hit U = n1·n2 and AUC = 1") {
    def mwu(c1: Map[Long, Long], c2: Map[Long, Long]): (Double, Double) = {
      val bins = (c1.keySet ++ c2.keySet).toList.sorted
      var cum = 0L; var rr1 = BigInt(0)
      bins.foreach { b =>
        val t = c1.getOrElse(b, 0L) + c2.getOrElse(b, 0L)
        val r2 = 2L * cum + t + 1L; cum += t
        rr1 += BigInt(c1.getOrElse(b, 0L)) * r2
      }
      val n1 = c1.values.sum; val n2 = c2.values.sum
      val u2x = rr1 - BigInt(n1) * (n1 + 1)
      (u2x.toDouble / 2.0, u2x.toDouble / (2.0 * n1 * n2))
    }
    // click entirely ABOVE purchase → U1 = n1·n2, AUC = 1
    val (uHi, aucHi) = mwu(Map(10L -> 3L, 11L -> 2L), Map(1L -> 4L))
    assert(uHi == 20.0 && aucHi == 1.0)
    // identical distributions → U1 = n1·n2/2, AUC = 0.5
    val same = Map(1L -> 2L, 5L -> 2L)
    val (uMid, aucMid) = mwu(same, same)
    assert(uMid == 8.0 && aucMid == 0.5)
  }

  test("q_stat_moments equals a driver raw-moment recomputation; shape signs are sane") {
    val got = SparkEntry.queries("q_stat_moments")(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect().toList
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    val vals = Tables(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    def decS(x: Double, s: Int) =
      new java.math.BigDecimal(x).setScale(s, java.math.RoundingMode.HALF_UP)
    got.foreach { case (tp, n, mean, stddev, skew, kurt) =>
      val xs = vals.filter(_._1 == tp).map(_._2)
      assert(n == xs.length.toLong)
      val s1 = xs.map(decS(_, 6)).reduce(_ add _).doubleValue
      val s2 = xs.map(x => decS(x * x, 6)).reduce(_ add _).doubleValue
      val s3 = xs.map(x => decS(x * x * x, 6)).reduce(_ add _).doubleValue
      val s4 = xs.map(x => decS(x * x * x * x, 6)).reduce(_ add _).doubleValue
      val m = s1 / n
      val m2 = s2 / n - m * m
      val m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
      val m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) -
        3.0 * m * m * m * m
      assert(mean == rnd(m, 4) && stddev == rnd(math.sqrt(m2), 4))
      assert(skew == rnd(m3 / (m2 * math.sqrt(m2)), 6), s"$tp skew")
      assert(kurt == rnd(m4 / (m2 * m2) - 3.0, 6), s"$tp kurt")
      assert(stddev > 0.0)
      // the fixture values are bounded on [0, ~560]: kurtosis cannot be
      // below the platykurtic floor of -2 (Pearson inequality g2 >= -2)
      assert(kurt >= -2.0)
    }
  }

  test("q_stat_bf equals a driver moments recomputation; equal spreads give F near 0 shift") {
    val got = SparkEntry.queries("q_stat_bf")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(got.size == 1)
    val (k, n, df1, df2, f) = got.head
    val vals = Tables(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val types = vals.map(_._1).distinct.sorted
    assert(k == types.length && df1 == k - 1 && df2 == n - k)
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val m = s.length
      val raw = if (m % 2 == 1) s(m / 2) else (s(m / 2 - 1) + s(m / 2)) / 2.0
      rnd(raw, 6)
    }
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val moments = types.map { tp =>
      val xs = vals.filter(_._1 == tp).map(_._2)
      val med = medOf(xs)
      val zs = xs.map(x => math.abs(x - med))
      val s1 = zs.map(dec6).reduce(_ add _).doubleValue
      val s2 = zs.map(z => dec6(z * z)).reduce(_ add _).doubleValue
      (xs.length.toLong, s1, s2)
    }
    val nAll = moments.map(_._1).sum
    assert(n == nAll)
    val sbPart = moments.map { case (ni, s1, _) => dec6(s1 * s1 / ni) }
      .reduce(_ add _).doubleValue
    val s1All = moments.map(m => dec6(m._2)).reduce(_ add _).doubleValue
    val ssw = moments.map { case (ni, s1, s2) => dec6(s2 - s1 * s1 / ni) }
      .reduce(_ add _).doubleValue
    val ssb = sbPart - s1All * s1All / nAll
    val want = rnd((ssb / (k - 1)) / (ssw / (nAll - k)), 4)
    assert(f == want, s"F: got $f want $want")
    assert(f >= 0.0)

    // the statistic itself, on planted spreads: equal dispersion → F ≈ 0,
    // one wide group → F large (driver formula only, no Spark)
    def bf(groups: Seq[Seq[Double]]): Double = {
      val ms = groups.map { xs =>
        val med = medOf(xs); val zs = xs.map(x => math.abs(x - med))
        (xs.length.toLong, zs.sum, zs.map(z => z * z).sum)
      }
      val kk = groups.length; val nn = ms.map(_._1).sum
      val sb = ms.map { case (ni, s1, _) => s1 * s1 / ni }.sum -
        math.pow(ms.map(_._2).sum, 2) / nn
      val sw = ms.map { case (ni, s1, s2) => s2 - s1 * s1 / ni }.sum
      (sb / (kk - 1)) / (sw / (nn - kk))
    }
    val tight = Seq(10.0, 10.5, 11.0, 10.2, 10.8)
    val wide = Seq(0.0, 20.0, 5.0, 18.0, 2.0)
    assert(bf(Seq(tight, tight.map(_ + 50))) < 1e-20, "equal spreads, shifted centers → F 0")
    assert(bf(Seq(tight, wide)) > 5.0, "one wide group → large F")
  }

  test("q_stat_psi equals a driver recomputation; identical halves give exactly 0") {
    val got = SparkEntry.queries("q_stat_psi")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    val rows = Tables(spark, sf, "events")
      .select($"event_type", expr("unix_millis(ts) div 3600000").as("h"),
        least(floor($"value").cast("long"), lit(999L)).as("bin"))
      .as[(String, Long, Long)].collect()
    val mid = (rows.map(_._2).min + rows.map(_._2).max + 1) / 2
    val byType = rows.groupBy(_._1)
    assert(got.map(_._1) == byType.keys.toList.sorted)
    got.foreach { case (tp, n1g, n2g, nbG, psi) =>
      val rs = byType(tp)
      val bins = rs.map(_._3).distinct.sorted
      val c1 = rs.filter(_._2 < mid).groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val c2 = rs.filter(_._2 >= mid).groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val n1 = c1.values.sum; val n2 = c2.values.sum; val nb = bins.length.toLong
      assert(n1g == n1 && n2g == n2 && nbG == nb)
      val terms = bins.map { b =>
        val p1 = (c1.getOrElse(b, 0L) + 1).toDouble / (n1 + nb)
        val p2 = (c2.getOrElse(b, 0L) + 1).toDouble / (n2 + nb)
        val t = (p1 - p2) * rnd(math.log(p1 / p2), 6)
        new java.math.BigDecimal(t).setScale(12, java.math.RoundingMode.HALF_UP)
      }
      val want = rnd(terms.reduce(_ add _).doubleValue, 6)
      assert(psi == want, s"$tp: got $psi want $want")
      // each true term is >= 0; the round(6)-pinned ln can dip a term by
      // at most ~5e-7·p, so anything below -1e-6 is a real sign error
      assert(psi >= -1e-6, s"$tp: smoothed PSI must be (near-)nonnegative")
    }
    // the statistic itself: identical halves → exactly 0; a mass shift → large
    def psiOf(h1: Map[Long, Long], h2: Map[Long, Long]): Double = {
      val bins = (h1.keySet ++ h2.keySet).toList.sorted
      val n1 = h1.values.sum; val n2 = h2.values.sum; val nb = bins.length
      bins.map { b =>
        val p1 = (h1.getOrElse(b, 0L) + 1).toDouble / (n1 + nb)
        val p2 = (h2.getOrElse(b, 0L) + 1).toDouble / (n2 + nb)
        (p1 - p2) * math.log(p1 / p2)
      }.sum
    }
    val same = Map(1L -> 50L, 2L -> 30L, 3L -> 20L)
    assert(psiOf(same, same) == 0.0)
    assert(psiOf(same, Map(8L -> 50L, 9L -> 50L)) > 1.0)
  }

  test("q_stat_spearman equals a driver midrank recomputation over the hourly grid") {
    val got = SparkEntry.queries("q_stat_spearman")(spark, sf)
      .as[(String, String, Long, Option[Double])].collect().toList
    val counts = Tables(spark, sf, "events")
      .select($"event_type", (expr("unix_millis(ts) div 3600000") * 3600000L).as("h"))
      .groupBy($"event_type", $"h").count().as[(String, Long, Long)].collect()
    val types = counts.map(_._1).distinct.sorted
    assert(got.map(p => (p._1, p._2)) ==
      (for (a <- types; b <- types if a < b) yield (a, b)).toList.sorted)
    val hours = {
      val hs = counts.map(_._2); (hs.min to hs.max by 3600000L).toVector
    }
    // per-type doubled midranks over the gap-filled series
    val ranks: Map[String, Vector[Long]] = types.map { tp =>
      val byH = counts.filter(_._1 == tp).map(r => r._2 -> r._3).toMap
      val series = hours.map(h => byH.getOrElse(h, 0L))
      val sorted = series.sorted
      val less = series.map(v => sorted.indexWhere(_ == v).toLong) // countLess
      val ties = series.map(v => sorted.count(_ == v).toLong)
      tp -> series.indices.map(i => 2L * less(i) + ties(i) + 1L).toVector
    }.toMap
    got.foreach { case (t1, t2, nHours, rho) =>
      assert(nHours == hours.length.toLong)
      val rx = ranks(t1); val ry = ranks(t2)
      val n = BigInt(hours.length)
      val sx = rx.map(BigInt(_)).sum; val sy = ry.map(BigInt(_)).sum
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = rx.map(a => BigInt(a) * a).sum
      val syy = ry.map(a => BigInt(a) * a).sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      val expected =
        if (d1 > 0 && d2 > 0)
          Some(rnd(num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)), 4))
        else None
      assert(rho == expected, s"($t1,$t2): got $rho want $expected")
      rho.foreach(r => assert(r >= -1.0 && r <= 1.0))
    }
  }

  test("Spearman midrank form: monotone series give rho = 1, reversed give -1") {
    def rho(xs: Vector[Long], ys: Vector[Long]): Double = {
      def rk(s: Vector[Long]): Vector[Long] = {
        val sorted = s.sorted
        s.map(v => 2L * sorted.indexWhere(_ == v) + sorted.count(_ == v) + 1L)
      }
      val rx = rk(xs); val ry = rk(ys); val n = BigInt(xs.length)
      val sx = rx.map(BigInt(_)).sum; val sy = ry.map(BigInt(_)).sum
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = rx.map(a => BigInt(a) * a).sum
      val syy = ry.map(a => BigInt(a) * a).sum
      (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
         math.sqrt((n * syy - sy * sy).toDouble))
    }
    val up = Vector(1L, 5L, 9L, 20L)
    assert(math.abs(rho(up, up.map(_ * 3 + 7)) - 1.0) < 1e-12)
    assert(math.abs(rho(up, up.reverse.map(_ * 2)) + 1.0) < 1e-12)
  }

  test("q_stat_anova equals a driver moments recomputation; planted shift raises F") {
    val got = SparkEntry.queries("q_stat_anova")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toList
    assert(got.size == 1)
    val (k, n, df1, df2, f, eta2) = got.head
    val vals = Tables(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val types = vals.map(_._1).distinct.sorted
    assert(k == types.length && df1 == k - 1 && df2 == n - k)
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val moments = types.map { tp =>
      val xs = vals.filter(_._1 == tp).map(_._2)
      val s1 = xs.map(dec6).reduce(_ add _).doubleValue
      val s2 = xs.map(x => dec6(x * x)).reduce(_ add _).doubleValue
      (xs.length.toLong, s1, s2)
    }
    val nAll = moments.map(_._1).sum
    assert(n == nAll)
    val sbPart = moments.map { case (ni, s1, _) => dec6(s1 * s1 / ni) }
      .reduce(_ add _).doubleValue
    val s1All = moments.map(m => dec6(m._2)).reduce(_ add _).doubleValue
    val ssw = moments.map { case (ni, s1, s2) => dec6(s2 - s1 * s1 / ni) }
      .reduce(_ add _).doubleValue
    val ssb = sbPart - s1All * s1All / nAll
    assert(f == rnd((ssb / (k - 1)) / (ssw / (nAll - k)), 4), s"F mismatch: $f")
    assert(eta2 == rnd(ssb / (ssb + ssw), 4), s"eta2 mismatch: $eta2")
    assert(f >= 0.0 && eta2 >= 0.0 && eta2 <= 1.0)
    // the statistic itself on planted means (driver formula only)
    def anova(groups: Seq[Seq[Double]]): Double = {
      val ms = groups.map(xs => (xs.length.toLong, xs.sum, xs.map(x => x * x).sum))
      val kk = groups.length; val nn = ms.map(_._1).sum
      val sb = ms.map { case (ni, s1, _) => s1 * s1 / ni }.sum -
        math.pow(ms.map(_._2).sum, 2) / nn
      val sw = ms.map { case (ni, s1, s2) => s2 - s1 * s1 / ni }.sum
      (sb / (kk - 1)) / (sw / (nn - kk))
    }
    val g = Seq(10.0, 10.5, 11.0, 10.2, 10.8)
    assert(anova(Seq(g, g)) < 1e-10, "identical groups → F 0")
    assert(anova(Seq(g, g.map(_ + 50))) > 1000.0, "shifted means → large F")
  }

  test("q_stat_ols equals a BigInt driver recomputation; a planted line is recovered exactly") {
    val got = SparkEntry.queries("q_stat_ols")(spark, sf)
      .as[(String, Long, Double, Double, Option[Double])].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    val counts = Tables(spark, sf, "events")
      .selectExpr("unix_millis(ts) div 3600000 as h", "event_type")
      .groupBy($"h", $"event_type").count()
      .as[(Long, String, Long)].collect()
    val lo = counts.map(_._1).min; val hi = counts.map(_._1).max
    val types = counts.map(_._2).distinct.sorted
    def fit(xs: Seq[Long], ys: Seq[Long]): (Double, Double, Option[Double]) = {
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum
      val syy = ys.map(a => BigInt(a) * a).sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx; val d2 = n * syy - sy * sy
      val slope = rnd(num.toDouble / d1.toDouble, 6)
      val ic = rnd((sy * sxx - sx * sxy).toDouble / d1.toDouble, 4)
      val r = if (d1 > 0 && d2 > 0)
        Some(rnd(num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)), 4))
      else None
      (slope, ic, r)
    }
    types.zip(got).foreach { case (tp, (gt, nh, slope, ic, r)) =>
      assert(gt == tp)
      assert(nh == hi - lo + 1)
      val byHour = counts.filter(_._2 == tp).map(c => c._1 -> c._3).toMap
      val xs = (lo to hi).map(_ - lo)
      val ys = (lo to hi).map(h => byHour.getOrElse(h, 0L))
      val (wSlope, wIc, wR) = fit(xs, ys)
      assert(slope == wSlope && ic == wIc && r == wR,
        s"$tp: got ($slope, $ic, $r) want ($wSlope, $wIc, $wR)")
    }
    // a planted exact line y = 3x + 7 is recovered with r = 1
    val xs = (0L to 99L).toSeq
    val (s3, i7, r1) = fit(xs, xs.map(_ * 3 + 7))
    assert(s3 == 3.0 && i7 == 7.0 && r1.contains(1.0))
  }

  test("q_text_jsd equals a driver recomputation; bounded by ln 2, self-divergence is 0") {
    val got = SparkEntry.queries("q_text_jsd")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    val docs = Tables(spark, sf, "documents")
      .selectExpr("source", "n_chars div 50 as b")
      .as[(String, Long)].collect()
    val globCnt = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bins = globCnt.keySet.toList.sorted
    val nb = bins.length.toLong
    val ng = docs.length.toLong
    def dec12(x: Double) =
      new java.math.BigDecimal(x).setScale(12, java.math.RoundingMode.HALF_UP)
    got.foreach { case (src, nDocs, nBins, jsd) =>
      val mine = docs.filter(_._1 == src)
      assert(nDocs == mine.length.toLong && nBins == nb)
      val srcCnt = mine.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val terms = bins.map { b =>
        val p = (srcCnt.getOrElse(b, 0L) + 1).toDouble / (nDocs + nb)
        val q = (globCnt(b) + 1).toDouble / (ng + nb)
        val m = (p + q) / 2.0
        0.5 * p * rnd(math.log(p / m), 6) + 0.5 * q * rnd(math.log(q / m), 6)
      }
      val want = rnd(terms.map(dec12).reduce(_ add _).doubleValue, 6)
      assert(jsd == want, s"$src: got $jsd want $want")
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-6)
    }
    // a source whose distribution IS the corpus mix scores (near) zero:
    // p and q differ only by the smoothing denominators' scale
    val p = Seq(0.5, 0.3, 0.2)
    val selfTerms = p.map(pi => 0.5 * pi * math.log(pi / pi) * 2).sum
    assert(math.abs(selfTerms) < 1e-15)
  }

  test("q_text_zipf equals a driver log-log OLS; a planted power law recovers its exponent") {
    val got = SparkEntry.queries("q_text_zipf")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().toList
    assert(got.size == 1)
    val (nTerms, slope, intercept, r) = got.head
    def dec12(x: Double) =
      new java.math.BigDecimal(x).setScale(12, java.math.RoundingMode.HALF_UP)
    def fitLogLog(ranked: Seq[(Long, Long)]): (Long, Double, Double, Double) = {
      val pts = ranked.map { case (rk, f) =>
        (rnd(math.log(rk.toDouble), 6), rnd(math.log(f.toDouble), 6))
      }
      val n = pts.length.toLong
      def dsum(xs: Seq[Double]) = xs.map(dec12).reduce(_ add _).doubleValue
      val sx = dsum(pts.map(_._1)); val sy = dsum(pts.map(_._2))
      val sxy = dsum(pts.map(p => p._1 * p._2))
      val sxx = dsum(pts.map(p => p._1 * p._1))
      val syy = dsum(pts.map(p => p._2 * p._2))
      (n, rnd((n * sxy - sx * sy) / (n * sxx - sx * sx), 4),
        rnd((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 4),
        rnd((n * sxy - sx * sy) /
          (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)), 4))
    }
    val freq = Tables(spark, sf, "documents")
      .selectExpr("explode(split(text, ' ')) AS term")
      .groupBy($"term").count().as[(String, Long)].collect().toList
    val ranked = freq.sortBy { case (t, f) => (-f, t) }.take(100)
      .zipWithIndex.map { case ((_, f), i) => ((i + 1).toLong, f) }
    val (wn, ws, wi, wr) = fitLogLog(ranked)
    assert(nTerms == wn && slope == ws && intercept == wi && r == wr,
      s"got ($nTerms, $slope, $intercept, $r) want ($wn, $ws, $wi, $wr)")
    // a planted exact power law f = 1e6 / rank recovers slope −1, r −1
    val planted = (1L to 50L).map(rk => rk -> (1000000L / rk))
    val (_, ps, _, pr) = fitLogLog(planted)
    assert(math.abs(ps + 1.0) < 0.01, s"planted slope $ps")
    assert(pr <= -0.999, s"planted r $pr")
  }

  test("q_stat_km equals a driver Kaplan-Meier; curve monotone, risk sets conserve") {
    val got = SparkEntry.queries("q_stat_km")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    val evs = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type", "value", "unix_micros(ts) AS ts_us")
      .as[(Long, String, Double, Long)].collect().toList
    val day = 86400000000L
    // per-user (duration, event?) through the declared target definition
    val per = evs.groupBy(_._1).values.map { rs =>
      val t0 = rs.map(_._4).min
      val tp = rs.filter(r => r._2 == "purchase" && r._3 >= 150.0)
        .map(_._4).sorted.headOption
      tp match {
        case Some(t) => ((t - t0) / day, 1)
        case None    => ((rs.map(_._4).max - t0) / day, 0)
      }
    }.toList
    // both branches must actually run (the target is sized for this)
    assert(per.exists(_._2 == 1) && per.exists(_._2 == 0))
    var risk = per.size.toLong
    var surv = 1.0
    val expRows = per.groupBy(_._1).toList.sortBy(_._1).flatMap {
      case (d, rs) =>
        val dEv = rs.count(_._2 == 1).toLong
        val dCn = rs.size - dEv
        val row =
          if (dEv > 0) {
            surv *= (1.0 - dEv.toDouble / risk)
            Some((d, risk, dEv, dCn, surv))
          } else None
        risk -= rs.size
        row
    }
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      expRows.map(r => (r._1, r._2, r._3, r._4)))
    got.zip(expRows).foreach { case ((_, _, _, _, s), (_, _, _, _, es)) =>
      assert(math.abs(s - es) < 1e-4)
    }
    // survival is non-increasing in [0, 1]
    got.map(_._5).sliding(2).foreach {
      case List(a, b) => assert(b <= a + 1e-9)
      case _ => ()
    }
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("q_stat_logrank equals a driver hypergeometric recount; null split reads small") {
    val Seq((n1, n0, o1, e1, chi2)) =
      SparkEntry.queries("q_stat_logrank")(spark, sf)
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(n1 > 0 && n0 > 0, "md5 cohort must be non-empty on both sides")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val evs = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type", "value", "unix_micros(ts) AS ts_us")
      .as[(Long, String, Double, Long)].collect().toList
    val day = 86400000000L
    val per = evs.groupBy(_._1).map { case (u, rs) =>
      val t0 = rs.map(_._4).min
      val tp = rs.filter(r => r._2 == "purchase" && r._3 >= 150.0)
        .map(_._4).sorted.headOption
      val grp = if (md5hex(u.toString).charAt(0) < '8') 1 else 0
      tp match {
        case Some(t) => ((t - t0) / day, 1, grp)
        case None    => ((rs.map(_._4).max - t0) / day, 0, grp)
      }
    }.toList
    assert(n1 == per.count(_._3 == 1).toLong && n0 == per.count(_._3 == 0).toLong)
    var n = per.size.toLong; var nn1 = per.count(_._3 == 1).toLong
    var eo1 = 0L; var ee1 = 0.0; var vv = 0.0
    def rnd6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    per.groupBy(_._1).toList.sortBy(_._1).foreach { case (_, rs) =>
      val dAll = rs.count(_._2 == 1).toLong
      if (dAll > 0) {
        eo1 += rs.count(r => r._2 == 1 && r._3 == 1)
        ee1 += rnd6(dAll.toDouble * nn1 / n)
        if (n > 1)
          vv += rnd6(dAll.toDouble * nn1 / n * (n - nn1) / n *
            (n - dAll) / (n - 1))
      }
      n -= rs.size; nn1 -= rs.count(_._3 == 1)
    }
    assert(o1 == eo1)
    assert(math.abs(e1 - ee1) < 1e-3, s"E1 $e1 vs $ee1")
    val expChi = (eo1 - ee1) * (eo1 - ee1) / vv
    assert(math.abs(chi2 - expChi) < 1e-3, s"chi2 $chi2 vs $expChi")
    // an md5 cohort is a NULL split: the statistic should not scream
    assert(chi2 < 15.0, s"null-split chi2 $chi2 implausibly large")
  }

  test("q_stat_gini equals a driver Lorenz recomputation; bounds and degenerate case hold") {
    val got = SparkEntry.queries("q_stat_gini")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toList
    assert(got.nonEmpty)
    // spend in integer 1e-4 units exactly as the key: per-row HALF_UP cast
    // to scale 4, exact sum, lossless long
    val spend = Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)]
      .collect().toList.groupBy(_._1).map { case (ck, rows) =>
        ck -> rows.map(r => new java.math.BigDecimal(r._2)
          .setScale(4, java.math.RoundingMode.HALF_UP))
          .reduce(_ add _).movePointRight(4).longValueExact()
      }
    val seg = Tables(spark, sf, "customer")
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect().toMap
    val bySeg = spend.toList.map { case (ck, sp) => (seg(ck), ck, sp) }
      .groupBy(_._1)
    got.foreach { case (mkt, nCust, total, gini) =>
      val rows = bySeg(mkt).sortBy(r => (r._3, r._2))
      val n = rows.size.toLong
      assert(nCust == n, mkt)
      val st = rows.map(r => BigInt(r._3)).sum
      val wt = rows.zipWithIndex.map { case (r, i) => BigInt(i + 1) * r._3 }.sum
      assert(total == rnd(st.toDouble / 10000.0, 2), mkt)
      val want = rnd(2.0 * wt.toDouble / (n * st.toDouble)
        - (n + 1).toDouble / n, 6)
      assert(gini == want, s"$mkt: got $gini want $want")
      assert(gini >= 0.0 && gini < 1.0, mkt)
    }
    // the statistic itself: equal spends → 0; one-customer-takes-all → (n−1)/n
    def giniOf(xs: List[Long]): Double = {
      val s = xs.sorted; val n = s.size; val tot = s.map(BigInt(_)).sum
      val w = s.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      2.0 * w.toDouble / (n * tot.toDouble) - (n + 1).toDouble / n
    }
    assert(math.abs(giniOf(List.fill(10)(7L))) < 1e-12)
    assert(math.abs(giniOf(0L :: 0L :: 0L :: List(100L)) - 0.75) < 1e-12)
  }

  test("q_stat_qq equals a driver interpolated-quantile recomputation") {
    val got = SparkEntry.queries("q_stat_qq")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3))).toList
    assert(got.map(_._1) == (1 to 9).map(_ / 10.0).toList)
    val byType = Tables(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("click", "purchase"))
      .select($"event_type", $"value").as[(String, Double)]
      .collect().toList.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // the quantile_cont contract both engines implement: position q·(n−1),
    // linear interpolation lower + frac·(upper − lower)
    def qc(xs: List[Double], q: Double): Double = {
      val pos = q * (xs.size - 1)
      val lo = pos.toInt
      if (lo + 1 < xs.size) xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
      else xs(lo)
    }
    got.foreach { case (q, vc, vp, gap) =>
      assert(vc == rnd(qc(byType("click"), q), 4), s"q=$q click")
      assert(vp == rnd(qc(byType("purchase"), q), 4), s"q=$q purchase")
      assert(gap == rnd(qc(byType("purchase"), q) - qc(byType("click"), q), 4),
        s"q=$q gap")
    }
    // quantiles are monotone in q within each cohort
    got.sliding(2).foreach {
      case List(a, b) => assert(b._2 >= a._2 && b._3 >= a._3)
      case _ => ()
    }
  }

  test("q_stat_effect equals a driver recomputation; correction and sign laws hold") {
    val got = SparkEntry.queries("q_stat_effect")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got.nonEmpty)
    val rows = Tables(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect().toList
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def dec6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    def stats(xs: List[Double]): (Long, Double, Double) = {
      val n = xs.size.toLong
      val s1 = xs.map(dec6).reduce(_ add _).doubleValue
      val s2 = xs.map(x => dec6(x * x)).reduce(_ add _).doubleValue
      val m = s1 / n
      (n, m, (s2 - s1 * s1 / n) / (n - 1))
    }
    got.foreach { case (t1, t2, d, g, gd) =>
      val (n1, m1, v1) = stats(rows(t1)); val (n2, m2, v2) = stats(rows(t2))
      val sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
      val dWant = (m1 - m2) / sp
      assert(d == rnd(dWant, 4), s"$t1/$t2 d")
      assert(g == rnd(dWant * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 4), s"$t1/$t2 g")
      assert(gd == rnd((m1 - m2) / math.sqrt(v1), 4), s"$t1/$t2 glass")
      // Hedges' correction strictly shrinks magnitude; signs agree
      assert(math.abs(g) <= math.abs(d) && d * g >= 0.0, s"$t1/$t2 law")
    }
    // the statistic itself: {0,0,2,2} vs {1,1,3,3} -> d = -1/sqrt(4/3)
    val a = List(0.0, 0.0, 2.0, 2.0); val b = List(1.0, 1.0, 3.0, 3.0)
    val (_, ma, va) = stats(a); val (_, mb, vb) = stats(b)
    val dd = (ma - mb) / math.sqrt((3 * va + 3 * vb) / 6)
    assert(math.abs(dd - (-1.0 / math.sqrt(4.0 / 3.0))) < 1e-12)
  }

  test("q_stat_friedman equals a driver midrank recomputation; consistency maximum holds") {
    val Array(row) = SparkEntry.queries("q_stat_friedman")(spark, sf).collect()
    val (b, k, chi2) = (row.getLong(0), row.getLong(1),
      if (row.isNullAt(2)) None else Some(row.getDouble(2)))
    assert(b == 24L)
    val counts = Tables(spark, sf, "events")
      .selectExpr("event_type", "CAST(hour(ts) AS INT) AS h")
      .as[(String, Int)].collect().toList
    val types = counts.map(_._1).distinct.sorted
    assert(k == types.size.toLong)
    val cell = counts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // doubled midranks within each hour block, the statistic from exact ints
    def friedman(blocks: List[List[Long]]): Option[Double] = {
      val kk = blocks.head.size
      val bb = blocks.size
      val rx = blocks.map { vs =>
        vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1L)
      }
      val rj = (0 until kk).map(j => rx.map(_(j)).sum)
      val a2 = rx.flatten.map(r => r * r).sum
      val sdev = rj.map(r => { val d = r - bb * (kk + 1); d * d }).sum
      val den = a2 - bb.toLong * kk * (kk + 1) * (kk + 1)
      if (den > 0) Some(rnd((kk - 1).toDouble * sdev / den, 4)) else None
    }
    val blocks = (0 until 24).toList.map { h =>
      types.map(t => cell.getOrElse((t, h), 0L))
    }
    assert(chi2 == friedman(blocks), s"got $chi2 want ${friedman(blocks)}")
    // the statistic itself: perfectly consistent rankings reach the
    // maximum b·(k−1); fully tied blocks are undefined (NULL)
    val consistent = List.fill(24)(List(1L, 2L, 3L))
    assert(friedman(consistent) == Some(48.0))
    assert(friedman(List.fill(24)(List(5L, 5L, 5L))).isEmpty)
  }

  test("q_stat_wilcoxon equals a driver midrank recomputation; direction law holds") {
    val Array(row) = SparkEntry.queries("q_stat_wilcoxon")(spark, sf).collect()
    val got = (row.getLong(0), row.getLong(1), row.getDouble(2),
      if (row.isNullAt(3)) None else Some(row.getDouble(3)))
    val byH = Tables(spark, sf, "events")
      .filter($"event_type".isin("click", "purchase"))
      .selectExpr("unix_micros(ts) div 3600000000 AS hb", "event_type")
      .as[(Long, String)].collect().toList.groupBy(_._1)
    def wilcoxon(ds: List[Long]): (Long, Long, Double, Option[Double]) = {
      val nz = ds.filter(_ != 0L)
      val n = nz.size.toLong
      val ads = nz.map(math.abs)
      val rx = nz.map { d =>
        val ad = math.abs(d)
        2L * ads.count(_ < ad) + ads.count(_ == ad) + 1L
      }
      val w2 = nz.zip(rx).collect { case (d, r) if d > 0 => r }.sum
      val nPos = nz.count(_ > 0).toLong
      val tt = ads.groupBy(identity).values.map(g => {
        val t = g.size.toLong; t * t * t - t }).sum
      val den = 2 * n * (n + 1) * (2 * n + 1) - tt
      (n, nPos, w2 / 2.0,
        if (den > 0) Some(rnd((2 * w2 - n * (n + 1)).toDouble /
          math.sqrt(den.toDouble / 3.0), 4)) else None)
    }
    val ds = byH.values.map { es =>
      es.count(_._2 == "purchase").toLong - es.count(_._2 == "click").toLong
    }.toList
    assert(got == wilcoxon(ds), s"got $got want ${wilcoxon(ds)}")
    // the statistic itself: all-positive differences push z to the maximum
    // (every rank credited to W+), symmetric differences read z = 0
    val allPos = wilcoxon(List(1L, 2L, 3L, 4L, 5L))._4.get
    val sym = wilcoxon(List(-2L, 2L, -3L, 3L))._4.get
    assert(allPos > 2.0 && sym == 0.0, s"$allPos / $sym")
  }
}
