package graft

import org.apache.spark.sql.functions._

/** Independent driver-side recomputation of the time-series diagnostic
  * keys (q_time_acf / q_time_ewma / q_time_cusum) — the SsspSpec
  * discipline: the spec rebuilds the hourly grid from the raw parquet
  * with its own arithmetic (BigInt power sums, Scala sort + scan) and
  * requires exact equality with the declared keys, so a regression in
  * either the substrate or the statistics shows up as a value diff, not
  * just an oracle hash drift at the next round. */
class TimeseriesSpec extends BaseSpec {
  import spark.implicits._

  private def rnd4(x: Double): Double =
    new java.math.BigDecimal(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  /** Gap-filled hourly counts recomputed independently of Reshape.resampled. */
  private lazy val grid: Vector[(Long, Long)] = {
    val counts = Tables(spark, sf, "events")
      .select((expr("unix_millis(ts) div 3600000") * 3600000L).as("h"))
      .groupBy($"h").count().as[(Long, Long)].collect().toMap
    val lo = counts.keys.min
    val hi = counts.keys.max
    (lo to hi by 3600000L).map(h => h -> counts.getOrElse(h, 0L)).toVector
  }

  test("q_time_acf equals a BigInt-exact driver recomputation; pair counts track grid length") {
    val got = SparkEntry.queries("q_time_acf")(spark, sf)
      .as[(Int, Long, Option[Double])].collect().toList.sortBy(_._1)
    assert(got.map(_._1) == List(1, 2, 3))
    val xs = grid.map(_._2)
    got.foreach { case (lag, nPairs, acf) =>
      assert(nPairs == xs.length - lag,
        s"lag $lag: expected ${xs.length - lag} pairs over the gap-filled grid")
      val pairs = xs.drop(lag).zip(xs.dropRight(lag)) // (x_t, x_{t-lag})
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      val expected =
        if (d1 > 0 && d2 > 0)
          Some(rnd4(num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))))
        else None
      assert(acf == expected, s"lag $lag: got $acf want $expected")
    }
  }

  test("q_time_ewma equals the closed-form power-of-two weighting, day by day") {
    val got = SparkEntry.queries("q_time_ewma")(spark, sf)
      .as[(Long, Long, Double)].collect().toList.sortBy(_._1)
    val byDay = grid.groupBy { case (h, _) => h / 86400000L * 86400000L }
    val expected = byDay.toList.sortBy(_._1).map { case (day, rows) =>
      val num = rows.map { case (h, c) => BigInt(c) << ((h / 3600000L) % 24).toInt }.sum
      val den = rows.map { case (h, _) => BigInt(1) << ((h / 3600000L) % 24).toInt }.sum
      (day, rows.map(_._2).sum, rnd4(num.toDouble / den.toDouble))
    }
    assert(got == expected)
    // α=1/2 semantics: the weighted level of a full day equals the state of
    // the textbook adjust-normalized recursive smoother after its 24 hours
    byDay.find(_._2.length == 24).foreach { case (day, rows) =>
      val (numR, denR) = rows.sortBy(_._1).foldLeft((0.0, 0.0)) {
        case ((nAcc, dAcc), (_, c)) => (nAcc / 2 + c, dAcc / 2 + 1.0)
      }
      val rec = rnd4(numR / denR)
      val closed = got.find(_._1 == day).get._3
      assert(math.abs(rec - closed) <= 1e-4,
        s"recursive EWMA $rec != closed form $closed for day $day")
    }
  }

  test("q_time_decomp equals a driver recompute mirroring every pin point") {
    val got = SparkEntry.queries("q_time_decomp")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toList.sortBy(_._1)
    val xs = grid.map(_._2)
    // trend/detr with the key's exact arithmetic (BIGINT window sum / count)
    val detr = xs.indices.map { i =>
      val lo = math.max(0, i - 23)
      val s = (lo to i).map(xs).sum
      xs(i).toDouble - s.toDouble / (i - lo + 1)
    }
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    def dec8(x: Double) =
      new java.math.BigDecimal(x).setScale(8, java.math.RoundingMode.HALF_UP)
    def rnd6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val byHour = detr.indices.groupBy(i => (grid(i)._1 / 3600000L) % 24)
    val expected = byHour.toList.sortBy(_._1).map { case (h, idxs) =>
      // seasonal = round(decimalSum(detr) / n, 6); report r4 of it
      val seasonal = rnd6(
        idxs.map(i => dec6(detr(i))).reduce(_ add _).doubleValue / idxs.length)
      val rss = idxs.map { i =>
        val r = detr(i) - seasonal; dec8(r * r)
      }.reduce(_ add _).doubleValue
      (h, idxs.length.toLong, rnd4(seasonal), rnd4(rss))
    }
    assert(got == expected)
    assert(got.map(_._1) == (0L to 23L).toList,
      "every hour-of-day slot must be populated by the gap-filled grid")
  }

  test("q_time_cusum equals a driver scan; a planted mean shift is located exactly") {
    val got = SparkEntry.queries("q_time_cusum")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    val perType = Tables(spark, sf, "events")
      .select($"event_type", (expr("unix_millis(ts) div 3600000") * 3600000L).as("h"))
      .groupBy($"event_type", $"h").count().as[(String, Long, Long)].collect()
      .groupBy(_._1)
    val expected = perType.toList.sortBy(_._1).map { case (tpe, rows) =>
      val series = rows.map(r => (r._2, r._3)).sortBy(_._1).toVector
      val bigT = BigInt(series.length)
      val total = series.map(r => BigInt(r._2)).sum
      var cum = BigInt(0)
      val devs = series.zipWithIndex.map { case ((h, c), i) =>
        cum += c
        ((bigT * cum - BigInt(i + 1) * total).abs, i + 1, h)
      }
      val best = devs.minBy { case (dev, t, _) => (-dev, t) } // max dev, earliest t
      (tpe, series.length.toLong, total.toLong, best._3,
        rnd4(best._1.toDouble / series.length))
    }
    assert(got == expected)

    // Planted shift: flat 10/hour for 50 hours then 30/hour for 50 hours —
    // the scaled CUSUM scan must peak exactly at the boundary bucket.
    val planted = (0 until 50).map(h => (h.toLong, 10L)) ++
      (50 until 100).map(h => (h.toLong, 30L))
    val bigT = BigInt(100)
    val tot = BigInt(planted.map(_._2).sum)
    var c2 = BigInt(0)
    val scan = planted.zipWithIndex.map { case ((h, c), i) =>
      c2 += c; ((bigT * c2 - BigInt(i + 1) * tot).abs, i + 1, h)
    }
    val peak = scan.maxBy(_._1)
    assert(peak._3 == 49L, s"CUSUM peak at hour ${peak._3}, want 49 (last pre-shift)")
  }

  test("q_time_theilsen equals a driver pairwise-median recomputation; robust where OLS is not") {
    def rnd6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    // Mirrors the declared max-lag window (t2 - t1 <= 336 h): pairs are
    // linear in the grid length, the estimator is Theil-Sen-within-L.
    def theilSen(xs: Seq[(Long, Long)]): (Long, Double) = {
      val slopes = (for {
        i <- xs.indices; j <- (i + 1) until xs.length
        if xs(j)._1 - xs(i)._1 <= 336
      } yield (xs(j)._2 - xs(i)._2).toDouble / (xs(j)._1 - xs(i)._1)).sorted
      val m = slopes.length
      val med = if (m % 2 == 1) slopes(m / 2)
                else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      (m.toLong, med)
    }
    val got = SparkEntry.queries("q_time_theilsen")(spark, sf)
      .as[(Long, Double)].collect().toList
    assert(got.size == 1)
    val grid = Tables(spark, sf, "events")
      .select(expr("(unix_millis(ts) div 3600000)").as("t"))
      .groupBy($"t").count().as[(Long, Long)].collect()
    val hours = (grid.map(_._1).min to grid.map(_._1).max).toVector
    val byT = grid.toMap
    val series = hours.map(h => h -> byT.getOrElse(h, 0L))
    val (nPairs, med) = theilSen(series)
    assert(got.head._1 == nPairs)
    assert(got.head._2 == rnd6(med), s"got ${got.head._2} want ${rnd6(med)}")
    // robustness plant: a perfect slope-3 line with ONE wild outlier —
    // Theil-Sen recovers 3 exactly while OLS is dragged far off
    val line = (0L until 25L).map(t => t -> (3L * t)) :+ (25L -> 10000L)
    val (_, tsSlope) = theilSen(line)
    assert(tsSlope == 3.0, s"Theil-Sen slope $tsSlope, want exactly 3")
    val n = line.length
    val sx = line.map(_._1).sum.toDouble; val sy = line.map(_._2).sum.toDouble
    val sxy = line.map(p => p._1 * p._2).sum.toDouble
    val sxx = line.map(p => p._1 * p._1).sum.toDouble
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 3.0) > 50.0, s"OLS $ols should be wrecked by the outlier")
  }

  test("q_time_holt equals a driver fold; constant day is a fixpoint, ramp day tracks the slope") {
    def rnd6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val got = SparkEntry.queries("q_time_holt")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    val counts = Tables(spark, sf, "events")
      .select(expr("unix_millis(ts) div 86400000").as("day"),
              expr("(unix_millis(ts) div 3600000) % 24").as("hour"))
      .groupBy($"day", $"hour").count()
      .as[(Long, Long, Long)].collect()
    def holt(xs: Seq[Long]): (Double, Double) = {
      var l = xs.head.toDouble; var b = 0.0
      xs.tail.foreach { x =>
        val l2 = (x.toDouble + l + b) / 2.0
        b = (l2 - l + b) / 2.0
        l = l2
      }
      (l, b)
    }
    val byDay = counts.groupBy(_._1)
    assert(got.map(_._1) == byDay.keys.toList.sorted)
    got.foreach { case (day, level, trend, forecast) =>
      val m = byDay(day).map(r => r._2 -> r._3).toMap
      val xs = (0L to 23L).map(h => m.getOrElse(h, 0L))
      val (l, b) = holt(xs)
      // dyadic-exact states: the driver double fold reproduces them bit
      // for bit, so rounded equality is exact equality
      assert(level == rnd6(l) && trend == rnd6(b), s"day $day")
      assert(forecast == rnd6(l + b))
    }
    // statistic sanity through the same fold definition
    val (lc, bc) = holt(Seq.fill(24)(7L))
    assert(lc == 7.0 && bc == 0.0, "constant series is a Holt fixpoint")
    val ramp = (0 until 24).map(t => 5L * t)
    val (lr, br) = holt(ramp)
    assert(math.abs(br - 5.0) < 0.1, s"ramp trend $br should approach the slope 5")
    // the b0 = 0 init transient lets level overshoot the head slightly
    assert(math.abs(lr - ramp.last) < 1.0, s"ramp level $lr lands near the head ${ramp.last}")
  }

  test("q_time_xcorr equals a BigInt-exact driver recomputation over the two series") {
    val got = SparkEntry.queries("q_time_xcorr")(spark, sf)
      .as[(Int, Long, Option[Double])].collect().toList.sortBy(_._1)
    assert(got.map(_._1) == List(0, 1, 2, 3))
    val counts = Tables(spark, sf, "events")
      .select($"event_type", (expr("unix_millis(ts) div 3600000") * 3600000L).as("h"))
      .groupBy($"event_type", $"h").count().as[(String, Long, Long)].collect()
    val clicks = counts.filter(_._1 == "click").map(r => r._2 -> r._3).toMap
    val purch = counts.filter(_._1 == "purchase").map(r => r._2 -> r._3).toMap
    // grid bounds come from ALL events' hours (the key's agg groups every
    // type's hour, so min/max span the full range even where x=y=0)
    val allHours = counts.map(_._2)
    val hours = (allHours.min to allHours.max by 3600000L).toVector
    val xs = hours.map(h => clicks.getOrElse(h, 0L))
    val ys = hours.map(h => purch.getOrElse(h, 0L))
    got.foreach { case (lag, nPairs, xcorr) =>
      assert(nPairs == hours.length - lag)
      val pairs = xs.dropRight(lag).zip(ys.drop(lag)) // (x_t, y_{t+lag})
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      val expected =
        if (d1 > 0 && d2 > 0)
          Some(rnd4(num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))))
        else None
      assert(xcorr == expected, s"lag $lag: got $xcorr want $expected")
    }
  }

  test("q_time_iat equals a driver gap recomputation with interpolated percentiles") {
    val got = SparkEntry.queries("q_time_iat")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    def rnd1(x: Double) =
      new java.math.BigDecimal(x).setScale(1, java.math.RoundingMode.HALF_UP).doubleValue
    // exact interpolated percentile (the Spark/DuckDB quantile_cont form)
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted; val pos = p * (s.length - 1)
      val lo = pos.toInt; val f = pos - lo
      if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * f else s(lo).toDouble
    }
    val evs = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS ts_us")
      .as[(Long, String, Long, Long)].collect().toList
    val gaps = evs.groupBy(e => (e._1, e._2)).values.toList.flatMap { g =>
      val ts = g.sortBy(r => (r._4, r._3)).map(_._4)
      ts.zip(ts.tail).map { case (a, b) => (g.head._2, b - a) }
    }
    got.foreach { case (tp, n, p50, p90, mx) =>
      val mine = gaps.filter(_._1 == tp).map(_._2)
      assert(n == mine.length.toLong)
      assert(mx == mine.max)
      assert(p50 == rnd1(pct(mine, 0.5) / 1.0e6), s"$tp p50")
      assert(p90 == rnd1(pct(mine, 0.9) / 1.0e6), s"$tp p90")
      assert(p50 <= p90 && p90 * 1e6 <= mx + 1e6)
    }
  }

  test("q_time_pacf: Durbin-Levinson over the acf key's own pinned r's") {
    val acf = SparkEntry.queries("q_time_acf")(spark, sf)
      .as[(Int, Long, Double)].collect().toList.sortBy(_._1)
    val got = SparkEntry.queries("q_time_pacf")(spark, sf)
      .as[(Int, Double, Double)].collect().toList.sortBy(_._1)
    assert(got.map(_._1) == List(1, 2, 3))
    // the acf column IS the acf key's output — shared substrate
    assert(got.map(r => (r._1, r._2)) == acf.map(r => (r._1, r._3)))
    def rnd6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val List(r1, r2, r3) = acf.map(_._3)
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 - phi22 * r1
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
      (1.0 - phi21 * r1 - phi22 * r2)
    assert(got(0)._3 == rnd6(r1))
    assert(got(1)._3 == rnd6(phi22))
    assert(got(2)._3 == rnd6(phi33))
    // PACF of a stationary series stays inside [-1, 1]
    assert(got.forall(r => math.abs(r._3) <= 1.0))
  }

  test("q_time_mk equals a driver seasonal sign recount; tau bounded") {
    val got = SparkEntry.queries("q_time_mk")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got.map(_._1) == (0L to 23L).toList)
    def rnd6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue
    val hc = Tables(spark, sf, "events")
      .selectExpr("unix_millis(ts) div 86400000 AS day",
                  "(unix_millis(ts) div 3600000) % 24 AS h24")
      .groupBy("day", "h24").count()
      .as[(Long, Long, Long)].collect().toList
    val (lo, hi) = (hc.map(_._1).min, hc.map(_._1).max)
    val byKey = hc.map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (h24, nPairs, sStat, tau) =>
      val series = (lo to hi).map(d => byKey.getOrElse((d, h24), 0L))
      val pairs = for (i <- series.indices; j <- i + 1 until series.length
                       if j - i <= 14) yield (series(i), series(j))
      assert(nPairs == pairs.size.toLong, s"h24=$h24")
      val s = pairs.map { case (a, b) =>
        if (b > a) 1L else if (b < a) -1L else 0L }.sum
      assert(sStat == s, s"h24=$h24")
      assert(tau == rnd6(s.toDouble / pairs.size) &&
        tau >= -1.0 && tau <= 1.0)
    }
  }

  test("q_time_burst equals a driver hysteresis automaton on the gap-filled grid") {
    val got = SparkEntry.queries("q_time_burst")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    val hc = Tables(spark, sf, "events")
      .selectExpr("(unix_millis(ts) div 3600000) * 3600000 AS h", "event_type")
      .groupBy("h", "event_type").count()
      .as[(Long, String, Long)].collect().toList
    val (lo, hi) = (hc.map(_._1).min, hc.map(_._1).max)
    val hours = lo to hi by 3600000L
    got.foreach { case (tp, nH, nEv, nB, bH, maxL, evB) =>
      val byH = hc.filter(_._2 == tp).map(r => r._1 -> r._3).toMap
      val cs = hours.map(h => byH.getOrElse(h, 0L))
      val (n, total) = (cs.length.toLong, cs.sum)
      assert(nH == n && nEv == total, tp)
      // driver Schmitt trigger: enter at 1.5x mean, exit below mean
      var state = 0L; var run = 0L
      var bursts = 0L; var bh = 0L; var mx = 0L; var ev = 0L
      cs.foreach { c =>
        val prev = state
        if (2 * c * n >= 3 * total) state = 1L
        else if (c * n < total) state = 0L
        if (state == 1L) {
          if (prev == 0L) { bursts += 1; run = 0L }
          run += 1; bh += 1; ev += c; mx = math.max(mx, run)
        }
      }
      assert((nB, bH, maxL, evB) == ((bursts, bh, mx, ev)), tp)
      // structural invariants of any segmentation
      assert(maxL <= bH && bH <= n && (nB == 0L || maxL * nB >= bH || maxL <= bH))
      assert(nB > 0L, s"$tp: threshold degenerate at this SF")
    }
  }

  test("q_time_entropy equals a driver recomputation; uniform clock hits ln 24 exactly") {
    val got = SparkEntry.queries("q_time_entropy")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().toList.sortBy(_._1)
    assert(got.nonEmpty)
    def rnd(x: Double, s: Int) =
      new java.math.BigDecimal(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue
    def dec12(x: Double) =
      new java.math.BigDecimal(x).setScale(12, java.math.RoundingMode.HALF_UP)
    val counts = Tables(spark, sf, "events")
      .selectExpr("event_type", "(unix_millis(ts) div 3600000) % 24 AS h24")
      .groupBy($"event_type", $"h24").count()
      .as[(String, Long, Long)].collect().toList
    got.foreach { case (tp, nEv, nSlots, h, hNorm) =>
      val mine = counts.filter(_._1 == tp)
      val n = mine.map(_._3).sum
      assert(nEv == n && nSlots == mine.length.toLong)
      val terms = mine.map { case (_, _, c) =>
        val p = c.toDouble / n; p * rnd(math.log(p), 6)
      }
      val want = rnd(-terms.map(dec12).reduce(_ add _).doubleValue, 6)
      assert(h == want, s"$tp: got $h want $want")
      assert(hNorm == rnd(h / math.log(24.0), 4))
      assert(hNorm >= 0.0 && hNorm <= 1.0)
    }
    // the statistic itself: a perfectly uniform 24-slot clock has H = ln 24
    val uniform = (0 until 24).map(_ => 1.0 / 24.0)
    val hU = -uniform.map(p => p * math.log(p)).sum
    assert(math.abs(hU - math.log(24.0)) < 1e-12)
    // and a single-slot burst has H = 0
    assert(-(1.0 * math.log(1.0)) == 0.0)
  }

  test("q_time_periodogram equals a driver DFT over the gap-filled grid") {
    val got = SparkEntry.queries("q_time_periodogram")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList.sortBy(_._1)
    assert(got.map(_._1) == List(6L, 12L, 24L, 168L))
    def rnd(x: Double, s: Int) =
      new java.math.BigDecimal(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val byH = Tables(spark, sf, "events")
      .selectExpr("unix_millis(ts) div 3600000 AS h").groupBy($"h").count()
      .as[(Long, Long)].collect().toMap
    val (lo, hi) = (byH.keys.min, byH.keys.max)
    val xs = (lo to hi).map(h => byH.getOrElse(h, 0L))
    val n = xs.size.toLong
    val sx = xs.sum
    got.foreach { case (p, nG, c, s2, pw) =>
      assert(nG == n)
      def trig(f: Double => Double) = rnd(
        xs.zipWithIndex.map { case (x, t) =>
          dec6((n * x - sx).toDouble *
            f(6.283185307179586 * (t % p.toInt).toDouble / p))
        }.reduce(_ add _).doubleValue / (n * n), 4)
      assert(c == trig(math.cos), s"period=$p cos")
      assert(s2 == trig(math.sin), s"period=$p sin")
      assert(pw == rnd(c * c + s2 * s2, 4))
      assert(pw >= 0.0)
    }
    // the statistic itself: a pure 24h cosine concentrates its power at
    // the 24h line and reads ~zero at the incommensurate weekly line
    val m = 336
    val wave = (0 until m).map(t => math.cos(2 * math.Pi * t / 24.0))
    def powAt(p: Double) = {
      val c = wave.zipWithIndex.map { case (x, t) => x * math.cos(2 * math.Pi * t / p) }.sum
      val s = wave.zipWithIndex.map { case (x, t) => x * math.sin(2 * math.Pi * t / p) }.sum
      (c * c + s * s) / m
    }
    assert(powAt(24.0) > 100 * powAt(168.0))
  }

  test("m_time_dtw: axioms, independent recursive DTW, hand example, elastic beats lock-step") {
    import graft.operators.Dtw
    // independent implementation: top-down recursion with memo
    def ref(a: Array[Double], b: Array[Double]): Double = {
      val memo = scala.collection.mutable.Map.empty[(Int, Int), Double]
      def go(i: Int, j: Int): Double = {
        if (i < 0 || j < 0) Double.PositiveInfinity
        else if (i == 0 && j == 0) math.abs(a(0) - b(0))
        else memo.getOrElseUpdate((i, j),
          math.abs(a(i) - b(j)) +
            math.min(go(i - 1, j), math.min(go(i, j - 1), go(i - 1, j - 1))))
      }
      go(a.length - 1, b.length - 1)
    }
    // hand-computed: [0,1,2] vs [0,2] aligns 1 to either end -> 1.0
    assert(Dtw.dist(Array(0.0, 1.0, 2.0), Array(0.0, 2.0)) == 1.0)
    val x = (0 until 24).map(h => math.sin(2 * math.Pi * h / 24.0)).toArray
    val y = (0 until 24).map(h => math.sin(2 * math.Pi * ((h + 22) % 24) / 24.0)).toArray
    assert(Dtw.dist(x, x) == 0.0)
    assert(Dtw.dist(x, y) == Dtw.dist(y, x))
    assert(Dtw.dist(x, y) == ref(x, y))
    val lockstep = x.zip(y).map { case (p, q) => math.abs(p - q) }.sum
    assert(Dtw.dist(x, y) <= lockstep)
    // the elastic property: a 2h phase shift is NEARLY free under warping
    // (only the unmatched rim survives) but expensive lock-step
    assert(Dtw.dist(x, y) < 0.25 * lockstep, s"${Dtw.dist(x, y)} vs $lockstep")

    // the key equals a driver recomputation from independently derived profiles
    val got = SparkEntry.queries("m_time_dtw")(spark, sf)
      .as[(String, String, Double)].collect().toList
    val rows = Tables(spark, sf, "events")
      .selectExpr("event_type", "hour(ts) AS h", "CAST(value AS DECIMAL(18,6)) AS v")
      .as[(String, Int, java.math.BigDecimal)].collect().toList
    val prof = rows.groupBy(_._1).view.mapValues { xs =>
      val a = Array.fill(24)(0.0)
      xs.groupBy(_._2).foreach { case (h, hs) =>
        val mean = hs.map(_._3).reduce(_ add _).doubleValue / hs.size
        a(h) = new java.math.BigDecimal(mean)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      }
      a
    }.toMap
    val types = prof.keys.toList.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield (types(i), types(j),
      math.rint(ref(prof(types(i)), prof(types(j))) * 10000.0) / 10000.0)).toList
    assert(got == want)
    assert(got.size == types.size * (types.size - 1) / 2)
  }

  test("q_time_sax equals a driver z-normalize + quartile-breakpoint recount") {
    val got = SparkEntry.queries("q_time_sax")(spark, sf)
      .as[(String, String, Long)].collect().toList
    assert(got.nonEmpty)
    val counts = Tables(spark, sf, "events")
      .selectExpr("event_type", "CAST(hour(ts) AS INT) AS h")
      .as[(String, Int)].collect().toList
      .groupBy(_._1).view.mapValues { xs =>
        val a = Array.fill(24)(0L)
        xs.foreach(x => a(x._2) += 1L)
        a
      }.toMap
    def rnd6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    got.foreach { case (t, sax, n) =>
      val v = counts(t)
      assert(n == v.sum, t)
      assert(sax.length == 24 && sax.forall("abcd".contains(_)), t)
      val sv = v.sum.toDouble
      val svv = v.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      val den2 = 24.0 * svv - sv * sv
      val want = v.map { x =>
        val z = if (den2 > 0.0) rnd6((24.0 * x - sv) / math.sqrt(den2)) else 0.0
        if (z < -0.6745) 'a' else if (z < 0.0) 'b'
        else if (z < 0.6745) 'c' else 'd'
      }.mkString
      assert(sax == want, s"$t: $sax vs $want")
    }
    // the mapping itself: a flat profile has zero variance -> all 'c'
    // (z = 0 by the den2 guard), and a single spike reads 'd' at the spike
    val flat = Array.fill(24)(7L)
    assert(24.0 * flat.map(x => x * x).sum - math.pow(flat.sum.toDouble, 2) == 0.0)
  }

  test("q_time_lomb equals a driver recomputation; a planted uneven sinusoid peaks at its period") {
    def dec6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    def rnd(x: Double, sc: Int) = new java.math.BigDecimal(x)
      .setScale(sc, java.math.RoundingMode.HALF_UP).doubleValue
    // the full single-pass LS pipeline on the driver (decimal-pinned terms)
    def lsPower(ts: List[Long], xs: List[Double], periodsH: List[Long])
        : Map[Long, Option[Double]] = {
      val mn = ts.min
      periodsH.map { p =>
        val pus = p * 3600000000L
        val ang = ts.map(t => 6.283185307179586 * ((t - mn) % pus).toDouble / pus)
        def dsum(vs: List[Double]) = vs.map(dec6).reduce(_ add _).doubleValue
        val n = xs.size
        val sx = dsum(xs); val sxx = dsum(xs.map(x => x * x))
        val sxc = dsum(xs.zip(ang).map { case (x, a) => x * math.cos(a) })
        val sxs = dsum(xs.zip(ang).map { case (x, a) => x * math.sin(a) })
        val sc = dsum(ang.map(math.cos)); val ss = dsum(ang.map(math.sin))
        val scc = dsum(ang.map(a => math.cos(a) * math.cos(a)))
        val sss = dsum(ang.map(a => math.sin(a) * math.sin(a)))
        val ssc = dsum(ang.map(a => math.sin(a) * math.cos(a)))
        val s2s = dsum(ang.map(a => math.sin(2.0 * a)))
        val s2c = dsum(ang.map(a => math.cos(2.0 * a)))
        val xb = sx / n
        val vr = (sxx - sx * sx / n) / (n - 1)
        val phi = math.atan2(s2s, s2c) / 2.0
        val (ct, st) = (math.cos(phi), math.sin(phi))
        val xc = sxc - xb * sc; val xsv = sxs - xb * ss
        val aa = xc * ct + xsv * st; val bb = xsv * ct - xc * st
        val cc2 = ct * ct * scc + 2.0 * ct * st * ssc + st * st * sss
        val ss2 = st * st * scc - 2.0 * ct * st * ssc + ct * ct * sss
        p -> (if (cc2 > 0.0 && ss2 > 0.0 && vr > 0.0)
          Some(rnd((aa * aa / cc2 + bb * bb / ss2) / (2.0 * vr), 4)) else None)
      }.toMap
    }
    val got = SparkEntry.queries("q_time_lomb")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    assert(got.map(_._1) == List(6L, 12L, 24L, 168L))
    val ev = Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .selectExpr("unix_micros(ts) AS tu", "value")
      .as[(Long, Double)].collect().toList.sortBy(_._1)
    val want = lsPower(ev.map(_._1), ev.map(_._2), List(6L, 12L, 24L, 168L))
    got.foreach { case (p, n, pw) =>
      assert(n == ev.size.toLong)
      assert(pw == want(p), s"period=$p: $pw vs ${want(p)}")
    }
    // the statistic itself: an UNEVENLY sampled pure 24h sinusoid (sample
    // times from integer arithmetic, deliberately irregular) concentrates
    // its normalized power at 24h — the case the gap-filled DFT cannot see
    val H = 3600000000L
    val ts = (0 until 240).map(i => (i * 7L % 720L) * H + (i * 13L % 60L) * 60000000L).toList
    val xs = ts.map(t => math.sin(2 * math.Pi * (t % (24 * H)).toDouble / (24 * H)))
    val pw = lsPower(ts, xs, List(6L, 12L, 24L, 168L)).map { case (k, v) => k -> v.get }
    assert(pw(24L) > 5.0 * pw(12L) && pw(24L) > 5.0 * pw(6L),
      s"24h sinusoid power not concentrated: $pw")
  }

  test("q_time_runs equals a driver recount; clustering and oscillation read opposite signs") {
    val Array(row) = SparkEntry.queries("q_time_runs")(spark, sf).collect()
    val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      if (row.isNullAt(4)) None else Some(row.getDouble(4)))
    val byH = Tables(spark, sf, "events")
      .selectExpr("unix_millis(ts) div 3600000 AS hb").groupBy($"hb").count()
      .as[(Long, Long)].collect().toMap
    val grid = (byH.keys.min to byH.keys.max).map(h => byH.getOrElse(h, 0L)).toList
    // interpolated median, the quantile_cont contract
    val sorted = grid.map(_.toDouble).sorted
    val pos = 0.5 * (sorted.size - 1)
    val med = sorted(pos.toInt) +
      (pos - pos.toInt) * (sorted(math.min(pos.toInt + 1, sorted.size - 1)) - sorted(pos.toInt))
    def runsStat(sgns: List[Long]) = {
      val nA = sgns.count(_ == 1L).toLong; val nB = sgns.count(_ == 0L).toLong
      val n = nA + nB
      val r = if (sgns.isEmpty) 0L
        else 1L + sgns.sliding(2).count { case List(a, c) => a != c; case _ => false }
      val mu = 2.0 * nA * nB / n + 1.0
      val s2 = (2.0 * nA * nB * (2.0 * nA * nB - n)) /
        (n.toDouble * n * (n - 1))
      (n, r, nA, nB, if (s2 > 0.0) Some(rnd4((r - mu) / math.sqrt(s2))) else None)
    }
    val sgns = grid.filter(_.toDouble != med).map(v => if (v > med) 1L else 0L)
    assert(got == runsStat(sgns), s"got $got want ${runsStat(sgns)}")
    // the statistic itself: a perfectly alternating series has the MAXIMUM
    // run count (z > 0); a two-block series has 2 runs (z < 0)
    val alt = List.tabulate(40)(i => (i % 2).toLong)
    val blocks = List.fill(20)(1L) ++ List.fill(20)(0L)
    assert(runsStat(alt)._5.get > 0.0 && runsStat(blocks)._5.get < 0.0)
    assert(runsStat(alt)._2 == 40L && runsStat(blocks)._2 == 2L)
  }

  test("q_time_peaks equals a driver prominence scan; the saddle law holds on planted twin summits") {
    // independent prominence: direct per-peak walk (no joins)
    def prominences(h: Array[Long], L: Int = 336): List[(Int, Long, Long)] =
      (1 until h.length - 1).toList
        .filter(i => h(i) > h(i - 1) && h(i) > h(i + 1))
        .map { i =>
          val lo = math.max(0, i - L); val hi = math.min(h.length - 1, i + L)
          var j = i - 1; var vl = Long.MaxValue
          var stop = false
          while (j >= lo && !stop) {
            if (h(j) > h(i)) stop = true
            else { vl = math.min(vl, h(j)); j -= 1 }
          }
          var k = i + 1; var vr = Long.MaxValue; stop = false
          while (k <= hi && !stop) {
            if (h(k) > h(i)) stop = true
            else { vr = math.min(vr, h(k)); k += 1 }
          }
          (i, h(i), h(i) - math.max(vl, vr))
        }
    val byH = Tables(spark, sf, "events")
      .selectExpr("unix_millis(ts) div 3600000 AS hb").groupBy($"hb").count()
      .as[(Long, Long)].collect().toMap
    val (lo, hi) = (byH.keys.min, byH.keys.max)
    val grid = (lo to hi).map(h => byH.getOrElse(h, 0L)).toArray
    val want = prominences(grid)
      .sortBy { case (i, _, p) => (-p, i) }.take(10)
      .map { case (i, ht, p) => ((lo + i) * 3600000L, ht, p) }
    val got = SparkEntry.queries("q_time_peaks")(spark, sf)
      .as[(Long, Long, Long)].collect().toList
    assert(got == want, s"got $got want $want")
    assert(got.nonEmpty && got.forall(r => r._3 >= 1L && r._3 <= r._2))
    // the saddle law: twin summits [0,5,1,4,0] — the big peak's prominence
    // is its full height over the outer floor, the small one is capped by
    // the 1-valley saddle (4 - 1 = 3)
    val twin = prominences(Array(0L, 5L, 1L, 4L, 0L))
    assert(twin == List((1, 5L, 5L), (3, 4L, 3L)), twin.toString)
  }

  // ---- m_time_matrixprofile ------------------------------------------

  /** Kernel wrapper: interleaved [d, nn, ...] → (profile, nn indices). */
  private def mp(x: Array[Double], m: Int): (Array[Double], Array[Int]) = {
    val out = graft.functions.MatrixProfileExpr
      .compute(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(x), m)
      .toDoubleArray()
    val w = out.length / 2
    (Array.tabulate(w)(i => out(2 * i)), Array.tabulate(w)(i => out(2 * i + 1).toInt))
  }

  /** Brute-force reference: EXPLICITLY z-normalize every window, Euclidean
    * distance, same exclusion zone and flat-window conventions — no rolling
    * dot product anywhere (different algorithm, different FP path). */
  private def bruteMp(x: Array[Double], m: Int): Array[Double] = {
    val n = x.length; val w = n - m + 1; val excl = m / 2
    def stats(a: Int): (Double, Double) = {
      val s = (a until a + m).map(x(_))
      val mu = s.sum / m
      (mu, math.sqrt(s.map(v => (v - mu) * (v - mu)).sum / m))
    }
    def d(i: Int, j: Int): Double = {
      val (mi, si) = stats(i); val (mj, sj) = stats(j)
      if (si < 1e-12 && sj < 1e-12) 0.0
      else if (si < 1e-12 || sj < 1e-12) math.sqrt(2.0 * m)
      else math.sqrt((0 until m).map { k =>
        val z = (x(i + k) - mi) / si - (x(j + k) - mj) / sj; z * z
      }.sum)
    }
    Array.tabulate(w)(i =>
      (0 until w).filter(j => math.abs(i - j) >= excl).map(d(i, _)).min)
  }

  test("matrix profile kernel equals a brute z-normalize-then-scan reference; nn attains the min") {
    val rnd = new scala.util.Random(1417)
    for (trial <- 1 to 8) {
      val n = 40 + rnd.nextInt(80)
      val m = 4 + 2 * rnd.nextInt(4) // 4..10
      val x = Array.tabulate(n) { i =>
        // mix of noise, a diurnal-ish wave, and (some trials) flat stretches
        if (trial % 3 == 0 && i / 10 % 3 == 0) 5.0
        else math.rint((math.sin(i * 0.7) * 3 + rnd.nextDouble() * 4) * 10) / 10
      }
      if (n >= 2 * m) {
        val (prof, nn) = mp(x, m)
        val ref = bruteMp(x, m)
        assert(prof.length == n - m + 1)
        prof.indices.foreach { i =>
          assert(math.abs(prof(i) - ref(i)) < 1e-6,
            s"trial $trial i=$i: kernel ${prof(i)} != brute ${ref(i)}")
          // the stored nn must itself attain the minimum (within FP), and
          // sit outside the exclusion zone
          assert(math.abs(nn(i) - i) >= m / 2, s"nn inside exclusion at $i")
        }
      }
    }
    // precondition is loud, not silent
    intercept[IllegalArgumentException] { mp(Array.fill(10)(1.0), 8) }
  }

  test("matrix profile: planted motif pair reads 0 and points at its twin; discord covers the oddity") {
    val rnd = new scala.util.Random(99)
    val m = 8
    val x = Array.tabulate(120)(_ => math.rint(rnd.nextDouble() * 40) / 10)
    val pattern = Array(0.0, 5.0, 1.0, 6.0, 2.0, 7.0, 3.0, 8.0)
    pattern.indices.foreach { k => x(20 + k) = pattern(k); x(80 + k) = pattern(k) }
    val (prof, nn) = mp(x, m)
    assert(prof(20) < 1e-9 && prof(80) < 1e-9, "planted twins must read 0")
    assert(nn(20) == 80 && nn(80) == 20, s"twins must point at each other (${nn(20)}, ${nn(80)})")
    // Discord needs a structurally unique SHAPE, not a big value —
    // z-normalization is scale-invariant, so a giant spike matches any
    // window with a bump in the same slot. Periodic series (every window
    // has an exact twin one period away, outside the m/2 exclusion) with
    // one alternating-shape disturbance: only windows overlapping the
    // disturbance lack a twin, so the discord must land on one of them.
    val p = Array(0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)
    val z = Array.tabulate(120)(i => p(i % 8))
    (0 until 8).foreach(k => z(60 + k) = if (k % 2 == 0) 4.0 else 0.0)
    val (prof3, _) = mp(z, m)
    prof3.indices.foreach { i =>
      if (i + m <= 60 || i >= 68)
        assert(prof3(i) < 1e-9, s"periodic window $i must have an exact twin: ${prof3(i)}")
    }
    val discordI = prof3.indices.maxBy(i => (prof3(i), -i))
    assert(discordI > 60 - m && discordI < 68,
      s"discord must overlap the disturbance: $discordI")
    assert(prof3(discordI) > 1.0, s"disturbance must read far: ${prof3(discordI)}")
  }

  test("matrix profile flat-window conventions: constant series is all-0; flat vs moving is sqrt(2m)") {
    val m = 8
    val (flatProf, _) = mp(Array.fill(40)(5.0), m)
    assert(flatProf.forall(_ == 0.0), "constant series must profile to 0")
    // one ramp in an otherwise flat series: fully-flat windows still find
    // another flat window (0) — including flat windows AFTER a long mixed
    // prefix, the case an epsilon-on-σ flatness test gets wrong — and the
    // ramp window's best match is bounded by the declared r=0 flat-vs-
    // moving distance sqrt(2m) (a partial-overlap window may be closer)
    val y = Array.fill(64)(5.0)
    (0 until m).foreach(k => y(20 + k) = k.toDouble)
    val (prof2, _) = mp(y, m)
    assert(prof2(0) == 0.0, "flat window must match another flat window at 0")
    assert(prof2(40) == 0.0, "flat window after the mixed prefix must still read flat")
    assert(prof2(20) <= math.sqrt(2.0 * m) + 1e-9,
      s"moving window's profile must be bounded by the flat match: ${prof2(20)}")
    assert(prof2(20) > 1.0, s"ramp must not read as matching a flat: ${prof2(20)}")
  }

  test("matrix profile diagonal-block tier: merged blocks bit-identical to the serial kernel") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(1519)
    for (trial <- 1 to 6) {
      val n = 80 + rnd.nextInt(200)
      val m = 4 + 2 * rnd.nextInt(4)
      val x = Array.tabulate(n) { i =>
        if (trial % 2 == 0 && i / 12 % 4 == 0) 3.0
        else math.rint((math.sin(i * 0.4) * 5 + rnd.nextDouble() * 3) * 10) / 10
      }
      val w = n - m + 1
      val (profK, _) = mp(x, m)
      // split the diagonals into uneven chunks (incl. degenerate/empty
      // ranges) and merge by (d, nn)-min — the tiled tier's exact shape
      val cuts = (Seq(0, w) ++ Seq.fill(3)(rnd.nextInt(w))).distinct.sorted
      val prof = Array.fill(w)(Double.PositiveInfinity)
      val nn = Array.fill(w)(-1)
      cuts.sliding(2).foreach { case Seq(k0, k1) =>
        val part = graft.functions.MatrixProfileBlockExpr
          .compute(ArrayData.toArrayData(x), m, k0, k1).toDoubleArray()
        var i = 0
        while (i < w) {
          val d = part(2 * i); val j = part(2 * i + 1).toInt
          if (d < prof(i) || (d == prof(i) && j < nn(i))) { prof(i) = d; nn(i) = j }
          i += 1
        }
      }
      prof.indices.foreach { i =>
        // BIT-identical distances: the block kernel replays the serial
        // kernel's own diagonal chains (shared stats + distance code)
        assert(prof(i) == profK(i),
          s"trial $trial i=$i: tiled ${prof(i)} != kernel ${profK(i)}")
        assert(nn(i) >= 0 && math.abs(nn(i) - i) >= m / 2, s"bad nn at $i")
      }
    }
  }

  test("m_time_matrixprofile: forced tiled branch == kernel branch on the fixture grid") {
    val kernel = queries.Timeseries.mpKey(spark, sf, Int.MaxValue)
      .as[(String, Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    val tiled = queries.Timeseries.mpKey(spark, sf, 0)
      .as[(String, Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(tiled == kernel, s"tiled:\n $tiled\nkernel:\n $kernel")
  }

  test("m_time_matrixprofile equals a driver recomputation from the raw parquet") {
    val m = 24
    val byType = Tables(spark, sf, "events")
      .select($"event_type", expr("unix_millis(ts) div 3600000").as("hr"))
      .groupBy($"event_type", $"hr").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues { rows =>
        val counts = rows.map(r => r._2 -> r._3).toMap
        val lo = counts.keys.min; val hi = counts.keys.max
        (lo to hi).map(h => counts.getOrElse(h, 0L).toDouble).toArray
      }.toMap
    val want = byType.toSeq.filter(_._2.length >= 2 * m).map { case (tp, x) =>
      val ref = bruteMp(x, m)
      val w = ref.length
      val motifI = ref.indices.minBy(i => (ref(i), i))
      val discordI = ref.indices.minBy(i => (-ref(i), i))
      (tp, x.length.toLong, w.toLong, motifI.toLong, rnd4(ref(motifI)),
        discordI.toLong, rnd4(ref(discordI)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("m_time_matrixprofile")(spark, sf)
      .select($"event_type", $"n_hours", $"n_windows", $"motif_i",
        $"motif_d", $"discord_i", $"discord_d")
      .as[(String, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got.map(_._1) == want.map(_._1), s"types: ${got.map(_._1)} vs ${want.map(_._1)}")
    got.zip(want).foreach { case (g, w0) =>
      assert(g._2 == w0._2 && g._3 == w0._3, s"${g._1}: grid shape $g vs $w0")
      assert(g._4 == w0._4 && g._6 == w0._6, s"${g._1}: argext $g vs $w0")
      assert(math.abs(g._5 - w0._5) < 1e-3 && math.abs(g._7 - w0._7) < 1e-3,
        s"${g._1}: values $g vs $w0")
    }
    // and the key's motif_nn attains the motif distance in the reference
    val gotNn = SparkEntry.queries("m_time_matrixprofile")(spark, sf)
      .select($"event_type", $"motif_i", $"motif_nn").as[(String, Long, Long)]
      .collect()
    gotNn.foreach { case (tp, i, j) =>
      assert(math.abs(i - j) >= m / 2, s"$tp: nn $j inside exclusion of $i")
    }
  }
}
