package graft

import org.apache.spark.sql.functions._

/** Properties of the supervised MLlib keys (SURVEY §2.10 adjunct):
  * run-to-run stability (deterministic fits — the m_kmeans discipline),
  * held-out quality floors with measured headroom (logreg test accuracy
  * 0.83 observed at sf0.001 vs the ~0.88 Bayes rate of the planted 12%
  * label noise; linreg test R² 0.995 observed), planted-direction
  * recovery, and the content-keyed split discipline. */
class MlModelSpec extends BaseSpec {
  import spark.implicits._

  private def logreg() = SparkEntry.queries("m_ml_logreg")(spark, sf)
    .as[(String, Long, Long, Double)].collect().toList

  private def linreg() = SparkEntry.queries("m_ml_linreg")(spark, sf)
    .as[(String, Long, Double, Double)].collect().toList

  test("logreg: stable across runs, held-out accuracy near the Bayes rate") {
    val r1 = logreg()
    assert(r1 == logreg(), "same data + hyperparameters must refit identically")
    val byCase = r1.map(r => r._1 -> r).toMap
    val (_, nTest, _, accTest) = byCase("test")
    val (_, nTrain, _, accTrain) = byCase("train")
    // content-keyed md5 split: 12/16 nibbles → expect ~75% train
    val frac = nTrain.toDouble / (nTrain + nTest)
    assert(frac > 0.65 && frac < 0.85, s"train fraction $frac drifted from 3/4")
    // planted margin with 12% Bayes-flipped labels: a working fit sits
    // near 0.88; chance is ~0.5 and a leaked split would show ~1.0
    assert(accTest >= 0.78, s"held-out accuracy $accTest below floor")
    assert(accTest <= 0.95, s"held-out accuracy $accTest above the Bayes " +
      "rate — label noise leaked into the features?")
    assert(accTrain >= 0.78, s"train accuracy $accTrain below floor")
  }

  test("logreg recovers the planted coefficient direction (+x1, -x2)") {
    import org.apache.spark.ml.classification.LogisticRegression
    // the SAME frame builder the declared key uses — the test can never
    // drift onto a stale private copy of the plant
    val d = graft.queries.Ml.logregFrame(spark, sf)
    val m = new LogisticRegression().setMaxIter(50).setRegParam(0.0)
      .fit(d.filter($"split" === "train"))
    val c = m.coefficients
    assert(c(0) > 0 && c(1) < 0, s"recovered direction $c, want (+, -)")
    // the planted ratio |c1/c2| = 0.8/0.6; the fit should land near it
    val ratio = math.abs(c(0) / c(1))
    assert(ratio > 0.9 && ratio < 2.0,
      s"coefficient ratio $ratio far from the planted 1.33")
  }

  test("svm: stable across runs, held-out accuracy in the logreg band, direction recovered") {
    def svm() = SparkEntry.queries("m_ml_svm")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toList
    val r1 = svm()
    assert(r1 == svm(), "convex hinge fit must refit identically")
    val byCase = r1.map(r => r._1 -> r).toMap
    val (_, _, _, accTest) = byCase("test")
    // max-margin vs likelihood on the same ~12% noise plant: same band
    assert(accTest >= 0.78 && accTest <= 0.95, s"held-out accuracy $accTest")
    import org.apache.spark.ml.classification.LinearSVC
    val d = graft.queries.Ml.logregFrame(spark, sf)
    val c = new LinearSVC().setMaxIter(50).setRegParam(0.01)
      .fit(d.filter($"split" === "train")).coefficients
    assert(c(0) > 0 && c(1) < 0, s"recovered direction $c, want (+, -)")
    val ratio = math.abs(c(0) / c(1))
    assert(ratio > 0.9 && ratio < 2.0,
      s"coefficient ratio $ratio far from the planted 1.33")
  }

  private def gbt() = SparkEntry.queries("m_ml_gbt")(spark, sf)
    .as[(String, Long, Long, Double)].collect().toList

  private def als() = SparkEntry.queries("m_ml_als")(spark, sf)
    .as[(String, Long, Double, Double)].collect().toList

  test("gbt: stable across runs, held-out accuracy floor on the planted target") {
    val r1 = gbt()
    assert(r1 == gbt(), "no-subsampling GBT must refit identically")
    val byCase = r1.map(r => r._1 -> r).toMap
    val (_, _, _, accTest) = byCase("test")
    // axis-aligned splits approximating the planted LINEAR boundary: a
    // working ensemble lands below the linear model's ceiling but far
    // above chance (observed 0.81 at sf0.001; chance ~0.5, Bayes ~0.88)
    assert(accTest >= 0.72, s"held-out accuracy $accTest below floor")
    assert(accTest <= 0.95, s"held-out accuracy $accTest above the Bayes " +
      "rate — label noise leaked into the features?")
  }

  test("nb: closed-form fit is run-to-run identical, held-out accuracy in the declared band") {
    def nb() = SparkEntry.queries("m_ml_nb")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toList
    val r1 = nb()
    assert(r1 == nb(), "closed-form Gaussian NB must refit identically (no seed)")
    val accTest = r1.map(r => r._1 -> r._4).toMap.apply("test")
    // class-conditional Gaussians vs the planted LINEAR boundary: near
    // but below the linear ceiling (observed 0.81 at sf0.001; chance
    // ~0.5, Bayes ~0.88)
    assert(accTest >= 0.70, s"held-out accuracy $accTest below floor")
    assert(accTest <= 0.95, s"held-out accuracy $accTest above the Bayes " +
      "rate — label noise leaked into the features?")
  }

  test("rf: seeded fit is run-to-run identical, held-out accuracy in the declared band") {
    def rf() = SparkEntry.queries("m_ml_rf")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toList
    val r1 = rf()
    assert(r1 == rf(), "seeded RF (featureSubsetStrategy=all) must refit identically")
    val accTest = r1.map(r => r._1 -> r._4).toMap.apply("test")
    // bagged axis-aligned trees vs the planted LINEAR boundary: same band
    // as GBT (observed 0.78 at sf0.001; chance ~0.5, Bayes ~0.88)
    assert(accTest >= 0.72, s"held-out accuracy $accTest below floor")
    assert(accTest <= 0.95, s"held-out accuracy $accTest above the Bayes " +
      "rate — label noise leaked into the features?")
  }

  test("als: held-out RMSE far below the global-mean baseline (planted rank-1)") {
    val r1 = als()
    assert(r1 == als(), "seeded ALS must refit identically in-session")
    val byCase = r1.map(r => r._1 -> r).toMap
    val (_, nTest, rmseTest, rmseBase) = byCase("test")
    assert(nTest > 0, "cold-start drop must leave scored test pairs")
    // planted r = a·b + 0.1·noise: baseline sd ≈ 0.6, a recovered rank-1
    // surface sits near the 0.03 noise floor (observed 0.075 at sf0.001)
    assert(rmseTest < 0.35 && rmseTest < 0.6 * rmseBase,
      s"held-out rmse $rmseTest not far enough below baseline $rmseBase")
    val (_, _, rmseTrain, _) = byCase("train")
    assert(rmseTrain < 0.35, s"train rmse $rmseTrain out of band")
  }

  test("isotonic: fitted values equal a driver PAVA, curve monotone, calibration beats chance") {
    val d = graft.queries.Ml.isotonicFrame(spark, sf)
    // driver PAVA: pre-pool equal x, then stack-based pooling
    val pts = d.as[(Double, Double)].collect()
    val groupedX = pts.groupBy(_._1).toVector.sortBy(_._1)
      .map { case (x, rs) => (x, rs.map(_._2).sum, rs.length.toDouble) }
    val blocks = scala.collection.mutable.ArrayBuffer[(Double, Double, List[Double])]()
    groupedX.foreach { case (x, s, w) =>
      blocks += ((s, w, List(x)))
      while (blocks.length >= 2 &&
             blocks(blocks.length - 2)._1 / blocks(blocks.length - 2)._2 >=
             blocks.last._1 / blocks.last._2) {
        val b2 = blocks.remove(blocks.length - 1)
        val b1 = blocks.remove(blocks.length - 1)
        blocks += ((b1._1 + b2._1, b1._2 + b2._2, b1._3 ++ b2._3))
      }
    }
    val pavaFit: Map[Double, Double] = blocks.flatMap { case (s, w, xs) =>
      xs.map(_ -> s / w)
    }.toMap
    val fitted = pavaFit.toVector.sortBy(_._1).map(_._2)
    assert(fitted == fitted.sorted, "driver PAVA must be non-decreasing")

    import org.apache.spark.ml.regression.IsotonicRegression
    val model = new IsotonicRegression().setFeaturesCol("x").setLabelCol("y").fit(d)
    val mlFit = model.transform(d.select($"x").distinct())
      .select($"x", $"prediction").as[(Double, Double)].collect().toMap
    assert(mlFit.keySet == pavaFit.keySet)
    val maxDiff = mlFit.map { case (x, p) => math.abs(p - pavaFit(x)) }.max
    assert(maxDiff < 1e-6, s"MLlib vs driver PAVA max diff $maxDiff")

    val key = SparkEntry.queries("m_ml_isotonic")(spark, sf)
      .as[(Long, Int, Double)].collect().toList
    assert(key == SparkEntry.queries("m_ml_isotonic")(spark, sf)
      .as[(Long, Int, Double)].collect().toList, "refit must be identical")
    val (n, nb, mse) = key.head
    assert(n == pts.length.toLong && nb >= 2)
    // planted monotone signal: calibration must beat the constant-0.5
    // predictor (mse 0.25) with real headroom
    assert(mse < 0.2, s"calibration mse $mse shows no recovered signal")
  }

  private def pca() = SparkEntry.queries("m_ml_pca")(spark, sf)
    .as[(Int, Long, Double, Double)].collect().toList.sortBy(_._1)

  test("pca: evr descending, projections reproduce the eigenvalues, basis orthonormal, ≡ driver eigen") {
    val r1 = pca()
    assert(r1 == pca(), "same data must decompose identically in-session")
    assert(r1.map(_._1) == List(0, 1, 2, 3, 4))
    val evrs = r1.map(_._3)
    assert(evrs == evrs.sorted.reverse, s"evr must be non-increasing: $evrs")
    assert(evrs.forall(v => v > 0 && v < 1) && evrs.sum < 1.0)

    // driver-side reference: sample covariance eigenvalues via breeze
    val rows = Tables(spark, sf, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val n = rows.length; val dim = rows.head.length
    val mean = Array.tabulate(dim)(j => rows.map(_(j)).sum / n)
    val cov = breeze.linalg.DenseMatrix.tabulate(dim, dim) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)
    }
    val eig = breeze.linalg.eigSym(cov)
    val evals = eig.eigenvalues.toArray.sorted.reverse
    val total = evals.sum
    r1.foreach { case (k, cnt, evr, projVar) =>
      assert(cnt == n.toLong)
      // MLlib's evr vs the driver eigendecomposition of the same covariance
      assert(math.abs(evr - evals(k) / total) < 1e-4,
        s"component $k: evr $evr vs driver ${evals(k) / total}")
      // the DISTRIBUTED projection variance must reproduce the eigenvalue
      assert(math.abs(projVar - evals(k)) < 1e-3,
        s"component $k: projection variance $projVar vs eigenvalue ${evals(k)}")
    }

    // basis orthonormality (the 64×5 loading matrix the transform broadcasts)
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val d = Tables(spark, sf, "embeddings")
      .withColumn("features", array_to_vector($"embedding"))
    val m = new PCA().setInputCol("features").setOutputCol("pc").setK(5).fit(d)
    val pc = m.pc
    for (a <- 0 until 5; b <- a until 5) {
      val dot = (0 until pc.numRows).map(i => pc(i, a) * pc(i, b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"pc($a)·pc($b) = $dot, want $want")
    }
  }

  test("linreg: stable across runs, held-out R2 floor on the real n_chars relation") {
    val r1 = linreg()
    assert(r1 == linreg(), "same data + hyperparameters must refit identically")
    val byCase = r1.map(r => r._1 -> r).toMap
    val (_, _, rmseTest, r2Test) = byCase("test")
    assert(r2Test >= 0.95, s"held-out R2 $r2Test below floor (observed 0.995)")
    assert(rmseTest < 30.0, s"held-out rmse $rmseTest out of band")
    val (_, _, _, r2Train) = byCase("train")
    assert(r2Train >= 0.95, s"train R2 $r2Train below floor")
  }

  test("q_ml_confusion equals a driver confusion sweep; curve invariants hold") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q_ml_confusion")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList.sortBy(_._1)
    assert(got.map(_._1) == (50L to 450L by 50L).toList)
    val rows = Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().toList
    val p = rows.count(_._1 == "purchase").toLong
    val nn = rows.size.toLong - p
    got.foreach { case (thr, tp, fp, fn, tn) =>
      val etp = rows.count { case (t, v) => t == "purchase" && v >= thr }
      val efp = rows.count { case (t, v) => t == "click" && v >= thr }
      assert((tp, fp) == (etp.toLong, efp.toLong), s"thr=$thr")
      assert(fn == p - tp && tn == nn - fp)
    }
    // raising the threshold can only shrink both flagged sets
    got.sliding(2).foreach { case List(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3)
    case _ => ()
    }
  }

  private def rnd(x: Double, s: Int) =
    new java.math.BigDecimal(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue

  test("q_ml_auc equals a brute-force Mann-Whitney pair count") {
    val Array(row) = SparkEntry.queries("q_ml_auc")(spark, sf).collect()
    val (np, nn, auc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val rows = Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .selectExpr("event_type", "CAST(floor(value) AS BIGINT) AS b")
      .as[(String, Long)].collect().toList
    val pos = rows.filter(_._1 == "purchase").map(_._2)
    val neg = rows.filter(_._1 == "click").map(_._2)
    assert(np == pos.size.toLong && nn == neg.size.toLong)
    // the identity the key relies on, checked the EXPENSIVE way: every
    // (pos, neg) pair scored directly — wins count 2, ties 1 (doubled
    // midranks), so u2/2 is the Mann-Whitney U with tie correction
    val u2 = (for (a <- pos; b <- neg)
      yield if (a > b) 2L else if (a == b) 1L else 0L).sum
    assert(auc == rnd(u2.toDouble / (2.0 * np * nn), 6))
    assert(auc > 0.0 && auc < 1.0)
  }

  test("q_ml_calibration equals a driver reliability recount") {
    val got = SparkEntry.queries("q_ml_calibration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList.sortBy(_._1)
    assert(got.nonEmpty && got.map(_._1).distinct == got.map(_._1))
    val rows = Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("value"), col("event_type")).as[(Double, String)]
      .collect().toList
      .map { case (v, t) => (v / 500.0, if (t == "purchase") 1.0 else 0.0,
        math.min(math.floor(v / 50.0).toLong, 9L)) }
    def dec8(x: Double) =
      new java.math.BigDecimal(x).setScale(8, java.math.RoundingMode.HALF_UP)
    val nAll = rows.size.toLong
    val brierWant = rnd(
      rows.map { case (p, y, _) => dec8((p - y) * (p - y)) }
        .reduce(_ add _).doubleValue / nAll, 6)
    got.foreach { case (bin, n, meanPred, fracPos, brier) =>
      val mine = rows.filter(_._3 == bin)
      assert(n == mine.size.toLong, s"bin=$bin")
      assert(meanPred ==
        rnd(mine.map(r => dec8(r._1)).reduce(_ add _).doubleValue / n, 6))
      assert(fracPos == rnd(mine.count(_._2 == 1.0).toDouble / n, 6))
      assert(brier == brierWant)
      assert(meanPred >= 0.0 && meanPred <= 1.0 && fracPos >= 0.0 && fracPos <= 1.0)
    }
  }

  test("q_ml_ndcg equals a driver recomputation with independently derived gains") {
    val got = SparkEntry.queries("q_ml_ndcg")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toList
    assert(got.nonEmpty && got.exists(_._5.isDefined))
    // gains RE-DERIVED here (round(log2(j+1)^-1, 6)), never imported from
    // the key — a wrong embedded constant would fail this, not echo it
    val g = (1 to 10).map(j => new java.math.BigDecimal(
      math.log(2.0) / math.log(j + 1.0))
      .setScale(6, java.math.RoundingMode.HALF_UP))
    val byUser = Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("value"), col("event_id"), col("event_type"))
      .as[(Long, Double, Long, String)].collect().toList.groupBy(_._1)
    assert(got.map(_._1).toSet == byUser.keySet)
    got.foreach { case (u, nEvents, nPos, dcg, ndcg) =>
      val rel = byUser(u).sortBy(r => (-r._2, r._3)).map(_._4 == "purchase")
      assert(nEvents == rel.size.toLong && nPos == rel.count(identity).toLong, s"user=$u")
      val dcgWant = rel.take(10).zipWithIndex
        .collect { case (true, i) => g(i) }
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      assert(dcg == dcgWant.doubleValue, s"user=$u dcg")
      ndcg match {
        case None => assert(nPos == 0L, s"user=$u null ndcg")
        case Some(v) =>
          val idcg = g.take(math.min(10, nPos.toInt))
            .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
          assert(v == rnd(dcgWant.doubleValue / idcg.doubleValue, 6), s"user=$u ndcg")
          // rearrangement bound: gains decrease, so dcg <= idcg always
          assert(v >= 0.0 && v <= 1.0, s"user=$u range")
      }
    }
    // the statistic itself: all positives ranked first is exactly 1
    val perfect = List(true, true, false, false)
    val d = perfect.take(10).zipWithIndex.collect { case (true, i) => g(i) }
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    val i2 = g.take(2).foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    assert(d.doubleValue / i2.doubleValue == 1.0)
  }

  test("mlp: seeded fit is run-to-run stable, held-out accuracy in the linear band") {
    def mlp() = SparkEntry.queries("m_ml_mlp")(spark, sf)
      .as[(String, Long, Long, Double)].collect().toList
    val r1 = mlp()
    assert(r1 == mlp(), "seeded L-BFGS MLP must refit identically")
    val byCase = r1.map(r => r._1 -> r).toMap
    val (_, _, _, accTest) = byCase("test")
    // a 2-4-2 net on the planted LINEAR ~12% noise boundary: must at least
    // approach the linear models' band, cannot beat the Bayes rate
    assert(accTest >= 0.72 && accTest <= 0.95, s"held-out accuracy $accTest")
    val (_, _, _, accTrain) = byCase("train")
    assert(accTrain >= accTest - 0.05, s"train $accTrain well below test $accTest")
  }

  test("model persistence: write → load → score parity (logreg, gbt)") {
    // the MLWritable seam every production pipeline crosses between
    // training and serving: fit, save, load in a fresh object, and pin
    // row-for-row IDENTICAL predictions — not just aggregate accuracy
    import org.apache.spark.ml.classification.{
      GBTClassificationModel, GBTClassifier,
      LogisticRegression, LogisticRegressionModel}
    val d = graft.queries.Ml.logregFrame(spark, sf)
    val train = d.filter($"split" === "train")
    val tmp = java.nio.file.Files.createTempDirectory("graft-mlio").toString

    def scores(m: org.apache.spark.ml.Transformer): Map[Long, (Double, Double)] =
      m.transform(d)
        .select($"event_id",
          org.apache.spark.ml.functions.vector_to_array($"probability")(1)
            .as("p1"),
          $"prediction")
        .as[(Long, Double, Double)].collect()
        .map { case (id, p, y) => id -> ((p, y)) }.toMap

    val lr = new LogisticRegression().setMaxIter(50).setRegParam(0.0)
      .fit(train)
    lr.write.overwrite().save(s"$tmp/lr")
    val lr2 = LogisticRegressionModel.load(s"$tmp/lr")
    assert(lr2.coefficients == lr.coefficients && lr2.intercept == lr.intercept,
      "loaded logreg coefficients differ from the fitted model")
    assert(scores(lr2) == scores(lr),
      "loaded logreg must score every row identically")

    val gbt = new GBTClassifier()
      .setMaxIter(10).setMaxDepth(3).setStepSize(0.3).setSeed(42L)
      .fit(train)
    gbt.write.overwrite().save(s"$tmp/gbt")
    val gbt2 = GBTClassificationModel.load(s"$tmp/gbt")
    assert(gbt2.trees.length == gbt.trees.length &&
           gbt2.treeWeights.toSeq == gbt.treeWeights.toSeq,
      "loaded GBT ensemble shape differs from the fitted model")
    assert(scores(gbt2) == scores(gbt),
      "loaded GBT must score every row identically")
  }

  test("ml.Pipeline: assembler → logreg composes, saves, loads, scores row-identically") {
    // The composition seam every production MLlib user crosses: raw
    // columns → VectorAssembler → estimator inside ONE Pipeline, fit as a
    // unit, persisted as a unit, reloaded in a fresh object — predictions
    // must match row for row, not just in aggregate.
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val d = graft.queries.Ml.logregFrame(spark, sf).drop("features")
    val train = d.filter($"split" === "train")
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x1", "x2"))
        .setOutputCol("features"),
      new LogisticRegression().setMaxIter(50).setRegParam(0.0)))
    val pm = pipe.fit(train)

    def scores(m: org.apache.spark.ml.Transformer): Map[Long, Double] =
      m.transform(d).select($"event_id", $"prediction")
        .as[(Long, Double)].collect().toMap

    val tmp = java.nio.file.Files.createTempDirectory("graft-pipeio").toString
    pm.write.overwrite().save(s"$tmp/pipe")
    val pm2 = PipelineModel.load(s"$tmp/pipe")
    assert(pm2.stages.length == 2, "loaded pipeline must keep both stages")
    assert(scores(pm2) == scores(pm),
      "loaded pipeline must score every row identically")
    // quality floor: the composed fit is the same model the persistence
    // test pins, so it must sit in the same planted-margin band
    val acc = pm.transform(d.filter($"split" === "test"))
      .select(avg(when($"prediction" === $"label", 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(acc >= 0.78, s"pipeline held-out accuracy $acc below floor")
  }

  test("TrainValidationSplit picks the working grid point over the collapsed one") {
    // The tuning seam: an L1 regParam grid where one point (10.0) zeroes
    // every coefficient — AUC 0.5 by construction — and the other (0.001)
    // barely regularizes. A correct TVS must (a) score the working point
    // higher on its validation split and (b) return it as bestModel.
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
    val train = graft.queries.Ml.logregFrame(spark, sf).drop("features")
      .filter($"split" === "train")
    val lr = new LogisticRegression().setMaxIter(50).setElasticNetParam(1.0)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x1", "x2"))
        .setOutputCol("features"), lr))
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(10.0, 0.001)).build()
    val tvs = new TrainValidationSplit().setEstimator(pipe)
      .setEvaluator(new BinaryClassificationEvaluator()) // areaUnderROC
      .setEstimatorParamMaps(grid).setTrainRatio(0.75).setSeed(42L)
    val tm = tvs.fit(train)

    val metrics = grid.map(_.get(lr.regParam).get).zip(tm.validationMetrics).toMap
    assert(metrics(0.001) > metrics(10.0) + 0.2,
      s"validation AUCs $metrics must separate the collapsed L1 point")
    val bestLr = tm.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages(1).asInstanceOf[LogisticRegressionModel]
    assert(bestLr.getRegParam == 0.001,
      s"best regParam ${bestLr.getRegParam}, want the working point 0.001")
    assert(bestLr.coefficients.toArray.exists(_ != 0.0),
      "best model must carry non-zero coefficients")
  }

  test("CrossValidator: k-fold CV picks the working grid point; fold metrics average sanely") {
    // The k-fold twin of the TVS seam (r14 verdict missing #3): same
    // collapsed-vs-working L1 grid, 3 folds — CV must (a) separate the
    // two points on AVERAGED fold metrics, (b) return the working point
    // as bestModel, and (c) refit it on the FULL training frame (the CV
    // contract: bestModel trains on all folds' union).
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val train = graft.queries.Ml.logregFrame(spark, sf).drop("features")
      .filter($"split" === "train")
    val lr = new LogisticRegression().setMaxIter(50).setElasticNetParam(1.0)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x1", "x2"))
        .setOutputCol("features"), lr))
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(10.0, 0.001)).build()
    val cv = new CrossValidator().setEstimator(pipe)
      .setEvaluator(new BinaryClassificationEvaluator()) // areaUnderROC
      .setEstimatorParamMaps(grid).setNumFolds(3).setSeed(42L)
    val cm = cv.fit(train)

    val metrics = grid.map(_.get(lr.regParam).get).zip(cm.avgMetrics).toMap
    // the collapsed point scores AUC 0.5 on EVERY fold; averaging across
    // folds cannot rescue it
    assert(metrics(0.001) > metrics(10.0) + 0.2,
      s"averaged fold AUCs $metrics must separate the collapsed L1 point")
    assert(math.abs(metrics(10.0) - 0.5) < 0.05,
      s"collapsed point should average ~0.5 AUC, got ${metrics(10.0)}")
    val bestLr = cm.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages(1).asInstanceOf[LogisticRegressionModel]
    assert(bestLr.getRegParam == 0.001,
      s"best regParam ${bestLr.getRegParam}, want the working point 0.001")
    // (c): the final refit sees the full frame — its coefficient direction
    // must match the planted (+x1, -x2), like the direct fit does
    val c = bestLr.coefficients
    assert(c(0) > 0 && c(1) < 0, s"refit direction $c, want (+, -)")
    // determinism: same seed, same data → identical averaged metrics
    val again = cv.fit(train)
    assert(again.avgMetrics.toSeq == cm.avgMetrics.toSeq, "CV must be seeded-deterministic")
  }
}
