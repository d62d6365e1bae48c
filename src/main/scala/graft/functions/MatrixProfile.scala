package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Matrix profile of a time series (SURVEY §2.11b extension,
  * `m_time_matrixprofile`): for every length-`m` subsequence of a series,
  * the z-normalized Euclidean distance to its NEAREST non-trivial neighbor
  * subsequence — the one pass that surfaces both the strongest MOTIF (the
  * profile minimum: the most-repeated shape) and the strongest DISCORD
  * (the profile maximum: the shape least like anything else) of the whole
  * series, parameter-free beyond the window length (Yeh et al., ICDM 2016).
  *
  * Computed with the STOMP recurrence (Zhu et al., ICDM 2016): the sliding
  * dot product QT(i, j) = QT(i−1, j−1) − x[i−1]·x[j−1] + x[i+m−1]·x[j+m−1]
  * updates in O(1) per cell, so the full profile is O(n²) with a tiny
  * constant — no per-cell re-normalization, since
  * dist²(i, j) = 2m·(1 − (QT − m·μᵢ·μⱼ)/(m·σᵢ·σⱼ)) needs only the
  * prefix-sum means/sigmas. Trivial matches are excluded inside
  * |i − j| < m/2 (the standard exclusion zone), and the self-join
  * convention for flat windows is DECLARED: two zero-variance windows are
  * a perfect match (dist 0 — both z-normalize to the same degenerate
  * shape), one flat vs one moving window has correlation 0 (dist √(2m));
  * flatness is decided EXACTLY (constant-run scan), never by an epsilon
  * on the prefix-sum σ, whose cancellation noise would misread a constant
  * stretch after a long mixed prefix.
  * Pearson r is clamped to [−1, 1] before the final sqrt so FP drift in
  * the rolling QT can never produce a NaN.
  *
  * Returns the profile INTERLEAVED with its index: [d₀, j₀, d₁, j₁, ...]
  * (2·(n−m+1) doubles) — the nearest-neighbor index is what turns a motif
  * minimum into a motif PAIR. The nn index is the FIRST j attaining the
  * strict minimum (deterministic; no FP tie dance — equal distances keep
  * the earlier j).
  *
  * Scale shape: the kernel runs once per series INSIDE whole-stage codegen
  * (one evaluation per group row, the TrajSim discipline), so the
  * data-sized work stays in the hour-bucket hash aggregate that feeds it;
  * the O(n²) profile is TIME-RANGE-bounded, not data-bounded (n = grid
  * hours). The declared wall: a decade-hourly grid (87 600 points) costs
  * ~7.7 G cells/series — still one core-minute class, and the published
  * escape hatches (SCRIMP++'s anytime convergence, per-window chunked
  * profiles merged by min) are the documented path past it. Input shorter
  * than 2m throws loudly (callers filter; a silent empty profile would
  * read as "no motif" — wrong). */
case class MatrixProfileExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), IntegerType)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, m: Any): Any =
    MatrixProfileExpr.compute(a.asInstanceOf[ArrayData], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) =>
      s"${ev.value} = graft.functions.MatrixProfileExpr.compute($a, $m);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "matrix_profile"
}

object MatrixProfileExpr {

  def compute(a: ArrayData, m: Int): ArrayData = {
    val x = a.toDoubleArray()
    val n = x.length
    if (m < 2 || n < 2 * m)
      throw new IllegalArgumentException(
        s"matrix_profile: need window m >= 2 and series length >= 2m (got m=$m, n=$n)")
    val w = n - m + 1
    val excl = m / 2 // trivial-match zone: skip |i - j| < excl

    // Flat windows are detected EXACTLY (constant-run scan: window j is
    // flat iff the equal-value run ending at j+m−1 spans the window), not
    // by an epsilon on σ — the prefix-sum σ below carries cancellation
    // noise (~1e-7 after a long mixed prefix) that would misclassify a
    // genuinely constant stretch as "moving" and flip the declared
    // flat-window conventions.
    val flat = new Array[Boolean](w)
    var runLen = 1
    var i = 1
    while (i < n) {
      runLen = if (x(i) == x(i - 1)) runLen + 1 else 1
      if (i >= m - 1) flat(i - m + 1) = runLen >= m
      i += 1
    }
    if (m == 1) java.util.Arrays.fill(flat, true)

    // prefix means / sigmas (population σ over each window)
    val mu = new Array[Double](w)
    val sig = new Array[Double](w)
    var s = 0.0
    var s2 = 0.0
    i = 0
    while (i < n) {
      s += x(i); s2 += x(i) * x(i)
      if (i >= m) { s -= x(i - m); s2 -= x(i - m) * x(i - m) }
      if (i >= m - 1) {
        val j = i - m + 1
        mu(j) = s / m
        sig(j) = math.sqrt(math.max(0.0, s2 / m - mu(j) * mu(j)))
        if (!flat(j) && sig(j) < 1e-7) {
          // prefix cancellation can zero a real (tiny) σ; recompute this
          // window directly — rare, so the O(m) fallback costs nothing
          var mu2 = 0.0
          var k = 0
          while (k < m) { mu2 += x(j + k); k += 1 }
          mu2 /= m
          var v = 0.0
          k = 0
          while (k < m) { val d0 = x(j + k) - mu2; v += d0 * d0; k += 1 }
          mu(j) = mu2
          sig(j) = math.max(math.sqrt(v / m), Double.MinPositiveValue)
        }
      }
      i += 1
    }

    val prof = Array.fill(w)(Double.MaxValue)
    val nn = new Array[Int](w)
    val twoM = 2.0 * m

    @inline def dist(qt: Double, i: Int, j: Int): Double = {
      val fi = flat(i)
      val fj = flat(j)
      if (fi && fj) 0.0
      else if (fi || fj) math.sqrt(twoM) // r = 0 by declaration
      else {
        val r = (qt - m * mu(i) * mu(j)) / (m * sig(i) * sig(j))
        math.sqrt(twoM * (1.0 - math.max(-1.0, math.min(1.0, r))))
      }
    }
    @inline def consider(i: Int, j: Int, d: Double): Unit = {
      if (d < prof(i)) { prof(i) = d; nn(i) = j }
    }

    // row 0: brute dot products (O(n·m) once — the MASS/FFT path is the
    // published alternative; at m = 24 the brute row is cheaper)
    val qtRow = new Array[Double](w) // QT(i=current, j) diag-updated below
    var j = 0
    while (j < w) {
      var qt = 0.0
      var k = 0
      while (k < m) { qt += x(k) * x(j + k); k += 1 }
      qtRow(j) = qt
      if (j >= excl) { // |0 - j| >= excl
        val d = dist(qt, 0, j)
        consider(0, j, d)
        consider(j, 0, d)
      }
      j += 1
    }
    // rows 1..w-1: STOMP diagonal update, j descending so qtRow(j-1) is
    // still the previous row's value when row i reads it
    i = 1
    while (i < w) {
      j = w - 1
      while (j >= 1) {
        qtRow(j) = qtRow(j - 1) - x(i - 1) * x(j - 1) + x(i + m - 1) * x(j + m - 1)
        if (j > i && j - i >= excl) { // upper triangle only; mirror below
          val d = dist(qtRow(j), i, j)
          consider(i, j, d)
          consider(j, i, d)
        }
        j -= 1
      }
      // qtRow(0) = dot(window i, window 0) = QT(0, i) by symmetry — already
      // handled via the row-0 mirror; refresh it so the NEXT row's j=1
      // update starts from the true value
      var qt0 = 0.0
      var k = 0
      while (k < m) { qt0 += x(i + k) * x(k); k += 1 }
      qtRow(0) = qt0
      i += 1
    }

    val out = new Array[Double](2 * w)
    i = 0
    while (i < w) {
      out(2 * i) = prof(i)
      out(2 * i + 1) = nn(i).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "matrix_profile", exprs => MatrixProfileExpr(exprs(0), exprs(1)), "scala_udf")
  }

  def matrixProfile(series: Column, m: Column): Column =
    org.apache.spark.sql.functions.call_function("matrix_profile", series, m)
}
