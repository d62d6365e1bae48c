package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean of positive doubles as a typed `Aggregator` — the UDAF
  * surface of SURVEY §2.12. Register with `functions.udaf(GeomMean)`.
  *
  * Merge-associative (sum of logs + count), so partial aggregation works
  * map-side like any built-in agg. The declared contract query
  * (`q_udaf_geomean`) uses the decimal-exact log-sum formulation for oracle
  * parity; this Aggregator is the reusable library form, unit-tested against
  * it within double tolerance. */
object GeomMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
