package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the `Aggregator[IN, BUF, OUT]` surface from
  * SURVEY §2.2's UDAF row): exact weighted mean with a decimal-free
  * (sum, weight) buffer. Merge is associative/commutative, so Spark can run
  * it as a standard partial aggregation — map-side combine included.
  *
  * Inputs are OPTION-typed so nullable columns aggregate instead of
  * aborting: the old primitive (Double, Double) IN type made the tuple
  * encoder's AssertNotNull throw on the first NULL in either column (r11
  * review). The null contract is "a pair with a null value OR a null
  * weight is skipped entirely" — a weight without a value must not inflate
  * the denominator, which is also why this differs (deliberately) from the
  * bare `sum(p*w)/sum(w)` expression form, where a null value still lets
  * its weight into `sum(w)`.
  */
class WeightedMean
    extends Aggregator[(Option[Double], Option[Double]), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double),
      a: (Option[Double], Option[Double])): (Double, Double) = (a._1, a._2) match {
    case (Some(v), Some(w)) => (b._1 + v * w, b._2 + w)
    case _ => b
  }
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
