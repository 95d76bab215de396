package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example (`Aggregator[IN, BUF, OUT]`): discount-weighted
  * mean. Demonstrates the custom-aggregate surface of the engine; the
  * buffer merges associatively so partial aggregation happens map-side
  * like any builtin aggregate.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted_mean(value, weight). */
  def weighted_mean(value: Column, weight: Column): Column = {
    import org.apache.spark.sql.functions.{struct, udaf}
    udaf(WeightedMean).apply(value, weight)
  }
}
