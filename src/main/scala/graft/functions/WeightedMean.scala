package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted-mean accumulator: (value, weight) pairs → Σ(v·w)/Σw. */
case class WMBuf(num: Double, den: Long)

/** Custom TYPED aggregate via `org.apache.spark.sql.expressions.Aggregator`
  * — the Dataset-API counterpart of a Catalyst `TypedImperativeAggregate`:
  * merge-based (map-side partial aggregation works: `reduce` per partition,
  * `merge` across), codegen-compatible through the udaf bridge, and usable
  * both as a typed `TypedColumn` and as a registered SQL function
  * (`weighted_mean(v, w)`).
  *
  * Shape notes for 100 TB: the buffer is 16 bytes regardless of input
  * volume; merge is associative+commutative so Spark can combine partials
  * in any tree shape. Double addition IS order-sensitive in the last ulps —
  * fine for analytics columns; for money-grade output use the decimal
  * carriers in [[graft.operators.Det]] instead.
  */
class WeightedMeanAgg
    extends Aggregator[(java.lang.Double, java.lang.Long), WMBuf, Double] {
  def zero: WMBuf = WMBuf(0.0, 0L)
  // boxed input + null skip: SQL aggregates ignore NULL rows (a primitive
  // (Double, Long) input type would instead CRASH the job on the first
  // null — 'Null value appeared in non-nullable field')
  def reduce(b: WMBuf, a: (java.lang.Double, java.lang.Long)): WMBuf =
    if (a._1 == null || a._2 == null) b
    else WMBuf(b.num + a._1 * a._2, b.den + a._2)
  def merge(x: WMBuf, y: WMBuf): WMBuf = WMBuf(x.num + y.num, x.den + y.den)
  def finish(b: WMBuf): Double = if (b.den == 0) 0.0 else b.num / b.den
  def bufferEncoder: Encoder[WMBuf] = Encoders.product[WMBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMeanAgg {
  /** Register as the SQL function `weighted_mean(value, weight)`. */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    s.udf.register("weighted_mean",
      org.apache.spark.sql.functions.udaf(new WeightedMeanAgg,
        Encoders.tuple(Encoders.DOUBLE, Encoders.LONG)))
}
