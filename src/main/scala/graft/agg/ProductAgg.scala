package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Exact multiplicative aggregate: product of non-null inputs.
  *
  * The reference compounds returns with a cumulative product
  * (reference: scripts/app.py:47-51, `(1+daily_return).cumprod()`).
  * Spark has no built-in product aggregate; this Aggregator is the exact
  * form, usable both as a grouping aggregate and as a window function.
  * The `exp(sum(ln(x)))` rewrite (valid for x > 0) is the
  * codegen-friendly alternative in [[graft.ops.Returns.cumulativeReturn]];
  * the two are property-tested for agreement.
  *
  * Null inputs are ignored (SQL aggregate semantics); an all-null or empty
  * group yields 1.0 (the multiplicative identity), which callers can remap.
  */
class ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a.doubleValue()
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ProductAgg {
  private lazy val udafProduct = functions.udaf(new ProductAgg)

  /** `product(col)` as a Column, usable in `agg` and `over(window)`. */
  def product(c: Column): Column = udafProduct(c)
}
