package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-step event funnel: for each key, the first `stepA` event and the
  * first `stepB` event that follows it within `horizon` — conversion
  * rate and latency, the signup→purchase / impression→click shape of
  * product analytics.
  *
  * Plan shape: ONE hash-partition exchange on the key feeds both a
  * per-key window (first-A timestamp) and the final aggregate — no
  * self-join, no second shuffle of the events. Keys with no stepA event
  * are excluded (a funnel starts at its first step); keys with stepA
  * but no in-horizon stepB surface with `converted = false` and null
  * first-B/latency.
  */
object Funnel {

  /** `tsCol` is integral event time (e.g. epoch micros); `horizon` is in
    * the same unit, inclusive. Output: (key, first_a, first_b nullable,
    * converted, latency nullable, same unit). */
  def twoStep(events: DataFrame, key: String, typeCol: String,
              tsCol: String, stepA: String, stepB: String,
              horizon: Long): DataFrame = {
    require(horizon >= 0, s"horizon must be non-negative, got $horizon")
    require(!events.columns.contains("__first_a"),
      "twoStep appends a __first_a working column — the input already " +
        "has one; rename it first")
    val w = Window.partitionBy(col(key))
    val withA = events.withColumn("__first_a",
      min(when(col(typeCol) === stepA, col(tsCol))).over(w))
    withA
      .filter(col("__first_a").isNotNull)
      .groupBy(col(key))
      .agg(
        min(col("__first_a")).as("first_a"),
        min(when(col(typeCol) === stepB &&
            col(tsCol) >= col("__first_a") &&
            col(tsCol) <= col("__first_a") + horizon,
          col(tsCol))).as("first_b"))
      .withColumn("converted", col("first_b").isNotNull)
      .withColumn("latency", col("first_b") - col("first_a"))
  }
}
