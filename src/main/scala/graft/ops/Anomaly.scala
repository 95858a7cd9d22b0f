package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection: flag points that deviate from
  * their OWN trailing history — the telemetry/metrics-quality gate that
  * pairs with [[Volatility.rollingStd]] (reference:
  * scripts/transform.py:71-76 computes the same trailing dispersion;
  * this operator closes the loop by scoring each point against it).
  *
  * The baseline window is the `window` rows STRICTLY BEFORE the current
  * row (`-window .. -1`): a genuine outlier must not dilute its own
  * baseline, and the score of row i is independent of value i's
  * magnitude entering the mean/std. Warm-up rows with fewer than
  * `minSamples` history rows score null (insufficient evidence), as do
  * zero-variance baselines (z undefined) — both match
  * `stddev_samp`/`nullif` semantics in any ANSI engine.
  *
  * Plan shape: one hash exchange on the key, one sort on
  * (key, ts, tiebreak); `avg`, `stddev_samp` and `count` share the same
  * window frame so Spark evaluates them in a single window pass. Linear
  * at 100 TB; per-key state is the frame buffer (`window` rows).
  */
object Anomaly {

  /** Append `z` = (value − trailing mean) / trailing sample stddev and
    * `is_anomaly` = |z| > threshold (null-safe: null z → false). The
    * double z is downcast to FLOAT before the threshold compare so a
    * 1-ulp cross-engine divergence in the double window math cannot
    * flip the flag (same convention as the w2/w_drawdown queries).
    */
  def rollingZ(df: DataFrame, partition: Seq[String], order: Seq[String],
               value: String, window: Int = 20, minSamples: Int = 5,
               threshold: Double = 3.0): DataFrame = {
    require(window >= minSamples && minSamples >= 2,
      s"need window >= minSamples >= 2, got window=$window minSamples=$minSamples")
    val reserved = Seq("__n_hist", "z", "is_anomaly")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"rollingZ appends columns ${reserved.mkString(", ")} — " +
        s"the input already has: $clash; rename first")
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(-window, -1)
    df.withColumn("__n_hist", count(col(value)).over(w))
      .withColumn("z",
        when(col("__n_hist") >= minSamples,
          ((col(value) - avg(col(value)).over(w)) /
            nullif(stddev_samp(col(value)).over(w), lit(0.0))).cast("float")))
      .drop("__n_hist")
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
  }
}
