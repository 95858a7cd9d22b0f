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

  /** Robust (median/MAD) z-score per key — the outlier-RESISTANT
    * complement of [[rollingZ]]'s mean/stddev: a handful of extreme
    * points inflate a stddev baseline until they mask each other
    * (masking), while the median and the median absolute deviation
    * have a 50% breakdown point. Scores the modified z of
    * Iglewicz & Hoaglin (1993): M = 0.6745·(x − median)/MAD, with the
    * conventional |M| > 3.5 cut (`threshold`).
    *
    * Medians are EXACT interpolated percentiles over each key group
    * (two grouped aggregation passes — value median, then deviation
    * median — plus the join-backs; nothing quadratic, nothing
    * driver-side). A zero-MAD group (over half the values identical)
    * scores null, not infinity. As in [[rollingZ]], the double score
    * downcasts to FLOAT before the threshold compare, so a 1-ulp
    * divergence in percentile interpolation cannot flip the flag. */
  def robustZ(df: DataFrame, keys: Seq[String], value: String,
              threshold: Double = 3.5): DataFrame = {
    require(keys.nonEmpty, "robustZ needs at least one key column")
    val reserved = Seq("__med", "__mad", "robust_z", "is_anomaly")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"robustZ appends columns ${reserved.mkString(", ")} — " +
        s"the input already has: $clash; rename first")
    val med = df.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(expr(s"percentile(`$value`, 0.5)").as("__med"))
    val withMed = df.join(med, keys, "left")
    val mad = withMed.filter(col(value).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(expr(s"percentile(abs(`$value` - __med), 0.5)").as("__mad"))
    withMed.join(mad, keys, "left")
      .withColumn("robust_z",
        (lit(0.6745) * (col(value) - col("__med")) /
          nullif(col("__mad"), lit(0.0))).cast("float"))
      .drop("__med", "__mad")
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }

  /** One-sided CUSUM drift detection (Page's test) in EXACT integer
    * cents: alarm when the cumulative upward (or downward) deviation
    * from a target mean exceeds a decision threshold — the classic
    * sequential change-point detector for pipeline telemetry (a data
    * source whose mean quietly drifts poisons training data long before
    * any single point trips a z-score gate).
    *
    * The textbook recursion S_t = max(0, S_{t−1} + (x_t − μ0 − k)) is
    * not window-expressible, but has the closed form
    * S_t = R_t − min_{j ≤ t}(R_j) over the running sum
    * R_t = Σ(x − μ0 − k) with R_0 = 0 — one running sum plus one
    * running min, both over the same unbounded-preceding frame: a
    * single window pass, exact in integer arithmetic, no recursion.
    * The mirrored statistic uses −(x − μ0 + k) for downward drift.
    *
    * `targetCents`, `slackCents` (k) and `decisionCents` (h) are integer
    * cents. Emits `cusum_up`, `cusum_down` (bigint cents) and
    * `drift` ∈ {'up','down',null}. Null values pass through with null
    * statistics (they contribute nothing to the running sums). */
  def cusum(df: DataFrame, partition: Seq[String], order: Seq[String],
            value: String, targetCents: Long, slackCents: Long = 0L,
            decisionCents: Long = 1L): DataFrame = {
    require(slackCents >= 0, s"slackCents must be >= 0, got $slackCents")
    require(decisionCents > 0, s"decisionCents must be > 0, got $decisionCents")
    val reserved = Seq("cusum_up", "cusum_down", "drift", "__ru", "__rd")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"cusum appends columns ${reserved.mkString(", ")} — " +
        s"the input already has: $clash; rename first")
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cents = Indicators.toCents(col(value))
    val up = cents - lit(targetCents) - lit(slackCents)
    val down = -(cents - lit(targetCents) + lit(slackCents))
    // two window passes over ONE partitioning (running sums, then their
    // running mins — Spark disallows nesting them in one expression);
    // the least(…, 0) injects R_0 = 0 into the min, the closed form's
    // empty-prefix term. Null values contribute nothing to the sums and
    // surface null statistics.
    df.withColumn("__ru", sum(up).over(w))
      .withColumn("__rd", sum(down).over(w))
      .withColumn("cusum_up", when(cents.isNotNull,
        col("__ru") - least(min(col("__ru")).over(w), lit(0L))))
      .withColumn("cusum_down", when(cents.isNotNull,
        col("__rd") - least(min(col("__rd")).over(w), lit(0L))))
      .drop("__ru", "__rd")
      .withColumn("drift",
        when(col("cusum_up") > decisionCents, "up")
          .when(col("cusum_down") > decisionCents, "down"))
  }
}
