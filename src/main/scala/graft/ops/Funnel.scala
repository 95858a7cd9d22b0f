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

  /** N-step ordered funnel with a PER-STEP gap bound: for each key the
    * greedy earliest-completion chain t₁ < t₂ < … < tₙ where tᵢ is the
    * first `steps(i)` event after tᵢ₋₁ within `maxGap` — the product-
    * analytics "signup → activate → purchase within a day each" query.
    * Greedy-earliest is the standard semantics AND the correct one: if
    * any valid chain exists, the greedy chain exists (each greedy tᵢ is
    * ≤ the corresponding step of any other chain, so every later
    * window only widens).
    *
    * Output: (key, reached, t_final) for every key with a step-1 event:
    * `reached` = number of steps completed (1..n), `t_final` the
    * completion time of the last reached step.
    *
    * Plan shape: conditional-min aggregations over ONE hash exchange on
    * the key — step i is min(ts WHERE type = stepᵢ AND tᵢ₋₁ < ts ≤
    * tᵢ₋₁+gap), computable because tᵢ₋₁ is itself a per-key window min.
    * n−1 window passes share the single partitioning (no re-shuffle:
    * same key), no self-joins, no per-key UDAF state. */
  def orderedFunnel(events: DataFrame, key: String, typeCol: String,
                    tsCol: String, steps: Seq[String],
                    maxGap: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(maxGap > 0, s"maxGap must be positive, got $maxGap")
    val working = steps.indices.map(i => s"__t$i")
    val clash = events.columns.toSet.intersect(working.toSet)
    require(clash.isEmpty,
      s"orderedFunnel appends ${working.mkString(", ")} — input already has: $clash")
    val w = Window.partitionBy(col(key))
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step &&
          col(tsCol) > col(s"__t${i - 1}") &&
          col(tsCol) <= col(s"__t${i - 1}") + maxGap
      df.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    val reached = steps.indices.map(i =>
      when(col(s"__t$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    val tFinal = coalesce(steps.indices.reverse.map(i => col(s"__t$i")): _*)
    withTs
      .filter(col("__t0").isNotNull)
      .select(col(key), reached.as("reached"), tFinal.as("t_final"))
      .dropDuplicates(key) // per-key constants — one row per key
  }
}
