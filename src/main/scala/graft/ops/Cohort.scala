package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: bucket each key by its first-activity period and count,
  * for each (cohort, period-offset) cell, how many keys were active —
  * the standard retention triangle behind every product-analytics
  * dashboard, generalized from the reference's per-ticker
  * latest-vs-first relative series (app.py:171-189).
  *
  * Periods are INTEGRAL (floor-divided epoch ticks), not calendar
  * truncations: integer division is exact, engine-portable, and immune
  * to week-start / timezone conventions that differ between engines.
  *
  * Plan shape: ONE hash exchange on the key, then one on the
  * (cohort, offset) cell grid. The per-key pass is a single
  * `groupBy(key)` whose state is (min period, distinct-period set) — the
  * set is bounded by the number of periods in the corpus (weeks in the
  * retention horizon, dozens), NOT by activity volume, so the aggregate
  * state stays tiny even for a key with billions of events. No joins,
  * no windows, no per-event shuffle rows beyond the first map-side
  * combine.
  */
object Cohort {

  /** (cohort_period, period_offset, n_active) — one row per non-empty
    * retention cell; `cohort_period` is the key's first active period
    * (`tsCol` div `periodLen`), `period_offset` ≥ 0 the distance in
    * periods, `n_active` the distinct keys from that cohort active at
    * that offset. `tsCol` must be integral epoch ticks (micros/nanos).
    */
  def retention(events: DataFrame, key: String, tsCol: String,
                periodLen: Long): DataFrame = {
    require(periodLen > 0, s"periodLen must be positive, got $periodLen")
    // integer `div`, NOT `/`: long / long is a DOUBLE divide in Spark, and
    // doubles cannot hold epoch-nanos (≈1.7e18 > 2^53) without rounding.
    // FLOOR division, not Spark's truncate-toward-zero `div` alone: for
    // pre-1970 timestamps (negative ticks) truncation rounds UP, which
    // both shifts the period boundary and diverges from engines whose
    // integer division floors (DuckDB `//`) — subtracting 1 whenever the
    // truncated remainder is negative makes the bucket exact and portable
    // for any sign (periodLen is required positive above, so the
    // remainder's sign is the dividend's).
    val perKey = events
      .select(col(key), expr(
        s"CAST($tsCol AS BIGINT) div $periodLen - " +
          s"(CASE WHEN CAST($tsCol AS BIGINT) % $periodLen < 0 THEN 1 ELSE 0 END)")
        .as("__p"))
      .groupBy(col(key))
      .agg(min(col("__p")).as("cohort_period"),
        collect_set(col("__p")).as("__ps"))
    perKey
      .select(col("cohort_period"), explode(col("__ps")).as("active_period"))
      .groupBy(col("cohort_period"),
        (col("active_period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Kaplan–Meier survival curve per cohort — retention's right-censored
    * sibling: [[retention]] counts who was active at each offset;
    * this estimates P(lifetime > t) when the observation window cuts
    * some lifetimes short (a user still active at the lake's edge is
    * CENSORED, not churned, and treating them as churned biases every
    * curve down — the mistake the estimator exists to avoid).
    *
    * Input: one row per subject — (`cohort`, `duration` ≥ 0 integral,
    * `observed` 1 = the terminal event happened / 0 = censored).
    * Output: one row per (cohort, distinct duration) with the risk set
    * `n_risk`, terminal events `n_event`, censored exits `n_censored`,
    * and `survival` = Π_{u ≤ t} (1 − d_u/n_u).
    *
    * Exactness: each factor is one double division of two exact counts;
    * the running product multiplies them in duration order via the
    * exact [[graft.agg.ProductAgg]] window aggregate — the same
    * sequential fold DuckDB's windowed `product()` performs, so both
    * engines replay the curve bit-for-bit (surface FLOAT per the
    * ratio-chain convention).
    *
    * Plan shape: one groupBy to the (cohort, duration) grid — bounded
    * by horizon length × cohorts, NOT subjects — then two window passes
    * over that tiny grid (a reverse cumulative sum for the risk set and
    * the product). Subject-granular data shuffles once. */
  def kaplanMeier(subjects: DataFrame, cohort: String, duration: String,
                  observed: String): DataFrame = {
    val grid = subjects
      .groupBy(col(cohort).as("cohort"), col(duration).cast("long").as("t"))
      .agg(sum(col(observed).cast("long")).as("n_event"),
        sum(lit(1L) - col(observed).cast("long")).as("n_censored"))
    val wAsc = Window.partitionBy(col("cohort")).orderBy(col("t"))
    // risk set at t = subjects whose duration ≥ t = total minus the
    // strictly-earlier exits: a reverse-cumulative count needs only the
    // ascending cumsum and the cohort total (no second ordered pass)
    val wAll = Window.partitionBy(col("cohort"))
    grid
      .withColumn("__exited_before",
        coalesce(sum(col("n_event") + col("n_censored"))
          .over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censored")).over(wAll) - col("__exited_before"))
      .withColumn("__factor",
        lit(1.0) - col("n_event").cast("double") / col("n_risk").cast("double"))
      .withColumn("survival",
        graft.agg.ProductAgg.product(col("__factor"))
          .over(wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("float"))
      .select(col("cohort"), col("t"), col("n_risk"), col("n_event"),
        col("n_censored"), col("survival"))
  }
}
