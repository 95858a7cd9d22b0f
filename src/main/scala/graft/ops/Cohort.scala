package graft.ops

import org.apache.spark.sql.DataFrame
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
}
