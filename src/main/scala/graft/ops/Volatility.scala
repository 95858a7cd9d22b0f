package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-window dispersion metrics.
  *
  * Reference: `rolling_std(window_size=30, min_samples=1)` with ddof=1 per
  * ticker in date order (scripts/transform.py:71-76, scripts/config.py:40).
  * A single-row window has no sample variance → null, matching Polars'
  * ddof=1 + min_samples=1 behavior and DuckDB's stddev_samp.
  *
  * Frame is ROW-based (trailing N rows), not range-based — the reference
  * counts rows, not days.
  */
object Volatility {

  /** Trailing `window`-row sample standard deviation of `value` per key. */
  def rollingStd(df: DataFrame, partition: Seq[String], order: Seq[String],
                 value: String, window: Int = 30,
                 out: String = "rolling_vol_30d"): DataFrame = {
    val w = Returns.seriesWindow(partition, order).rowsBetween(-(window - 1), 0)
    df.withColumn(out, stddev_samp(col(value)).over(w))
  }

  /** TRUNCATED exponentially-weighted moving average — the RiskMetrics
    * smoother (EWMA vol uses it over squared returns), cut at `lags`
    * terms instead of the infinite recursion:
    * ewma_t = Σ_{i<lags} α(1−α)^i·x_{t−i} / Σ_{i<lags, present} α(1−α)^i,
    * renormalized over the PRESENT lags so early rows (fewer than
    * `lags` predecessors) still average to the right scale instead of
    * decaying toward zero. The tail dropped at i = lags carries
    * (1−α)^lags of the mass (α=0.1, lags=20 → 12%; pick lags for the
    * tolerance you need).
    *
    * Truncating is what makes the op BOTH scalable and replayable: the
    * recursive form is an order-dependent sequential scan no engine
    * parallelizes and no cross-engine oracle can replay term-for-term,
    * while the truncated form is `lags` explicit lag() columns over one
    * key-partitioned window — a single exchange, codegen'd, and exact:
    * weights are plan literals, each term one IEEE multiply, the sums
    * fold left-to-right over a FIXED lag order on both engines. */
  def ewma(df: DataFrame, partition: Seq[String], order: Seq[String],
           value: String, alpha: Double = 0.1, lags: Int = 20,
           out: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lags >= 1, s"need at least one lag, got $lags")
    val w = Returns.seriesWindow(partition, order)
    val weights = (0 until lags).map(i => alpha * math.pow(1 - alpha, i))
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      val x = if (i == 0) col(value) else lag(col(value), i).over(w)
      (when(x.isNotNull, lit(wt)).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wt) * x).otherwise(lit(0.0)))
    }
    val num = terms.map(_._2).reduce(_ + _)
    val den = terms.map(_._1).reduce(_ + _)
    df.withColumn(out, when(col(value).isNotNull, num / den))
  }
}
