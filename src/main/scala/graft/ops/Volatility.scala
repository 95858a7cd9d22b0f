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
}
