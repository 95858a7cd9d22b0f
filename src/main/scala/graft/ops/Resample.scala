package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-bucket downsampling to OHLC candles — the standard
  * finance-series resample (pandas `df.resample('W').ohlc()` shape)
  * the reference's daily bars would feed a weekly dashboard with
  * (`app.py:50-72` plots raw dailies; any zoomed-out view needs this).
  *
  * One grouped aggregation, no window and no self-join: open/close are
  * `min_by`/`max_by` over the (ts, tie) struct (Spark's order-reducing
  * aggregates — map-side combined like any agg, so the shuffle carries
  * one candle per partition per group, not the raw ticks). The tie
  * column makes the order total — first/last are then well-defined and
  * engine-portable (the oracle replays them as row_number picks over
  * the same total order). Volume sums in integer cents (exact,
  * order-independent).
  */
object Resample {

  /** (key, bucket) → open/high/low/close of `value`, tick count, and
    * exact cents volume. `tsNanos` is the engine-contract nanos-Long;
    * `bucketNanos` the candle width (e.g. 7×86400e9 for weekly). */
  def ohlc(df: DataFrame, key: String, tsNanos: String, tie: String,
           value: String, bucketNanos: Long): DataFrame = {
    require(bucketNanos > 0, s"bucketNanos must be positive, got $bucketNanos")
    val in = df.filter(col(value).isNotNull)
    val ord = struct(col(tsNanos), col(tie))
    // integer `div` (not float /): epoch nanos exceed double's exact
    // integer range, so a float quotient can flip boundary ticks
    in.groupBy(col(key).as("k"),
        expr(s"`$tsNanos` div ${bucketNanos}L").as("b"))
      .agg(
        min_by(col(value), ord).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), ord).as("close"),
        count(lit(1)).as("n_ticks"),
        sum(round(col(value) * 100).cast("long")).as("vol_cents"))
  }

  private val d38 = (c: Column) => c.cast("decimal(38,0)")

  /** Time-weighted average price per key (TWAP): each observation holds
    * from its timestamp until the key's next one; the average weights
    * each held value by its holding duration — the execution-quality
    * benchmark a plain mean misstates whenever sampling is irregular
    * (one stale quote held for a day outweighs a burst of ticks).
    *
    * Exactness: integer cents × integer nano-durations accumulate in
    * DECIMAL(38,0) (cents·duration products clear int64), one double
    * division at the end. The final (unterminated) observation carries
    * no duration and is excluded — the standard right-open convention.
    * Plan: one lead() window + one aggregation, same key exchange. */
  def timeWeightedAvg(df: DataFrame, key: String, tsNanos: String,
                      tie: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsNanos), col(tie))
    val cents = round(col(value) * 100).cast("long")
    df.filter(col(value).isNotNull)
      .withColumn("__next", lead(col(tsNanos), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn("__dur", col("__next") - col(tsNanos))
      .groupBy(col(key).as("k"))
      .agg(
        (sum(d38(cents) * d38(col("__dur"))).cast("double") /
          sum(d38(col("__dur"))).cast("double") / lit(100.0))
          .cast("float").as("twap"),
        sum(col("__dur")).as("span_nanos"),
        count(lit(1)).as("n_holds"))
  }
}
