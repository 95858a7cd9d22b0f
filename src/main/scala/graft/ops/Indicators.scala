package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Technical-analysis window indicators — the tier directly adjacent to
  * the reference dashboard's returns / rolling-vol analytics
  * (app.py:50-75): exponential moving average, Bollinger bands, RSI.
  * Each is built ENGINE-PORTABLE, the repo's hard-signal stance:
  *
  *  - [[ewma]]: finite-window exponential weights materialized as EXACT
  *    decimal literals (decay^i has exactly i decimal digits for a
  *    1-digit decay like 0.5) — both engines sum identical decimals and
  *    only the final normalize touches doubles;
  *  - [[bollinger]]: the midline is an exact integer-cent sum divided
  *    once in double; the band uses stddev_samp over a ROWS frame,
  *    FLOAT-downcast so a 1-ulp accumulation divergence cannot survive;
  *  - [[rsi]]: Cutler's SMA variant, 100·ΣG/(ΣG+ΣL) over integer cent
  *    deltas — pure integer sums, one double divide at the end (the
  *    classic Wilder smoothing is a recursive α=1/14 EMA whose weights
  *    are NOT finite decimals, hence not exactly portable; Cutler's is
  *    the standard exact alternative).
  *
  * All three are single window passes over one (key)-partitioned
  * exchange — at 100 TB each scales as one shuffle by key with
  * per-row O(window) arithmetic, no joins, no state beyond the frame.
  */
object Indicators {

  private val cents = DecimalType(18, 0)

  /** Integer cents from a double price/value column — the repo's proven
    * cross-engine rounding shape (see agg_exact_corr). */
  def toCents(value: Column): Column = round(value * 100).cast("long")

  /** Finite-window EWMA of `value` (a double) per key, emitted as
    * `ewma_cents` (float): Σ decay^i·x_{t-i} / Σ decay^i over the most
    * recent `n` rows, weights skipping null values. `decay` must be a
    * short decimal (e.g. 0.5, 0.8) so every power is exact; windows are
    * ROWS-based over a TOTAL (tie-broken) order. */
  def ewma(df: DataFrame, key: String, order: Seq[String], value: String,
           n: Int = 8, decay: BigDecimal = BigDecimal("0.5")): DataFrame = {
    require(n >= 1 && n <= 12,
      s"n must be in [1,12], got $n — larger windows push the exact " +
        "decimal sums past DECIMAL(38) precision")
    require(decay > 0 && decay < 1, s"decay must be in (0,1), got $decay")
    // the exactness contract holds only while every weight fits beside
    // the 18-digit cent operand in DECIMAL(38): weight scale grows as
    // scale(decay)·i, and past 14 fractional digits Spark silently
    // ROUNDS the products (allowPrecisionLoss default) — a quiet
    // contract break, so reject it loudly instead
    val wScale = decay.underlying.stripTrailingZeros.scale * (n - 1)
    require(wScale <= 14,
      s"decay=$decay over n=$n needs weight scale $wScale > 14 — the " +
        "decimal products would round silently; use a shorter decay " +
        "(e.g. 0.5, 0.8) or a smaller window")
    // the multiply bound alone is not enough: the n-term ADD chain also
    // grows precision (~1 integer digit per term on a (20,wScale)-ish
    // product), and once the running sum's precision would exceed 38
    // Spark trims SCALE instead (allowPrecisionLoss) — silently rounding
    // the smallest weight terms. Bound the additive growth too:
    // 20 int digits (18-digit cents × sub-1 weight + headroom) plus one
    // per extra term plus the full weight scale must fit in 38.
    require(20 + (n - 1) + wScale <= 38,
      s"decay=$decay over n=$n grows the decimal SUM past precision 38 " +
        s"(20 + ${n - 1} + $wScale = ${20 + (n - 1) + wScale}) — Spark " +
        "would trim scale and round the smallest weight terms silently; " +
        "use a smaller window or shorter decay")
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val x = toCents(col(value)).cast(cents)
    // exact decimal weights decay^0 .. decay^(n-1); java BigDecimal pow
    // is exact for decimal bases
    val weights = (0 until n).map(i => decay.underlying.pow(i))
    val terms = (0 until n).map { i =>
      val xi = if (i == 0) x else lag(x, i).over(w)
      (xi, lit(weights(i)))
    }
    val zero = lit(java.math.BigDecimal.ZERO)
    val num = terms.map { case (xi, wi) =>
      when(xi.isNotNull, xi * wi).otherwise(zero)
    }.reduce(_ + _)
    val den = terms.map { case (xi, wi) =>
      when(xi.isNotNull, wi).otherwise(zero)
    }.reduce(_ + _)
    df.withColumn("ewma_cents",
      (num.cast("double") / nullif(den.cast("double"), lit(0.0))).cast("float"))
  }

  /** Bollinger bands over the trailing `n` rows: exact-cents SMA
    * midline, ± `k`·stddev_samp band (float-downcast). Emits
    * `bb_mid`, `bb_upper`, `bb_lower` (all float, null until the frame
    * holds ≥ 2 samples for the band / ≥ 1 for the midline). */
  def bollinger(df: DataFrame, key: String, order: Seq[String],
                value: String, n: Int = 20, k: Double = 2.0): DataFrame = {
    require(n >= 2, s"n must be at least 2, got $n")
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    val c = toCents(col(value))
    val mid = sum(c.cast(cents)).over(w).cast("double") /
      count(c).over(w).cast("double")
    val sd = stddev_samp(c.cast("double")).over(w)
    df.withColumn("bb_mid", (mid / 100.0).cast("float"))
      .withColumn("bb_upper", ((mid + lit(k) * sd) / 100.0).cast("float"))
      .withColumn("bb_lower", ((mid - lit(k) * sd) / 100.0).cast("float"))
  }

  /** Wilder-smoothing RSI — the industry-default variant: gains/losses
    * smoothed by Wilder's recursive average (n-SMA seed, then
    * avg = (avg·(n−1) + x)/n), RSI = 100·avgG/(avgG+avgL). Emits
    * `rsi_wilder` (float), null until `n` deltas exist and when both
    * averages are zero (flat prefix). The recursion runs in
    * [[graft.agg.RecursiveAgg.WilderAvgAgg]] over a running frame
    * (frame-order reduce — the [[graft.agg.ProductAgg]] contract), an
    * IEEE-double chain a SQL recursive CTE replays bit-for-bit; see
    * [[rsi]] for the finite-window Cutler form and the exactness
    * trade-offs between the two. Single window pass, one key exchange. */
  def rsiWilder(df: DataFrame, key: String, order: Seq[String],
                value: String, n: Int = 14): DataFrame = {
    require(n >= 1, s"n must be at least 1, got $n")
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val delta = (toCents(col(value)) - lag(toCents(col(value)), 1).over(w))
      .cast("double")
    // head-of-series deltas are NULL, not zero: a null input advances
    // neither the aggregator's seed count nor its recursion, matching
    // the convention that the first price contributes no move
    val gain = when(delta.isNull, lit(null).cast("double"))
      .when(delta > 0, delta).otherwise(lit(0.0))
    val loss = when(delta.isNull, lit(null).cast("double"))
      .when(delta < 0, -delta).otherwise(lit(0.0))
    df
      .withColumn("__ag", graft.agg.RecursiveAgg.wilderAvg(n)(gain).over(frame))
      .withColumn("__al", graft.agg.RecursiveAgg.wilderAvg(n)(loss).over(frame))
      .withColumn("rsi_wilder",
        when(col("__ag") + col("__al") === 0.0, lit(null))
          .otherwise(lit(100.0) * col("__ag") / (col("__ag") + col("__al")))
          .cast("float"))
      .drop("__ag", "__al")
  }

  /** Recursive (infinite-history) EMA of integer cents per key:
    * ema_1 = c_1, ema_t = α·c_t + (1−α)·ema_{t−1} — the classic
    * smoothing whose weights are NOT finite decimals (contrast
    * [[ewma]]'s exact finite window). Emits `ema_rec_cents` (float).
    * Same IEEE-double replay argument as [[rsiWilder]]; pick an α with
    * an exact binary representation (0.125, 0.25) so `1−α` is exact in
    * every engine. */
  def emaRecursive(df: DataFrame, key: String, order: Seq[String],
                   value: String, alpha: Double = 0.125): DataFrame = {
    val frame = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("ema_rec_cents",
      graft.agg.RecursiveAgg.emaRecursive(alpha)(
        toCents(col(value)).cast("double")).over(frame).cast("float"))
  }

  /** MACD (Appel): fast EMA − slow EMA, a signal EMA of that
    * difference, and the histogram between them — the momentum
    * crossover indicator, composed from three passes of the exact
    * recursive-EMA fold ([[graft.agg.RecursiveAgg.emaRecursive]]).
    * Standard smoothing α = 2/(n+1); the α doubles are computed
    * identically by both engines (one IEEE division), and every
    * recursion step is the same `α·x + (1−α)·ema` chain the
    * recursive-CTE oracle replays row-for-row, so the FLOAT-downcast
    * surface is engine-exact.
    *
    * Plan: all three UDAF folds share ONE key-hash exchange and sort
    * (the signal fold windows over the macd column the first pass
    * computed — same partitioning, no new shuffle). */
  def macd(df: DataFrame, key: String, order: Seq[String], value: String,
           nFast: Int = 12, nSlow: Int = 26, nSignal: Int = 9): DataFrame = {
    require(nFast >= 1 && nSlow > nFast && nSignal >= 1,
      s"need 1 <= nFast < nSlow and nSignal >= 1, got $nFast/$nSlow/$nSignal")
    val frame = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cents = toCents(col(value)).cast("double")
    def ema(n: Int, c: Column) =
      graft.agg.RecursiveAgg.emaRecursive(2.0 / (n + 1))(c).over(frame)
    df.withColumn("__macd", ema(nFast, cents) - ema(nSlow, cents))
      .withColumn("__sig", ema(nSignal, col("__macd")))
      .withColumn("macd", col("__macd").cast("float"))
      .withColumn("signal", col("__sig").cast("float"))
      .withColumn("histogram", (col("__macd") - col("__sig")).cast("float"))
      .drop("__macd", "__sig")
  }

  /** Cutler's RSI over the trailing `n` deltas:
    * 100·ΣG/(ΣG+ΣL), where G/L are positive/negative integer cent moves
    * against the previous row. Emits `rsi` (float), null while no move
    * exists in the frame (flat or head-of-series). */
  def rsi(df: DataFrame, key: String, order: Seq[String], value: String,
          n: Int = 14): DataFrame = {
    require(n >= 1, s"n must be at least 1, got $n")
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val frame = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    val delta = toCents(col(value)) - lag(toCents(col(value)), 1).over(w)
    val sumG = sum(when(delta > 0, delta).otherwise(lit(0L))).over(frame)
    val sumL = sum(when(delta < 0, -delta).otherwise(lit(0L))).over(frame)
    df.withColumn("rsi",
      (lit(100.0) * sumG.cast("double") /
        nullif((sumG + sumL).cast("double"), lit(0.0))).cast("float"))
  }
}
