package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-series analytics: pairwise statistics BETWEEN keyed time
  * series (correlation matrix, beta against the cross-sectional
  * aggregate). The reference's dashboard compares tickers one at a
  * time (`app.py:50-72` relative series, `app.py:77-93` top movers);
  * the natural next question — "which tickers move together, and how
  * much of each move is just the market" — is a pairwise join the
  * reference never scales to. Here it is the standard two-step:
  *
  *  1. REDUCE each series to one row per (key, bucket) with an exact
  *     integer value (cents sum) — the raw table never joins itself.
  *  2. Pair-join the reduced frame on bucket. The intermediate is
  *     |keys|² · |buckets| rows — governed by key cardinality (a few
  *     thousand tickers), NOT raw row count, which is what makes the
  *     correlation matrix tractable at 100 TB: the petabyte table
  *     collapses to a ~MB series frame before any quadratic step.
  *
  * Float discipline follows [[graft.queries.AnalyticsQueries]]'s
  * `agg_exact_corr`: per-row values quantize to integer cents, all
  * co-moments accumulate in DECIMAL(38,0) (order-independent, no
  * BIGINT wrap at any cardinality), and only the final ratio divides
  * in IEEE double — so DuckDB's HUGEINT oracle replays the result
  * bit-for-bit.
  */
object CrossSeries {

  private val d38 = (c: Column) => c.cast("decimal(38,0)")

  /** Reduce a raw event frame to one exact integer observation per
    * (key, bucket): the cents sum of `value` in the bucket. Sums (not
    * means) keep the series value integral — means would divide too
    * early and re-introduce engine-order float drift. */
  def bucketSeries(df: DataFrame, key: String, tsNanos: String,
                   value: String, bucketNanos: Long): DataFrame = {
    require(bucketNanos > 0, s"bucketNanos must be positive, got $bucketNanos")
    // integer `div`, never float division: epoch nanos (~1.7e18) sit far
    // beyond double's 2^53 integer range, so a float quotient can flip
    // bucket-boundary rows; `div` keeps both engines on exact int64
    df.filter(col(value).isNotNull)
      .groupBy(col(key).as("k"),
        expr(s"`$tsNanos` div ${bucketNanos}L").as("b"))
      .agg(sum(round(col(value) * 100).cast("long")).as("v"))
  }

  /** Pearson correlation between every unordered pair of series,
    * aligned on shared buckets (inner join: a bucket contributes only
    * where BOTH series observed — the pairwise-complete convention).
    * Output: (k1, k2, n, corr) with k1 < k2, one row per pair.
    *
    * Plan: one self-join of the reduced series frame on bucket with
    * `k1 < k2` inside the join, then one grouped co-moment pass —
    * |keys|²/2 groups. No window, no driver loop; with thousands of
    * keys the pair frame still fits comfortably in one shuffle. */
  def corrPairs(series: DataFrame, minOverlap: Int = 2): DataFrame = {
    require(minOverlap >= 2, s"corr needs at least 2 shared buckets, got $minOverlap")
    val a = series.select(col("k").as("k1"), col("b"), col("v").as("x"))
    val bf = series.select(col("k").as("k2"), col("b"), col("v").as("y"))
    a.join(bf, Seq("b")).filter(col("k1") < col("k2"))
      .groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"))
      .filter(col("n") >= minOverlap)
      .withColumn("cov_n", d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("var_x", d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("var_y", d38(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col("k1"), col("k2"), col("n"),
        (col("cov_n").cast("double") /
          nullif(sqrt(col("var_x").cast("double") * col("var_y").cast("double")),
            lit(0.0))).cast("float").as("corr"))
  }

  /** CAPM-style beta of each series against the MARKET series — the
    * cross-sectional cents total per bucket (an index weighting every
    * key equally by observed volume, computed in the same pass family
    * as the series themselves). β(k) = cov(series k, market) /
    * var(market) over the buckets where k observed.
    *
    * The market frame is |buckets| rows → broadcast onto the series
    * frame; the whole operator is two aggregations and one broadcast
    * join. Self-inclusion (k's own cents are inside the market total)
    * is the index convention — S&P constituents are inside the S&P. */
  /** TRAILING-window correlation of each series against the market —
    * [[betaVsMarket]]'s global regression localized in time: corr over
    * the last `window` observed buckets per key, emitted per (key,
    * bucket). The regime-change detector ("this ticker decoupled from
    * the index in March") a single whole-history coefficient averages
    * away.
    *
    * Same exactness contract: co-moment sums are DECIMAL(38,0) window
    * sums over integer cents, one double combination per row, float
    * out. Plan: the broadcast market join, then ONE key-partitioned
    * window ordering — all six frame sums share it. */
  def rollingCorrVsMarket(series: DataFrame, window: Int,
                          minOverlap: Int = 2): DataFrame = {
    require(window >= 2, s"window must be at least 2, got $window")
    require(minOverlap >= 2, s"corr needs at least 2 buckets, got $minOverlap")
    val market = series.groupBy(col("b")).agg(sum(col("v")).as("m"))
    val w = Window.partitionBy(col("k")).orderBy(col("b"))
      .rowsBetween(-(window - 1), Window.currentRow)
    series.join(broadcast(market), Seq("b"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(d38(col("v"))).over(w))
      .withColumn("sy", sum(d38(col("m"))).over(w))
      .withColumn("sxy", sum(d38(col("v")) * d38(col("m"))).over(w))
      .withColumn("sxx", sum(d38(col("v")) * d38(col("v"))).over(w))
      .withColumn("syy", sum(d38(col("m")) * d38(col("m"))).over(w))
      .filter(col("n") >= minOverlap)
      .withColumn("cov_n", d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("var_x", d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("var_y", d38(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col("k"), col("b"), col("n"),
        (col("cov_n").cast("double") /
          nullif(sqrt(col("var_x").cast("double") * col("var_y").cast("double")),
            lit(0.0))).cast("float").as("corr"))
  }

  def betaVsMarket(series: DataFrame, minOverlap: Int = 2): DataFrame = {
    require(minOverlap >= 2, s"beta needs at least 2 shared buckets, got $minOverlap")
    val market = series.groupBy(col("b")).agg(sum(col("v")).as("m"))
    series.join(broadcast(market), Seq("b"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("v"))).as("sx"), sum(d38(col("m"))).as("sm"),
        sum(d38(col("v")) * d38(col("m"))).as("sxm"),
        sum(d38(col("m")) * d38(col("m"))).as("smm"))
      .filter(col("n") >= minOverlap)
      .withColumn("cov_n", d38(col("n")) * col("sxm") - col("sx") * col("sm"))
      .withColumn("var_m", d38(col("n")) * col("smm") - col("sm") * col("sm"))
      .select(col("k"), col("n"),
        (col("cov_n").cast("double") /
          nullif(col("var_m").cast("double"), lit(0.0))).cast("float").as("beta"))
  }
}
