package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.agg.ProductAgg

/** Return derivation over ordered per-key series.
  *
  * Reference semantics: `pct_change() over ticker` (scripts/transform.py:67-70)
  * and cumulative compounding `(1 + r).cumprod()` (scripts/app.py:47-51).
  *
  * Scale notes: all three operators share ONE window spec
  * (partitionBy(keys) orderBy(order)), so Catalyst plans a single exchange +
  * sort and stacks the window functions in one WindowExec. At 100 TB the
  * only shuffle is the hash partitioning on the series key; no driver-side
  * iteration anywhere.
  */
object Returns {

  def seriesWindow(partition: Seq[String], order: Seq[String]) =
    Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)

  /** `(x - lag(x)) / lag(x)` per key in series order; first row per key is
    * null (reference: scripts/transform.py:69). Division guarded with
    * nullif so a zero previous value yields null, not an ANSI error. */
  def lagReturn(df: DataFrame, partition: Seq[String], order: Seq[String],
                value: String, out: String = "daily_return"): DataFrame = {
    val w = seriesWindow(partition, order)
    val prev = lag(col(value), 1).over(w)
    df.withColumn(out, (col(value) - prev) / nullif(prev, lit(0)))
  }

  /** Cumulative compounded return via the codegen-friendly
    * `exp(running_sum(ln(1+r)))` rewrite — valid while 1+r > 0
    * (reference: scripts/app.py:49-50). Nulls (first row per key) are
    * treated as 0 return, mirroring the dashboard's `fillna(0)`
    * (scripts/app.py:48).
    *
    * Wipeout guard: a return of −100% (close falls to 0 → r = −1) makes
    * ln(0) undefined; without the guard, sum() would silently SKIP the
    * null and the worthless asset would keep compounding. Once the
    * running min of (1+r) hits ≤ 0 the cumulative return clamps to 0 —
    * pandas cumprod semantics (a 0 factor zeroes everything after). */
  def cumulativeReturn(df: DataFrame, partition: Seq[String], order: Seq[String],
                       ret: String, out: String = "cumulative_return"): DataFrame = {
    val w = seriesWindow(partition, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = lit(1.0) + coalesce(col(ret), lit(0.0))
    df.withColumn(out,
      when(min(g).over(w) <= 0, lit(0.0))
        .otherwise(exp(sum(log(g)).over(w))))
  }

  /** Exact cumulative product via the custom [[graft.agg.ProductAgg]]
    * Aggregator — the numerically exact counterpart of
    * [[cumulativeReturn]]; property-tested for agreement. */
  def cumulativeReturnExact(df: DataFrame, partition: Seq[String], order: Seq[String],
                            ret: String, out: String = "cumulative_return"): DataFrame = {
    val w = seriesWindow(partition, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, ProductAgg.product(lit(1.0) + coalesce(col(ret), lit(0.0))).over(w))
  }

  /** Relative performance of two aligned series
    * (reference: scripts/app.py:68-73 joins two filtered views; here ONE
    * conditional aggregation — one scan, one shuffle, no join. Requires
    * one row per (axis, series), which every caller satisfies; the
    * both-sides-present filter preserves the reference's inner-join
    * alignment semantics). */
  def relativeReturns(df: DataFrame, axis: String, seriesCol: String,
                      base: String, comp: String, value: String): DataFrame =
    df.filter(col(seriesCol).isin(base, comp))
      .groupBy(col(axis))
      .agg(
        max(when(col(seriesCol) === base, col(value))).as("v_base"),
        max(when(col(seriesCol) === comp, col(value))).as("v_comp"))
      .filter(col("v_base").isNotNull && col("v_comp").isNotNull)
      .withColumn("pct_diff", lit(100.0) * (col("v_base") - col("v_comp")))
}
