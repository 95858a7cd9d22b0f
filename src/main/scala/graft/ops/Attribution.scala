package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution: split each conversion's value
  * across the touch events that preceded it, under the three standard
  * credit models at once — first-touch, last-touch, and linear — so the
  * "which channel drives revenue" table is one scan instead of three
  * pipelines that can disagree.
  *
  * Semantics:
  *  - every touch (type ∈ `touchTypes`) attaches to its key's EARLIEST
  *    conversion (type = `convType`) at-or-after the touch, if that
  *    conversion lands within `windowTicks`; later conversions never
  *    reuse an earlier conversion's touches (each touch credits exactly
  *    one conversion — the standard non-overlapping lookback);
  *  - conversions sharing an exact (key, ts) merge into one conversion
  *    group whose value is their exact DECIMAL sum;
  *  - a conversion with no in-window touch contributes to no channel
  *    (its revenue is unattributed, visible as the gap vs total).
  *
  * Exactness: conversion values quantize to DECIMAL(18,2) and sum
  * exactly; the linear split divides once in double and re-quantizes to
  * DECIMAL(20,12) before the channel rollup; first/last picks are
  * row_number-pinned by (ts, `tieCol`) so ties cannot flip between
  * engines.
  *
  * Plan shape: ONE key-partitioned window (a descending RANGE frame
  * computes each row's next conversion timestamp — ties by ts join the
  * same frame regardless of physical row order), one groupBy per
  * conversion group, one channel rollup. Event-granular rows shuffle
  * once; at 100 TB the window partitioning is the same user-hash
  * exchange sessionization already pays. */
object Attribution {

  private def d2(c: Column) = c.cast("decimal(18,2)")

  /** One row per channel (= the touch's `typeCol` value):
    * (channel, n_touches, first_rev, last_rev, linear_rev). */
  def multiTouch(events: DataFrame, key: String, tsCol: String,
                 tieCol: String, typeCol: String, valueCol: String,
                 touchTypes: Seq[String], convType: String,
                 windowTicks: Long): DataFrame = {
    require(windowTicks > 0, s"windowTicks must be positive, got $windowTicks")
    require(!touchTypes.contains(convType),
      s"convType '$convType' cannot also be a touch type")
    val base = events
      .filter(col(typeCol).isin(touchTypes :+ convType: _*))
      .select(col(key).as("__k"), col(tsCol).cast("long").as("__t"),
        col(tieCol).as("__tie"), col(typeCol).as("__ch"), col(valueCol).as("__v"))
    // earliest conversion at-or-after each row: a DESCENDING RANGE frame
    // over ts — RANGE (not ROWS) so rows tied on ts see the same frame
    val wDesc = Window.partitionBy(col("__k")).orderBy(col("__t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val withNext = base.withColumn("__conv_t",
      min(when(col("__ch") === convType, col("__t"))).over(wDesc))
    val touches = withNext
      .filter(col("__ch") =!= convType &&
        col("__conv_t").isNotNull &&
        col("__conv_t") - col("__t") <= windowTicks)
    val convs = base.filter(col("__ch") === convType)
      .groupBy(col("__k"), col("__t").as("__conv_t"))
      .agg(sum(d2(col("__v"))).as("__cv"))
    val wFirst = Window.partitionBy(col("__k"), col("__conv_t"))
      .orderBy(col("__t"), col("__tie"))
    val wLast = Window.partitionBy(col("__k"), col("__conv_t"))
      .orderBy(col("__t").desc, col("__tie").desc)
    touches
      .withColumn("__rn_f", row_number().over(wFirst))
      .withColumn("__rn_l", row_number().over(wLast))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("__k"), col("__conv_t"))))
      .join(convs, Seq("__k", "__conv_t"))
      .withColumn("__linear",
        (col("__cv").cast("double") / col("__n").cast("double"))
          .cast("decimal(20,12)"))
      .groupBy(col("__ch").as("channel"))
      .agg(
        count(lit(1)).as("n_touches"),
        sum(when(col("__rn_f") === 1, col("__cv")).otherwise(lit(0)))
          .cast("double").as("first_rev"),
        sum(when(col("__rn_l") === 1, col("__cv")).otherwise(lit(0)))
          .cast("double").as("last_rev"),
        sum(col("__linear")).cast("double").as("linear_rev"))
  }
}
