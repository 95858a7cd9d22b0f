package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cartesian product.
  *
  * Spark's built-in planner turns a pure inequality join condition
  * (`p BETWEEN lo AND hi`) into BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) comparisons, the classic scale-killer for event-in-window
  * joins. The standard fix (Flink's interval join / Databricks' range-join
  * optimization) is binning: quantize the range dimension into fixed-width
  * bins, equi-join on bin id, and re-check the exact predicate after.
  *
  *  - every point lands in exactly ONE bin → a matching (point, interval)
  *    pair is produced exactly once, no post-dedup;
  *  - every interval is replicated to `len/binWidth + 1` bins — bounded
  *    when interval lengths are bounded, which is the precondition for
  *    any interval-join strategy;
  *  - the join itself is a plain shuffle (or broadcast) hash equi-join on
  *    bin id: sort-free, AQE-skew-splittable, no nested loop anywhere.
  *
  * Pick `binWidth` ≈ the median interval length: wider bins replicate
  * intervals less but let more non-matching points share a bin (re-check
  * cost); narrower bins the reverse.
  *
  * Bin ids use integer `div` (not `floor(x / w)`): the range dimension is
  * often epoch nanos ~1.7e18, beyond a double's 2^53 exact-integer range,
  * where float division mis-bins boundary values. Truncating division is
  * monotone non-decreasing in the dividend, so interval coverage
  * `[lo div w, hi div w]` is correct for negative coordinates too.
  */
object RangeJoin {

  /** Join rows of `points` to every row of `intervals` whose
    * `[loCol, hiCol]` (both inclusive) contains `pointCol`. Column sets
    * must be disjoint; `pointCol`/`loCol`/`hiCol` are integral (long).
    * An inverted interval (hi < lo) matches nothing: such rows are
    * dropped BEFORE the bin explode — `sequence` steps DOWNWARD when
    * hi_bin < lo_bin, so a single corrupt row (lo=Long.MaxValue, hi=0)
    * would otherwise explode toward Spark's sequence-length limit and
    * fail the whole job instead of being ignored. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals must have disjoint columns, both have: $overlap")
    require(!(points.columns ++ intervals.columns).contains("__rj_bin"),
      "pointInInterval appends a __rj_bin working column — an input " +
        "already has one; rename it first")
    val p = points.withColumn("__rj_bin", expr(s"`$pointCol` div $binWidth"))
    val iv = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__rj_bin",
        explode(sequence(expr(s"`$loCol` div $binWidth"),
          expr(s"`$hiCol` div $binWidth"))))
    p.join(iv, Seq("__rj_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__rj_bin")
  }
}
