package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: consecutive events of the same key
  * belong to one session while the gap between them is ≤ `gap`; a
  * strictly larger gap starts a new session. The batch complement of
  * `streaming/EventStreams`' session windows (reference roadmap §2.10),
  * and the island-labeling shape every warehouse uses for it.
  *
  * Plan shape: ONE hash exchange + ONE sort on (key, ts, tiebreak) feeds
  * both window passes — `lag` (gap detection) and the running `sum`
  * (session ordinal) share the same partitioning and ordering, so Spark
  * plans them back-to-back with no second exchange or sort. The rollup
  * then re-aggregates by (key, session_id); session_id is a key-local
  * ordinal, so the rollup preserves the key partitioning's co-location.
  *
  * Event time is INTEGRAL (epoch micros/nanos), not timestamp: integer
  * gap arithmetic is exact, engine-portable, and immune to the
  * calendar/timezone edge cases of interval arithmetic at scale.
  */
object Sessionize {

  private val Reserved = Seq("__sess_brk", "session_id")

  /** Annotate each event with `session_id` — a 1-based per-key session
    * ordinal in time order. `tieCol` breaks timestamp ties so window
    * frames are deterministic across runs and engines (required: a
    * nondeterministic intra-tie order changes nothing for session
    * BOUNDARIES, but downstream per-row window logic needs total order).
    */
  def assign(events: DataFrame, key: String, tsCol: String, tieCol: String,
             gap: Long): DataFrame = {
    require(gap >= 0, s"gap must be non-negative, got $gap")
    val clash = events.columns.toSet.intersect(Reserved.toSet)
    require(clash.isEmpty,
      s"sessionize appends working columns ${Reserved.mkString(", ")} — " +
        s"the input already has: $clash; rename first")
    val byKey = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    events
      // first event of a key: lag is null → null > gap is null → 0
      .withColumn("__sess_brk",
        when(col(tsCol) - lag(col(tsCol), 1).over(byKey) > gap, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__sess_brk")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1L)
      .drop("__sess_brk")
  }

  /** Per-session rollup: (key, session_id, session_start, session_end,
    * n_events) — start/end in the input's time unit, both inclusive. */
  def sessions(events: DataFrame, key: String, tsCol: String, tieCol: String,
               gap: Long): DataFrame =
    assign(events, key, tsCol, tieCol, gap)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
