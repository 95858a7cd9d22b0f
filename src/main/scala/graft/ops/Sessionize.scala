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

  /** INCREMENTAL sessionization: fold a new batch's session rollup into
    * yesterday's standing rollup without rescanning event history — the
    * daily-pipeline form of the operator (at scale the standing rollup
    * is session-granular, orders of magnitude smaller than the raw
    * events it summarizes, and re-sessionizing a year of events to
    * absorb one day is exactly the rescan this avoids).
    *
    * `prior` and `delta` are both [[sessions]]-shaped frames
    * (key, session_id, session_start, session_end, n_events, sums...).
    * Precondition, checked loudly: every delta session starts strictly
    * AFTER the key's last prior session ends (the batches partition
    * time). Under it, only the key's LAST prior session and the
    * delta's FIRST session can bridge: delta sessions are already
    * gap-separated among themselves, and earlier prior sessions ended
    * a gap before the last one began. So the merge is pure
    * session-frame arithmetic:
    *
    *  - bridge (first-delta start − last-prior end ≤ gap): the two
    *    sessions fuse — end/count/sums fold into the prior row, and
    *    later delta sessions renumber to last_id + (j − 1);
    *  - no bridge: delta sessions renumber to last_id + j (last_id = 0
    *    for unseen keys).
    *
    * `sums` names additive rollup columns (exact types only — keep
    * DECIMAL sums decimal through the merge and cast at the output, or
    * the part-wise double additions diverge from a full recompute).
    * Equality with the from-scratch [[sessions]] of the concatenated
    * events is exact and oracle-checked. Three key-hashed joins on
    * session-granular frames; nothing event-granular moves. */
  def mergeSessions(prior: DataFrame, delta: DataFrame, key: String,
                    gap: Long, sums: Seq[String] = Nil): DataFrame = {
    require(gap >= 0, s"gap must be non-negative, got $gap")
    val outCols = (Seq(key, "session_id", "session_start", "session_end",
      "n_events") ++ sums).map(col)
    val lp = prior.groupBy(col(key).as("__k"))
      .agg(max(col("session_id")).as("__last_id"),
        max_by(col("session_end"), col("session_id")).as("__last_end"))
    val d1 = delta.filter(col("session_id") === 1L)
      .select(Seq(col(key).as("__k"), col("session_start").as("__d1_start"),
        col("session_end").as("__d1_end"), col("n_events").as("__d1_n")) ++
        sums.map(c => col(c).as(s"__d1_$c")): _*)
    // one row per key seen on either side; the time-partition contract
    // is asserted HERE so both output legs inherit the check
    val info = lp.join(d1, Seq("__k"), "full_outer")
      .where(assert_true(
        col("__last_end").isNull || col("__d1_start").isNull ||
          col("__d1_start") > col("__last_end"),
        lit("mergeSessions: a delta session starts at-or-before the " +
          "prior rollup's last end — the batches must partition time")).isNull)
      .withColumn("__bridge",
        col("__last_end").isNotNull && col("__d1_start").isNotNull &&
          col("__d1_start") - col("__last_end") <= gap)
    val infoCols = Seq(col("__k"), col("__last_id"), col("__bridge"),
      col("__d1_end"), col("__d1_n")) ++ sums.map(c => col(s"__d1_$c"))
    val priorOut = prior.join(info.select(infoCols: _*),
        col(key) === col("__k"), "left")
      .withColumn("__fold", col("__bridge") && col("session_id") === col("__last_id"))
      .withColumn("session_end",
        when(col("__fold"), col("__d1_end")).otherwise(col("session_end")))
      .withColumn("n_events",
        when(col("__fold"), col("n_events") + col("__d1_n"))
          .otherwise(col("n_events")))
    // null-safe fold: SUM over a bridged session ignores NULLs, so a
    // leg whose values are all NULL contributes nothing (not NULL-
    // poisoning) — and two all-NULL legs stay NULL, matching SUM's
    // empty-input result
    val priorFolded = sums.foldLeft(priorOut) { (df, c) =>
      val d1c = col(s"__d1_$c")
      df.withColumn(c, when(col("__fold"),
          when(col(c).isNull && d1c.isNull, lit(null))
            .otherwise(coalesce(col(c), lit(0)) + coalesce(d1c, lit(0))))
        .otherwise(col(c)))
    }.select(outCols: _*)
    val deltaOut = delta.join(
        info.select(col("__k"), col("__last_id"), col("__bridge")),
        col(key) === col("__k"), "left")
      .filter(!(coalesce(col("__bridge"), lit(false)) && col("session_id") === 1L))
      .withColumn("session_id",
        coalesce(col("__last_id"), lit(0L)) + col("session_id") -
          when(coalesce(col("__bridge"), lit(false)), 1L).otherwise(0L))
      .select(outCols: _*)
    priorFolded.unionByName(deltaOut)
  }
}
