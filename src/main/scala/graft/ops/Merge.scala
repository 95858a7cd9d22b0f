package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-load / upsert composites.
  *
  * The reference hand-rolls MERGE three ways: partition read → filter out
  * replaced keys → concat → write (scripts/ingest_hourly.py:117-131),
  * delete-today-then-append (scripts/load_stock_metrics.py:56-61), and a
  * left join on per-key watermarks + `latest IS NULL OR date > latest`
  * (scripts/load_stock_metrics.py:76-88). In Spark these are one
  * broadcast left join (watermark side is tiny) or a left-anti join +
  * union — no per-partition loops, no driver-side state.
  *
  * Scale notes: the watermark frame is ≤ |keys| rows — BROADCAST only
  * while a bounded `limit(n+1).count()` probe proves it small (the
  * reference's 503 tickers always pass; per-customer watermarks at
  * millions of keys fall back to a plain hash join — same rows, no
  * forced driver-sized build); `upsert` shuffles once on the key
  * columns. Idempotency (re-running a load must not duplicate) falls
  * out of the anti-join, property-tested.
  */
object Merge {

  /** Per-key high-watermarks of `ord` (reference: load_stock_metrics.py:40-49). */
  def watermarks(df: DataFrame, key: String, ord: String): DataFrame =
    df.groupBy(col(key)).agg(max(col(ord)).as("latest_" + ord))

  /** Keep only rows strictly newer than their key's watermark; keys absent
    * from the watermark frame pass through
    * (reference: load_stock_metrics.py:76-80). */
  def incrementalFilter(incoming: DataFrame, wm: DataFrame,
                        key: String, ord: String,
                        maxBroadcastKeys: Int = 1000000): DataFrame = {
    val latest = "latest_" + ord
    // bounded probe (the Resample.seasonalDecompose guard pattern):
    // scans at most maxBroadcastKeys+1 watermark rows, never a full count
    val over = wm.limit(maxBroadcastKeys + 1).count() > maxBroadcastKeys
    val wmSide = if (over) wm else broadcast(wm)
    incoming.join(wmSide, Seq(key), "left")
      .filter(col(latest).isNull || col(ord) > col(latest))
      .drop(latest)
  }

  /** Upsert: rows of `existing` whose key collides with `incoming` are
    * replaced by the incoming rows; incoming duplicates are collapsed
    * deterministically (greatest `tiebreak` survives). One left-anti join
    * + one union + one dedup — the Spark form of the reference's
    * read/filter/concat/write loop. */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String], tiebreak: String): DataFrame = {
    val incomingKeys = incoming.select(keys.map(col): _*).distinct()
    existing.join(incomingKeys, keys, "left_anti")
      .unionByName(dedupByKey(incoming, keys, tiebreak))
  }

  /** Incremental INNER-JOIN view maintenance, the delta identity for
    * insert-only batches: with V = A ⋈ B materialized and new rows
    * ΔA, ΔB arriving,
    *   ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB
    * — the first leg pairs new-left rows against the WHOLE new right
    * (including ΔA×ΔB pairs, the case a naive ΔA⋈B ∪ A⋈ΔB double-counts
    * or misses depending on which A/B it reads), the second pairs
    * old-left against new-right only. V_new = V ∪ ΔV exactly.
    *
    * The point at 100 TB: both legs are DELTA-sized on one side, so a
    * refresh never re-joins old×old — the maintained view costs
    * |Δ|-proportional work per batch while a recompute costs |base|.
    * The planner broadcasts whichever side its stats measure small
    * (deltas usually are); no hint forced. Deletes/updates need
    * retractions — this is the insert-only fast path, the same
    * contract as [[mergeAggregates]], and the two compose: feed this
    * delta through an aggregate rollup and merge THAT with the rolled-
    * up view.
    *
    * Both A-frames and both B-frames must share the join column
    * names in `keys` (rename before calling). */
  def joinViewDelta(aOld: DataFrame, aDelta: DataFrame,
                    bOld: DataFrame, bDelta: DataFrame,
                    keys: Seq[String]): DataFrame =
    aDelta.join(bOld.unionByName(bDelta), keys)
      .unionByName(aOld.join(bDelta, keys))

  /** Incremental materialized-aggregate refresh: merge an insert-only
    * delta's aggregate into an existing materialized aggregate WITHOUT
    * rescanning the base table. `kinds` maps every non-key column of the
    * MV to its distributive combine rule — "count"/"sum" add,
    * "min"/"max" take the null-skipping extreme — the algebra that makes
    * count/sum/min/max maintainable from deltas alone (avg is not: fail
    * loudly and maintain sum+count instead).
    *
    * Scale: cost is one shuffle over |MV groups| + |delta groups| rows —
    * the refresh of a 100 TB base's rollup touches megabytes, not the
    * base. Stored partitioned by a key prefix, the rewrite further
    * narrows to affected partitions via dynamic partition overwrite
    * (the S9 idempotency pattern in [[graft.sources.LakeWriter]]).
    * Deletes/updates need a different algebra (retractions or
    * recompute-affected-groups); this operator is the insert-only fast
    * path every warehouse rollup runs hourly. */
  def mergeAggregates(mv: DataFrame, deltaAgg: DataFrame, keys: Seq[String],
                      kinds: Map[String, String]): DataFrame = {
    val valueCols = mv.columns.filterNot(keys.contains)
    require(valueCols.toSet == deltaAgg.columns.filterNot(keys.contains).toSet,
      s"MV and delta aggregate must share columns; mv=${valueCols.mkString(",")} " +
        s"delta=${deltaAgg.columns.filterNot(keys.contains).mkString(",")}")
    val unknown = kinds.collect { case (c, k) if !Set("count", "sum", "min", "max")(k) => s"$c -> $k" }
    require(unknown.isEmpty,
      s"non-distributive combine kind(s): ${unknown.mkString(", ")} — " +
        "maintain sum+count and derive ratios at read time")
    require(valueCols.forall(kinds.contains),
      s"missing combine kind for: ${valueCols.filterNot(kinds.contains).mkString(", ")}")
    val l = valueCols.foldLeft(mv)((d, c) => d.withColumnRenamed(c, s"__l_$c"))
    val r = valueCols.foldLeft(deltaAgg)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val combined = valueCols.map { c =>
      val (lc, rc) = (col(s"__l_$c"), col(s"__r_$c"))
      (kinds(c) match {
        case "count" => coalesce(lc, lit(0L)) + coalesce(rc, lit(0L))
        // sum/min/max keep null-if-absent-on-both semantics: a group all
        // of whose inputs are null aggregates to null in both engines
        case "sum" => when(lc.isNull, rc).when(rc.isNull, lc).otherwise(lc + rc)
        case "min" => when(lc.isNull, rc).when(rc.isNull, lc).otherwise(least(lc, rc))
        case "max" => when(lc.isNull, rc).when(rc.isNull, lc).otherwise(greatest(lc, rc))
      }).as(c)
    }
    // full-outer on the key list: unseen groups insert, absent deltas
    // pass the MV row through — the Seq-overload coalesces key columns
    l.join(r, keys, "full_outer")
      .select(keys.map(col) ++ combined: _*)
  }

  /** Deterministic key dedup: one survivor per key, the row maximal under
    * `tiebreak` (reference dedup: load_stock_metrics.py:88 — its survivor
    * is positional; ours is explicit). */
  def dedupByKey(df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
