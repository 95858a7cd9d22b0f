package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join family: for every left row, the matching right row in the
  * same key group under one of the three standard directions —
  * `backward` (most recent right.ts ≤ left.ts — latest quote for each
  * trade), `forward` (earliest right.ts ≥ left.ts), `nearest` (closer
  * of the two, backward on distance ties) — optionally bounded by a
  * `tolerance` on the time distance (pandas `merge_asof` surface; Spark
  * SQL has no built-in for any of it).
  *
  * Implementation is the scale-safe composition, not a nested-loop or
  * range join: tag both sides, UNION them, and run window passes per
  * key ordered by (ts, side) taking `last(..., ignoreNulls)` /
  * `first(..., ignoreNulls)` of the right-side payload. Cost = one
  * shuffle on the key + per-direction sort — the same plan shape as any
  * windowed aggregation, linear in |L|+|R| and skew-bounded by the key
  * distribution (vs. the O(|L|·|R|) fallback a naive inequality join
  * degenerates to). `nearest` runs both orderings over the ONE
  * exchange.
  *
  * Tie semantics: a right row at exactly left.ts matches in every
  * direction (the side tag sorts it into the frame), matching
  * DuckDB/pandas behavior.
  */
object AsOfJoin {

  /** @param left       probe side (keeps all rows)
    * @param right      reference side
    * @param on         ordering column name (present in both). Numeric
    *                   (e.g. epoch nanos) required for `nearest` and
    *                   `tolerance`, which do distance arithmetic;
    *                   `backward`/`forward` alone accept any ordered type
    * @param by         equi-key column names (present in both)
    * @param valueCols  right-side payload columns to carry to left rows
    * @param direction  "backward" (default) | "forward" | "nearest"
    * @param tolerance  max |left.on − right.on| for a match to stand,
    *                   in `on`'s units; None = unbounded */
  def asOf(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
           valueCols: Seq[String], direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asOf: unknown direction '$direction'")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be non-negative, got $t"))
    val leftCols = left.columns.toSeq
    // internal/output name collisions would silently corrupt the result
    // (a pre-existing __side column, or a left column shadowing asof_*)
    val internal = Seq("__side", "__r", "__asof", "__asof_b", "__asof_f", "__on")
    val outputs = valueCols.map(v => s"asof_$v")
    val clash = (leftCols ++ right.columns).intersect(internal) ++
      leftCols.intersect(outputs)
    require(clash.isEmpty,
      s"asOf: input columns collide with internal/output names: ${clash.mkString(", ")}")
    if (direction != "backward" || tolerance.isDefined) {
      val dt = right.schema(on).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"asOf: direction='$direction'/tolerance need a numeric `$on` " +
          s"(distance arithmetic), got ${dt.simpleString} — convert to epoch nanos first")
    }
    // The whole right-row payload travels as ONE struct, so the fill
    // carries the latest matching ROW — per-column fills would stitch
    // values from different right rows (and skip a legitimate null in
    // the latest row in favor of an older row's value). `on` rides
    // inside it (as __on) so distance checks see the matched row's time;
    // being equal to the sort key already, it does not change tie-break
    // order among same-ts right rows.
    val payload = struct(col(on).as("__on") +: valueCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val l = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    val r = right.select(
      by.map(col) :+ col(on) :+ lit(0).as("__side") :+ payload.as("__r"): _*)
    val unioned = l.select(leftCols.map(col) :+ col("__side") :+ col("__r"): _*)
      .unionByName(r, allowMissingColumns = true)

    // backward: right (side 0) sorts before left at equal ts → frame
    // (-∞, current] sees it; forward mirrors with side order flipped →
    // frame [current, +∞) sees equal-ts right rows.
    // Duplicate-(key, on) right rows: BOTH directions keep the row with
    // the greatest payload struct — backward's last() over __r asc and
    // forward's first() over __r DESC land on the same row, so `nearest`
    // can't flip payloads across a distance tie and the forward/backward
    // answers agree wherever both match the same timestamp. (DuckDB's
    // ASOF JOIN leaves the duplicate choice unspecified; oracle equality
    // on duplicate-ts data relies on this deterministic greatest-row
    // contract.)
    val wb = Window.partitionBy(by.map(col): _*)
      .orderBy(col(on).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(by.map(col): _*)
      .orderBy(col(on).asc, col("__side").desc, col("__r").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withMatch = direction match {
      case "backward" =>
        unioned.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(wb))
      case "forward" =>
        unioned.withColumn("__asof", first(col("__r"), ignoreNulls = true).over(wf))
      case "nearest" =>
        val b = col("__asof_b")
        val f = col("__asof_f")
        val db = col(on) - b.getField("__on")
        val df_ = f.getField("__on") - col(on)
        unioned
          .withColumn("__asof_b", last(col("__r"), ignoreNulls = true).over(wb))
          .withColumn("__asof_f", first(col("__r"), ignoreNulls = true).over(wf))
          // backward wins ties (pandas default); a missing side loses
          .withColumn("__asof",
            when(b.isNull, f).when(f.isNull, b)
              .when(db <= df_, b).otherwise(f))
      case other => throw new IllegalArgumentException(other)
    }
    val dist = abs(col(on) - col("__asof").getField("__on"))
    val gated = tolerance match {
      case Some(t) => withMatch.withColumn("__asof",
        when(dist <= t, col("__asof")).otherwise(lit(null).cast(payloadType)))
      case None => withMatch
    }
    gated.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col("__asof").getField(v).as(s"asof_$v")): _*)
  }
}
