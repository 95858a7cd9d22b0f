package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row
  * with `right.ts <= left.ts` within the same key group — the canonical
  * time-series operator (latest quote for each trade) that Spark SQL has
  * no built-in for.
  *
  * Implementation is the scale-safe composition, not a nested-loop or
  * range join: tag both sides, UNION them, and run ONE window pass per
  * key ordered by (ts, side) taking `last_value(..., ignoreNulls)` of the
  * right-side payload. Cost = one shuffle on the key + one sort — the
  * same plan shape as any windowed aggregation, linear in |L|+|R| and
  * skew-bounded by the key distribution (vs. the O(|L|·|R|) fallback a
  * naive `left.ts >= right.ts` range join degenerates to).
  *
  * Tie semantics: a right row at exactly left.ts matches (right sorts
  * before left at equal ts), matching DuckDB/pandas `ASOF JOIN`
  * backward semantics.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side
    * @param on        ordering column name (present in both; numeric/timestamp)
    * @param by        equi-key column names (present in both)
    * @param valueCols right-side payload columns to carry to left rows
    */
  def asOf(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
           valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // internal/output name collisions would silently corrupt the result
    // (a pre-existing __side column, or a left column shadowing asof_*)
    val internal = Seq("__side", "__r", "__asof")
    val outputs = valueCols.map(v => s"asof_$v")
    val clash = (leftCols ++ right.columns).intersect(internal) ++
      leftCols.intersect(outputs)
    require(clash.isEmpty,
      s"asOf: input columns collide with internal/output names: ${clash.mkString(", ")}")
    // The whole right-row payload travels as ONE struct, so the fill
    // carries the latest matching ROW — per-column fills would stitch
    // values from different right rows (and skip a legitimate null in
    // the latest row in favor of an older row's value).
    val payload = struct(valueCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    // 0 = right side, 1 = left side → right sorts first at equal ts
    val l = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    val r = right.select(
      by.map(col) :+ col(on) :+ lit(0).as("__side") :+ payload.as("__r"): _*)
    val unioned = l.select(leftCols.map(col) :+ col("__side") :+ col("__r"): _*)
      .unionByName(r, allowMissingColumns = true)
    // the payload struct joins the sort key so duplicate right timestamps
    // resolve deterministically (greatest payload row wins the tie)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(on).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col("__asof").getField(v).as(s"asof_$v")): _*)
  }
}
