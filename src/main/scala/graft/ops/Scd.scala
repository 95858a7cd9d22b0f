package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history build: collapse a stream of
  * per-key attribute observations into validity intervals
  * (`valid_from`, `valid_to`, `is_current`) — the standard warehouse
  * shape for "what was this customer's segment ON that date" queries,
  * and the batch complement of the upsert path in `ops/Merge`
  * (reference: the delete-then-append idempotent load,
  * scripts/load_stock_metrics.py:56-61, keeps only the LATEST value; SCD-2 keeps the
  * full lineage).
  *
  * Plan shape: ONE hash exchange on the key feeds everything. The three
  * window passes (`row_number`, `lag`, running `sum`) share one
  * partitioning and one sort; the per-version rollup groups on
  * (key, version) which the key partitioning already clusters, so no
  * second exchange; the closing `lead` (valid_to = next valid_from)
  * re-sorts key-locally but does not reshuffle. At 100 TB this is a
  * single linear shuffle of the observation table, no joins.
  */
object Scd {

  private val Reserved = Seq("__chg", "version")

  /** Collapse `obs` — one row per (key, observation time) with an
    * attribute column — into Type-2 validity intervals.
    *
    * A new version opens at the first observation of a key and at every
    * observation whose attribute differs (null-safely) from the previous
    * one in (tsCol, tieCol) order. Interval semantics: `valid_from` =
    * first observation time of the version (inclusive); `valid_to` =
    * next version's `valid_from` (exclusive), null for the open current
    * version; `n_obs` = observations collapsed into the version.
    *
    * `tieCol` must make (key, tsCol, tieCol) unique — same-timestamp
    * observations otherwise have engine-dependent order and the version
    * lineage would not be deterministic.
    */
  def type2(obs: DataFrame, key: String, tsCol: String, tieCol: String,
            attrCol: String): DataFrame = {
    val clash = obs.columns.toSet.intersect(Reserved.toSet)
    require(clash.isEmpty,
      s"scd2 appends working columns ${Reserved.mkString(", ")} — " +
        s"the input already has: $clash; rename first")
    val byKey = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    val versioned = obs
      // null-safe change detection; row 1 of a key always opens version 1
      // (lag is null there, and null <=> attr would mis-fuse an all-null head)
      .withColumn("__chg",
        when(row_number().over(byKey) === 1 ||
          !(col(attrCol) <=> lag(col(attrCol), 1).over(byKey)), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("__chg")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val rolled = versioned
      .groupBy(col(key), col("version"))
      .agg(
        // all attr values inside a version are identical by construction
        min(col(attrCol)).as(attrCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val byVersion = Window.partitionBy(col(key)).orderBy(col("version"))
    rolled
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current"), col("n_obs"))
  }
}
