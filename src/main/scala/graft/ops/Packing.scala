package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins — the
  * step that turns a filtered corpus into training batches of roughly
  * `budget` tokens each.
  *
  * Semantics: documents are laid out in id order within each group, and
  * a document belongs to bin `floor(tokens_before_it / budget)` — the
  * deterministic streaming-fill form. A document straddling a boundary
  * stays in the earlier bin, so bins can exceed the budget by at most
  * one document; true first-fit packing is a sequential recurrence that
  * no engine can parallelize, and this form is what distributed
  * pipelines actually run.
  *
  * Scale: the running sum is a window per GROUP, so parallelism = the
  * grouping key's cardinality. Pack within a natural shard (language,
  * source, date) — or pre-split with [[Sampling.hashBucket]] — rather
  * than one global ordering, which would funnel 100 TB through one
  * reducer.
  */
object Packing {

  /** Adds `cum_before` (tokens laid out earlier in the group) and
    * `bin_id`. `tokens` must be a non-negative integer column. */
  def packByBudget(df: DataFrame, id: String, tokens: String, budget: Long,
                   group: Seq[String] = Seq.empty): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = if (group.isEmpty) Window.orderBy(col(id))
               else Window.partitionBy(group.map(col): _*).orderBy(col(id))
    val w = base.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(col(tokens)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("cum_before") / budget))
  }

  /** Per-bin fill summary: documents and tokens per bin. */
  def binStats(packed: DataFrame, tokens: String, group: Seq[String] = Seq.empty): DataFrame =
    packed.groupBy((group :+ "bin_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokens)).as("n_tokens"))
}
