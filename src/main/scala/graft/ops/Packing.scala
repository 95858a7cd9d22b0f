package graft.ops

import org.apache.spark.sql.DataFrame
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
  * Scale: the running layout rides [[Ranking.withRunningTotals]]'s
  * range-partition + ledger prefix sum — both the GLOBAL ordering
  * (group = ∅, the whole corpus in one deterministic layout) and a
  * hot group stay fully partitioned, where the former window form
  * funneled the global case through one reducer. Grouping by a
  * natural shard (language, source, date) is still the right call —
  * not for safety anymore, but because per-shard bins are what
  * training mixtures consume.
  */
object Packing {

  /** Adds `cum_before` (tokens laid out earlier in the group) and
    * `bin_id`. `tokens` must be a non-negative integer column, and
    * `id` must be unique within its group (it IS the layout order). */
  def packByBudget(df: DataFrame, id: String, tokens: String, budget: Long,
                   group: Seq[String] = Seq.empty): DataFrame = {
    require(budget > 0, "budget must be positive")
    Ranking.withRunningTotals(df, group, Seq(col(id)),
        Seq(tokens -> "__cum_incl"))
      // exclusive prefix = inclusive − own tokens (the lag-free form)
      .withColumn("cum_before", col("__cum_incl") - col(tokens))
      .withColumn("bin_id", floor(col("cum_before") / budget))
      .drop("__cum_incl")
  }

  /** Per-bin fill summary: documents and tokens per bin. */
  def binStats(packed: DataFrame, tokens: String, group: Seq[String] = Seq.empty): DataFrame =
    packed.groupBy((group :+ "bin_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokens)).as("n_tokens"))
}
