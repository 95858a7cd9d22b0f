package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-per-key snapshots and top-k.
  *
  * Reference: `ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date DESC)`
  * + `row_num = 1` (scripts/app.py:81-91), per-group "last" aggregation
  * (scripts/app.py:54-66), and sector top movers (scripts/app.py:144-148).
  *
  * Determinism: pandas `.agg('last')` is positional; Spark's `last()` is
  * non-deterministic under parallel execution. We therefore use `max_by`
  * over a (order, tiebreak) struct — lexicographic struct comparison makes
  * the survivor unique and stable at any parallelism.
  */
object Snapshot {

  /** One row per key: the row that is maximal under `order` (descending,
    * lexicographic across the given columns). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).desc): _*)
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num")
  }

  /** Grouped final-value snapshot: for each key, the `value` of the row
    * maximal under (order, tiebreak), plus the max of `order` itself —
    * the `max_by` form of [[latestPerKey]] (one hash aggregate, no sort,
    * no window; preferred at scale when only a few columns are needed). */
  def finalValueByKey(df: DataFrame, key: String, value: String,
                      order: Seq[String]): DataFrame = {
    val ord = struct(order.map(col): _*)
    df.groupBy(col(key)).agg(
      max_by(col(value), ord).as(s"last_$value"),
      max(col(order.head)).as(s"last_${order.head}"),
      count(lit(1)).as("n_rows"))
  }

  /** Top-k rows by `by` descending, ties broken by `tiebreak` ascending.
    * Spark plans this as TakeOrderedAndProject — no global sort
    * materialization (reference: scripts/app.py:144-148). */
  def topK(df: DataFrame, by: String, k: Int, tiebreak: String): DataFrame =
    df.orderBy(col(by).desc, col(tiebreak)).limit(k)

  /** Top-k rows PER GROUP without a hot reducer: a plain
    * `row_number() OVER (PARTITION BY keys)` funnels each whole group
    * through one task, so one giant group (one language, one domain)
    * stalls the stage. Two-phase instead: a first window over
    * (keys, salt-of-discriminator) keeps ≤ k rows per salt lane — an
    * upper bound of the lane's contribution to the true top-k — then the
    * final per-key window ranks at most salts·k survivors per group,
    * O(1) regardless of group size. Same shape as the salted ANN top-k
    * ([[Similarity.topKPerQuery]]), generalized to caller-chosen keys
    * and ordering. `order` must be a total order (include a tiebreak)
    * for a deterministic result; `rank` is appended 1..k. */
  def groupedTopK(df: DataFrame, keys: Seq[String], order: Seq[Column],
                  k: Int, discriminator: Column, salts: Int = 16): DataFrame = {
    require(!df.columns.exists(Set("__salt", "__r1", "rank")),
      "groupedTopK appends __salt/__r1/rank working columns — input " +
        "already has one of them; rename it first")
    val w1 = Window.partitionBy(keys.map(col) :+ col("__salt"): _*)
      .orderBy(order: _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__salt", Skew.salt(discriminator, salts))
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .drop("__salt", "__r1")
  }
}
