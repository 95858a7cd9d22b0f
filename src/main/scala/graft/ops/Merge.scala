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
  * Scale notes: the watermark frame is ≤ |keys| rows → always broadcast;
  * `upsert` shuffles once on the key columns. Idempotency (re-running a
  * load must not duplicate) falls out of the anti-join, property-tested.
  */
object Merge {

  /** Per-key high-watermarks of `ord` (reference: load_stock_metrics.py:40-49). */
  def watermarks(df: DataFrame, key: String, ord: String): DataFrame =
    df.groupBy(col(key)).agg(max(col(ord)).as("latest_" + ord))

  /** Keep only rows strictly newer than their key's watermark; keys absent
    * from the watermark frame pass through
    * (reference: load_stock_metrics.py:76-80). */
  def incrementalFilter(incoming: DataFrame, wm: DataFrame,
                        key: String, ord: String): DataFrame = {
    val latest = "latest_" + ord
    incoming.join(broadcast(wm), Seq(key), "left")
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

  /** Deterministic key dedup: one survivor per key, the row maximal under
    * `tiebreak` (reference dedup: load_stock_metrics.py:88 — its survivor
    * is positional; ours is explicit). */
  def dedupByKey(df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
