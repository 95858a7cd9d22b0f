package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join for entity resolution: find id pairs whose
  * string column is within `maxDist` Levenshtein edits — the classic
  * record-linkage primitive (name/address dedup), bounded for scale by
  * BLOCKING, the standard ER technique: only records sharing a block
  * key are compared, so the quadratic edit-distance work is confined to
  * block-local pairs instead of the full cross product.
  *
  * Recall is governed by the caller's `block` expression (a pair whose
  * members land in different blocks is never compared — run several
  * passes with different blocking keys for higher recall, exactly like
  * LSH banding in [[Dedup]]). `maxBlock` caps pathological blocks (a
  * degenerate key covering half the table would otherwise reintroduce
  * the quadratic blowup); dropped blocks mean dropped recall, never
  * wrong pairs.
  *
  * Plan shape: one window count on the block key (same exchange the
  * pair join needs), a block-local equi-join — never a cartesian — and
  * the codegen'd `levenshtein` with the THRESHOLD argument, which
  * abandons a row's DP loop as soon as the running distance exceeds
  * `maxDist` (O(maxDist·len) per pair, not O(len²)).
  */
object FuzzyJoin {

  /** (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist; `block` is
    * evaluated against `df`'s columns to form the blocking key. */
  def blockedLevenshtein(df: DataFrame, id: String, str: String,
                         block: Column, maxDist: Int,
                         maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be at least 2, got $maxBlock")
    val blocked = df.select(col(id), col(str), block.as("__blk"))
      .filter(col("__blk").isNotNull)
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__blk"))))
      .filter(col("__bn") <= maxBlock)
      .drop("__bn")
    val a = blocked.select(col("__blk"), col(id).as("id_a"), col(str).as("__sa"))
    val b = blocked.select(col("__blk"), col(id).as("id_b"), col(str).as("__sb"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      // 3-arg levenshtein early-abandons past the threshold and returns
      // -1 there; the filter keeps only genuine ≤ maxDist distances
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
