package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch change-data-capture apply: fold a changelog of keyed
  * upsert/delete operations onto a base snapshot, producing the next
  * snapshot — the generalization of the reference's idempotent
  * delete-then-append load (scripts/load_stock_metrics.py:56-61) from "replace the
  * partition" to row-level ops with ordering.
  *
  * Semantics: for each key, only the LAST change (by `seqCol`,
  * tie-broken by `tieCol`) wins — intermediate changes never touch the
  * base. A final 'U' replaces the base row (or inserts if absent); a
  * final 'D' removes it; keys without changes pass through untouched.
  *
  * Plan shape: one window pass over the changelog (hash exchange on
  * key) picks survivors; the base joins the tiny surviving-change key
  * set with a left-anti (broadcastable when the changelog batch ≪
  * base, which AQE detects at runtime); the union is shuffle-free.
  * Never a base self-scan, never base×changes.
  */
object Cdc {

  /** Apply `changes` (schema: key, seqCol, tieCol, opCol plus the value
    * columns of `base`) onto `base`. `opCol` must hold 'U' (upsert) or
    * 'D' (delete); anything else fails the run loudly rather than
    * silently dropping ops. Returns rows with `base`'s schema. */
  def apply(base: DataFrame, changes: DataFrame, key: String,
            seqCol: String, tieCol: String, opCol: String): DataFrame = {
    val baseCols = base.columns.toSeq
    require(baseCols.contains(key), s"base lacks key column $key")
    val missing = baseCols.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes lack base columns ${missing.mkString(", ")} — a CDC row " +
        "must carry the full image of the row it upserts")
    require(!changes.columns.contains("__rn"),
      "cdc apply uses working column __rn — rename it in changes first")
    val w = Window.partitionBy(col(key))
      .orderBy(col(seqCol).desc, col(tieCol).desc)
    val latest = changes
      // assert_true returns null on success, throws otherwise; the isNull
      // predicate keeps every valid row AND forces evaluation (a dropped
      // column would be pruned and a malformed op would vanish silently).
      // Validation runs BEFORE the per-key winner selection so a corrupt
      // op shadowed by a later change still fails the run, as promised.
      .where(assert_true(col(opCol).isin("U", "D"),
        lit(s"bad CDC op in $opCol (want U|D)")).isNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val changedKeys = latest.select(col(key))
    val upserts = latest.filter(col(opCol) === "U")
      .select(baseCols.map(col): _*)
    base.join(changedKeys, Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
