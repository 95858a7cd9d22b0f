package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key across two versions of a
  * keyed table as `added` / `removed` / `changed` — the audit primitive
  * behind every warehouse migration, CDC-pipeline validation, and
  * "what did last night's load actually do" question. The reference's
  * load step trusts its idempotent delete-then-append blindly
  * (load_stock_metrics.py:56-61); this makes the effect observable.
  *
  * Semantics: one row per key whose presence or compared values differ
  * between versions (unchanged keys produce NOTHING — on a 100 TB
  * table the diff is the interesting sliver, not the echo). `changed`
  * uses null-safe comparison, so a value moving to/from NULL is a
  * change, not a match.
  *
  * Plan shape: one full outer join on the keys — a single hash
  * exchange per side, no windows, no driver materialization; the
  * compared columns ride the join. At scale this is the minimal
  * possible cost for a full reconciliation (every row of both sides
  * must be looked at once).
  */
object Reconcile {

  /** (keys..., change, <col>_before, <col>_after per compare column).
    * `change` ∈ {'added','removed','changed'}. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty,
      "snapshotDiff needs at least one compare column — a keys-only diff " +
        "cannot distinguish changed from unchanged")
    val reserved = Seq("change", "__present_b", "__present_a", "__kc") ++
      compareCols.flatMap(c => Seq(s"${c}_before", s"${c}_after"))
    val clash = (before.columns ++ after.columns).toSet
      .intersect(reserved.toSet)
    require(clash.isEmpty,
      s"snapshotDiff appends ${reserved.mkString(", ")} — inputs already " +
        s"have: $clash; rename first")
    // duplicate keys are not a snapshot — the full outer join would
    // multiply them into contradictory classifications (one row
    // "changed", its twin suppressed). Fail LOUDLY at run time via the
    // assert_true-in-a-kept-predicate trick (a dropped column would be
    // pruned); the window shares the exchange the join needs anyway.
    def keyed(df: DataFrame, side: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      df.withColumn("__kc", count(lit(1)).over(w))
        .where(assert_true(col("__kc") === 1,
          lit(s"snapshotDiff: duplicate keys in the $side snapshot — " +
            "not a keyed table; dedup first")).isNull)
        .drop("__kc")
    }
    val b = keyed(before, "before")
      .select((keys.map(col) :+ lit(true).as("__present_b")) ++
        compareCols.map(c => col(c).as(s"${c}_before")): _*)
    val a = keyed(after, "after")
      .select((keys.map(col) :+ lit(true).as("__present_a")) ++
        compareCols.map(c => col(c).as(s"${c}_after")): _*)
    val joined = b.join(a, keys, "full_outer")
    val valueDiffers: Column = compareCols
      .map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("__present_b").isNull, "added")
          .when(col("__present_a").isNull, "removed")
          .when(valueDiffers, "changed"))
      .filter(col("change").isNotNull)
      .drop("__present_b", "__present_a")
  }

  /** Bucket-level checksum reconciliation — the data-diff pattern for
    * tables too big to row-compare blindly: hash every row to an
    * order-independent fingerprint term, fold terms per md5-derived
    * key bucket, and compare |buckets| (count, checksum) pairs instead
    * of 2×N rows. Matching buckets are PROVEN-equal-with-high-
    * probability and skipped; only mismatched buckets go to the
    * row-level [[snapshotDiff]] — which turns a cross-region 100 TB
    * "are these copies identical?" into a |buckets|-row compare plus
    * row work proportional to the actual damage.
    *
    * The fingerprint is md5 over the compare columns' string forms
    * (nulls marked distinctly — concat_ws would silently collapse a
    * null into an empty string), summed as the first-8-hex-digit int64
    * of each row's digest: addition commutes, so partitioning and
    * order cannot change a bucket's checksum, and every step is
    * engine-portable. CONTRACT: compare columns must have engine-
    * portable string forms (ints, strings, dates, decimals) — cast
    * doubles to DECIMAL/cents first, or two engines' float formatting
    * will disagree on identical data. */
  def bucketChecksums(a: DataFrame, b: DataFrame, key: String,
                      cols: Seq[String], buckets: Int = 256): DataFrame = {
    require(cols.nonEmpty, "bucketChecksums needs compare columns")
    require(buckets >= 1, s"need at least one bucket, got $buckets")
    val fp = md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002NULL"))): _*))
    val term = conv(substring(fp, 1, 8), 16, 10).cast("long")
    def side(df: DataFrame, suffix: String) =
      df.withColumn("__bkt", Sampling.hashBucket(col(key), buckets, tag = "ck:"))
        .withColumn("__t", term)
        .groupBy(col("__bkt"))
        .agg(count(lit(1)).as(s"n_$suffix"), sum(col("__t")).as(s"sum_$suffix"))
    side(a, "a").join(side(b, "b"), Seq("__bkt"), "full_outer")
      .select(col("__bkt").as("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("sum_a"), lit(0L)).as("checksum_a"),
        coalesce(col("sum_b"), lit(0L)).as("checksum_b"),
        (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          coalesce(col("sum_a"), lit(0L)) === coalesce(col("sum_b"), lit(0L)))
          .as("bucket_match"))
  }
}
