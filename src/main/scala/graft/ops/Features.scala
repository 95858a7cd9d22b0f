package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-store primitives: per-entity aggregates with recency
  * semantics, computed at the frame's own watermark so a backfill and
  * a live run produce the same rows for the same data (no wall-clock
  * anywhere — the [[graft.pipeline.StockPipeline]] literal-ingest-ts
  * contract applied to features).
  */
object Features {

  private val d12 = (c: Column) => c.cast("decimal(20,12)")

  /** Leave-one-out target encoding of a categorical key — the standard
    * high-cardinality categorical feature for tree/linear models:
    * each row's encoding is its GROUP's mean target EXCLUDING the row
    * itself, (Σ_g − x_i)/(n_g − 1), so the feature carries no direct
    * target leakage. Rows with a null target take the plain group mean
    * (they contributed nothing to exclude); singleton groups (nothing
    * left after exclusion) surface NULL, never a fabricated value.
    *
    * Exactness: targets quantize to DECIMAL(20,12) before the group
    * sum (order-free); the leave-one-out subtraction stays in decimal
    * (exact), then ONE double division per row, FLOAT at the surface.
    *
    * Plan: one map-side-combined groupBy to |groups| rows, joined back
    * (the planner broadcasts it from stats) — the input is scanned
    * twice, shuffled never. Null keys drop (no group to encode
    * against). */
  def targetEncodeLoo(df: DataFrame, key: String, target: String,
                      out: String = "te"): DataFrame = {
    require(!df.columns.contains(out),
      s"targetEncodeLoo appends column '$out' — rename the existing one")
    val t12 = d12(col(target))
    val g = df.filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(sum(t12).as("__s"), count(col(target)).as("__n"))
    df.filter(col(key).isNotNull)
      .join(g, key)
      .withColumn(out,
        when(col(target).isNull,
          when(col("__n") >= 1, col("__s").cast("double") / col("__n")))
          .otherwise(when(col("__n") >= 2,
            (col("__s") - t12).cast("double") / (col("__n") - 1)))
          .cast("float"))
      .drop("__s", "__n")
  }

  /** Exponentially time-decayed count and value-sum per key — THE
    * standard recency-weighted engagement feature (a click yesterday
    * is worth more than one last month): each event contributes
    * 0.5^((T − t) / halfLife), where T is the frame's max timestamp
    * (the watermark — a pure function of the data, so replays are
    * deterministic).
    *
    * Exactness: the weight is one fixed chain exp(−ln2 · Δt / h) —
    * Δt in integer nanos (≤ 2^53, exact as a double), ln 2 a shared
    * IEEE literal, exp the libm both engines already agree on for the
    * w3 exp∘sum∘ln contract — and every term quantizes to
    * DECIMAL(20,12) BEFORE its sum, so accumulation order cannot leak
    * into the result. Output weights/sums downcast to FLOAT.
    *
    * Plan: one broadcast one-row watermark, one map-side-combined
    * aggregation — scales as a plain groupBy. Null timestamps drop
    * (not an observation); null values contribute to the count but
    * not the sum, matching aggregate semantics. */
  def decayedCounts(df: DataFrame, key: String, tsNanos: String,
                    value: String, halfLifeNanos: Long): DataFrame = {
    require(halfLifeNanos > 0,
      s"halfLifeNanos must be positive, got $halfLifeNanos")
    val wm = df.filter(col(tsNanos).isNotNull)
      .agg(max(col(tsNanos)).as("__wm"))
    val w = exp(lit(-math.log(2.0)) *
      (col("__wm") - col(tsNanos)).cast("double") /
      lit(halfLifeNanos.toDouble))
    df.filter(col(tsNanos).isNotNull)
      .crossJoin(broadcast(wm))
      .withColumn("__w", w)
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(tsNanos)).as("last_ts"),
        sum(d12(col("__w"))).cast("double").cast("float")
          .as("decayed_count"),
        sum(d12(col("__w") * col(value))).cast("double").cast("float")
          .as("decayed_sum"))
  }
}
