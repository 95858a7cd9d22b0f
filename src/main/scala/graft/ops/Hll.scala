package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm", AofA
  * 2007) — the distinct-count sketch re-derived so that EVERY register and
  * the final estimate replay bit-for-bit in any engine with md5.
  *
  * Spark's own `approx_count_distinct` (HLL++) is rows-only by declared
  * design in [[Dedup.corpusProfile]]: its register layout and bias tables
  * are engine-internal. This module is the oracled sibling: the hash is
  * the repo's standard md5 trick (first 15 hex chars of md5("hll:" ++ key)
  * = a 60-bit non-negative integer — 15, not 16, so the BIGINT parse never
  * wraps negative in either engine), the register is the low `b` bits
  * (pmod), the rank is computed from the LENGTH OF THE BINARY STRING of
  * the remaining 60−b bits (`conv(v,10,2)` here, `bin(v)` in DuckDB — both
  * drop leading zeros, so rank = W − length + 1 is exact integer
  * arithmetic, no floating log2 whose boundary rounding could disagree),
  * and the harmonic sum is an INTEGER: Σ 2^(−M_j) is scaled by 2^R (R =
  * max rank) so every addend is a `shiftleft` — zero float accumulation,
  * order-free, engine-exact. Floats appear only in the final
  * alpha·m²·2^R/Z division and the ln of the small-range linear-counting
  * correction, both surfaced as FLOAT (the repo's standard last-ulp
  * absorber).
  *
  * Scale shape: build is ONE map-side-combined aggregation to ≤ m rows
  * (each input row maps to a single (register, rank) cell; the combine is
  * max) — the estimator then folds the ≤ m-row frame to one row. A
  * trillion-row corpus meets the sketch only in its own partitions, and
  * register frames from disjoint partitions/days MERGE by the same
  * groupBy-max ([[merge]]), which is what makes the sketch distributable.
  */
object Hll {

  /** Total hash bits carried by 15 hex chars. */
  private val HashBits = 60

  private def checkB(b: Int): Unit =
    require(b >= 4 && b <= 16, s"register bits b must be in [4,16], got $b")

  /** The 60-bit md5 hash of `key` (non-negative in a signed 64-bit lane). */
  def hash60(key: Column): Column =
    conv(substring(md5(concat(lit("hll:"), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** The register (low b bits of the 60-bit hash) `key` lands in —
    * public so streaming composites expand cells with the exact hash
    * the batch build uses (and the oracle replays). */
  def registerOf(key: Column, b: Int): Column =
    pmod(hash60(key), lit(1L << b))

  /** The rank (1-based position of the first 1-bit in the W = 60−b
    * value bits): W − len(bin(v)) + 1 via the binary-string length —
    * exact integer arithmetic, no floating log2 — and W+1 when v = 0.
    * v comes from an exact shift, NOT h/m (Spark evaluates `/` on
    * longs as double division, which loses bits above 2^53). */
  def rankOf(key: Column, b: Int): Column = {
    val w = HashBits - b
    val v = shiftright(hash60(key), b)
    when(v === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(conv(v, 10, 2)))
  }

  /** Register frame (hll_register, hll_rank) — ≤ 2^b rows, absent
    * registers implicitly rank 0. Null keys carry no evidence and are
    * excluded. */
  def build(df: DataFrame, key: String, b: Int): DataFrame = {
    checkB(b)
    df.filter(col(key).isNotNull)
      .select(registerOf(col(key), b).as("hll_register"),
        rankOf(col(key), b).as("hll_rank"))
      .groupBy(col("hll_register"))
      .agg(max(col("hll_rank")).as("hll_rank"))
  }

  /** Cell-wise merge of register frames built with the same `b` — the
    * sketch's distributive property (max commutes with partitioning):
    * merge(build(A), build(B)) == build(A ∪ B) register-for-register. */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("hll_register"))
      .agg(max(col("hll_rank")).as("hll_rank"))
  }

  /** One-row estimate from a register frame: raw = α_m·m²/Z with the
    * integer-scaled harmonic sum Z·2^R = (m−observed)·2^R + Σ 2^(R−rank),
    * plus the standard small-range linear-counting correction
    * (raw ≤ 2.5m and zero registers exist → m·ln(m/zeros)). Columns:
    * hll_estimate FLOAT (corrected), hll_raw FLOAT, n_zero_registers,
    * used_linear_counting — the branch surfaces so a drifting estimate
    * is attributable. α_m = 0.7213/(1 + 1.079/m) (valid m ≥ 128; callers
    * wanting smaller m own the constant-regime caveat). */
  def estimate(sketch: DataFrame, b: Int): DataFrame =
    estimateByGroup(sketch, b, Seq.empty)

  /** [[estimate]] per group — for sketches carrying grouping columns
    * beside the registers (e.g. one register set per streaming window):
    * the same math, with the rank max and the fold running inside each
    * group. The window below is partitioned BY THE GROUP and each
    * partition is ≤ 2^b ≤ 65536 register rows by construction (the
    * declared-bounded class) — never the data; with no group it
    * degenerates to the single bounded global frame. */
  def estimateByGroup(sketch: DataFrame, b: Int,
                      group: Seq[String]): DataFrame = {
    checkB(b)
    val m = 1L << b
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(group.map(col): _*)
    val withR = sketch.withColumn("__rmax",
      max(col("hll_rank")).over(wAll))
    val agged = withR.groupBy(group.map(col): _*).agg(
      count(lit(1)).as("__observed"),
      coalesce(max(col("__rmax")), lit(0)).as("__rmax"),
      // Σ over OBSERVED registers of 2^(R − rank); the (m − observed)
      // zero-rank registers contribute 2^R each, added below. R ≤ 57
      // and R − rank ≥ 0 by construction, so every shift is exact and
      // the sum stays under 2^62 for every legal b.
      coalesce(sum(expr("shiftleft(1L, int(__rmax - hll_rank))")), lit(0L))
        .as("__zobs"))
    val zNum = col("__zobs") + (lit(m) - col("__observed")) *
      expr("shiftleft(1L, int(__rmax))")
    val raw = alpha * lit(m.toDouble) * lit(m.toDouble) *
      pow(lit(2.0), col("__rmax").cast("double")) / zNum.cast("double")
    val zeros = lit(m) - col("__observed")
    val corrected = when(raw <= lit(2.5) * lit(m.toDouble) && zeros > 0L,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    agged.select(group.map(col) ++ Seq(
      corrected.cast("float").as("hll_estimate"),
      raw.cast("float").as("hll_raw"),
      zeros.as("n_zero_registers"),
      (raw <= lit(2.5) * lit(m.toDouble) && zeros > 0L)
        .as("used_linear_counting")): _*)
  }
}
