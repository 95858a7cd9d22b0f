package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm", AofA
  * 2007) — the distinct-count sketch re-derived so that EVERY register and
  * the final estimate replay bit-for-bit in any engine with md5.
  *
  * Spark's own `approx_count_distinct` (HLL++) can never be oracled: its
  * register layout and bias tables are engine-internal — which is why
  * [[Dedup.corpusProfile]] builds on THIS module instead. The hash is
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
  *
  * ==Error contract (sizing b for a real corpus)==
  * Standard error of the corrected estimate ≈ 1.04/√m (Flajolet et al.
  * 2007, Thm 1), i.e. RELATIVE error, independent of the true
  * cardinality once past the linear-counting regime:
  * {{{
  *   b =  6 (m =    64):  ±13.0%      b = 10 (m =  1024):  ±3.3%
  *   b =  8 (m =   256):  ± 6.5%      b = 12 (m =  4096):  ±1.6%
  *   b =  9 (m =   512):  ± 4.6%      b = 14 (m = 16384):  ±0.8%
  * }}}
  * (one σ; ~99.7% of estimates land within 3σ). Below raw ≤ 2.5m the
  * linear-counting branch takes over and is MORE accurate (exact as
  * n → 0). Memory is the register frame itself: ≤ 2^b rows of two
  * integers, per group. Companion contracts: Count-Min overcounts by
  * ≤ εN with probability ≥ 1−δ at width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉
  * ([[CountMin]]); the fixed-bin streaming histogram's percentile
  * error is ≤ binWidth/2 by construction
  * ([[graft.streaming.EventStreams.histWindowed]]).
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
    * merge(build(A), build(B)) == build(A ∪ B) register-for-register.
    *
    * `b` is DECLARED, not inferred: unioning sketches built with
    * different register widths produces a plausible-looking but
    * meaningless merged sketch, so every input frame is checked — at
    * plan-build time for the (hll_register, hll_rank) schema, and
    * per row (≤ 2^b rows each, so the guard is free) that the register
    * and rank actually fit b; a frame built with a larger b fails
    * loudly instead of estimating garbage.
    *
    * The guard is ONE-SIDED, not a full compatibility check: a frame
    * built with a SMALLER b usually fits the larger declared shape
    * (registers in range, ranks small) and still merges into a
    * silently meaningless sketch — only the larger-b direction can
    * fail loudly, because the cells themselves carry no b. Declared-b
    * discipline (the same b at build, merge and estimate) is the
    * caller's contract. */
  def merge(b: Int, sketches: DataFrame*): DataFrame = {
    checkB(b)
    require(sketches.nonEmpty, "need at least one sketch to merge")
    sketches.map(checkedRegisterFrame(_, b)).reduce(_ unionByName _)
      .groupBy(col("hll_register"))
      .agg(max(col("hll_rank")).as("hll_rank"))
  }

  /** The register frame with its shape contract enforced row-wise:
    * register ∈ [0, 2^b), rank ∈ [1, 60−b+1]. Values pass through
    * untouched; a violation raises with the offending cell. */
  private def checkedRegisterFrame(sk: DataFrame, b: Int): DataFrame = {
    require(sk.columns.toSet == Set("hll_register", "hll_rank"),
      "expected a register frame with exactly (hll_register, hll_rank), " +
        s"got: ${sk.columns.mkString(", ")}")
    val m = 1L << b
    val maxRank = HashBits - b + 1
    sk.select(col("hll_register"),
      when(col("hll_register").between(0L, m - 1) &&
          col("hll_rank").between(1, maxRank), col("hll_rank"))
        .otherwise(raise_error(concat(
          lit(s"register frame does not fit b=$b (register < $m, " +
            s"rank <= $maxRank required): register="),
          col("hll_register"), lit(" rank="), col("hll_rank"))))
        .as("hll_rank"))
  }

  /** One-row estimate from a register frame: raw = α_m·m²/Z with the
    * integer-scaled harmonic sum Z·2^R = (m−observed)·2^R + Σ 2^(R−rank),
    * plus the standard small-range linear-counting correction
    * (raw ≤ 2.5m and zero registers exist → m·ln(m/zeros)). Columns:
    * hll_estimate FLOAT (corrected), hll_raw FLOAT, n_zero_registers,
    * used_linear_counting — the branch surfaces so a drifting estimate
    * is attributable. */
  def estimate(sketch: DataFrame, b: Int): DataFrame =
    estimateByGroup(sketch, b, Seq.empty)

  /** The bias-correction constant α_m: the asymptotic formula
    * 0.7213/(1 + 1.079/m) is valid only for m ≥ 128 (Flajolet et al.
    * 2007 §4), so the small-m regimes use the paper's tabulated
    * constants — b ∈ {4,5,6} map to α_16/α_32/α_64. A fixed literal
    * per b, replayed verbatim by the oracle SQL. */
  private[graft] def alphaFor(m: Long): Double = m match {
    case 16L => 0.673
    case 32L => 0.697
    case 64L => 0.709
    case _   => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** [[estimate]] per group — for sketches carrying grouping columns
    * beside the registers (e.g. one register set per streaming window):
    * the same math, with the rank max and the fold running inside each
    * group. The window below is partitioned BY THE GROUP and each
    * partition is ≤ 2^b ≤ 65536 register rows by construction (the
    * declared-bounded class) — never the data; with no group it
    * degenerates to the single bounded global frame.
    *
    * Defensive reduce: the estimator assumes ONE row per (group,
    * register), but a caller passing an un-reduced union — or a lake
    * sink a re-run appended to twice — would double-count __observed
    * and corrupt the harmonic sum SILENTLY (every register still in
    * range, just counted twice). The groupBy-max below restores the
    * invariant for free: the frame is ≤ 2^b rows per group by the
    * shape contract, and max is exactly [[merge]]'s combine, so an
    * already-reduced frame passes through unchanged. */
  def estimateByGroup(sketch: DataFrame, b: Int,
                      group: Seq[String]): DataFrame = {
    checkB(b)
    val m = 1L << b
    val alpha = lit(alphaFor(m))
    val reduced = sketch
      .groupBy((group :+ "hll_register").map(col): _*)
      .agg(max(col("hll_rank")).as("hll_rank"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(group.map(col): _*)
    val withR = reduced.withColumn("__rmax",
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
