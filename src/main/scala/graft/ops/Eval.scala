package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation primitives over (score, label) frames — the
  * readouts a ranking/classification pipeline checks before shipping a
  * model whose scores gate 100 TB of downstream work (curation
  * thresholds, dedup cutoffs, quality gates). The rank-quality half
  * (AUC) lives in [[Experiment.mannWhitneyU]]; this is the PROBABILITY
  * half: a model can rank perfectly and still lie about its confidence,
  * and a miscalibrated threshold silently shifts how much of the corpus
  * a gate keeps.
  */
object Eval {

  /** Reliability diagram + expected calibration error (Naeini et al.
    * AAAI 2015 / Guo et al. ICML 2017 formulation, equal-WIDTH bins):
    * scores in [0,1] bucket into `bins` fixed-width bins (the top edge
    * closes into the last bin); each bin reports its exact count, mean
    * score (confidence), observed positive rate, and |rate − conf|;
    * every row also carries ECE = Σ (n_b/N)·|rate_b − conf_b| — the
    * one-number summary, weighted by bin mass.
    *
    * Equal-width (not equal-depth) deliberately: the bin edges are then
    * CONSTANTS, so the diagram is comparable across models, days and
    * engines, and binning is a pure map — no ranking pass. Pair with
    * [[Percentiles.equiDepthHistogram]] when adaptive edges matter more
    * than comparability.
    *
    * Exactness: bin = least(⌊score·bins⌋, bins−1) in integer arithmetic;
    * per-bin Σscore quantizes to DECIMAL(30,12) before summing
    * (order-free); rate/conf/gap are fixed double chains; the ECE
    * numerator quantizes each n_b·gap_b term to DECIMAL(30,12) before
    * the final sum so the reduction is order-free too. FLOAT surfaces.
    *
    * Plan shape: ONE map-side-combinable groupBy to ≤ bins rows, then a
    * 1-row broadcast of the ECE total back onto the bins — nothing
    * row-granular shuffles twice, no window. Null scores/labels and
    * scores outside [0,1] carry no evidence and are excluded (out-of-
    * range scores are a SCALING bug the caller must fix, not silently
    * clamp — but they must not corrupt the bins they'd land in). */
  def calibration(df: DataFrame, score: Column, label: Column,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    val s = score.cast("double")
    val base = df
      .filter(s.isNotNull && label.isNotNull && s >= 0.0 && s <= 1.0)
      .select(
        least(floor(s * lit(bins.toDouble)).cast("long"),
          lit(bins.toLong - 1)).as("bin"),
        s.as("__s"), label.cast("int").as("__y"))
    val byBin = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_bin"),
        sum(col("__y").cast("long")).as("__x"),
        sum(col("__s").cast("decimal(30,12)")).as("__sc"))
      .select(col("bin"), col("n_bin"),
        (col("__x").cast("double") / col("n_bin").cast("double")).as("__rate"),
        (col("__sc").cast("double") / col("n_bin").cast("double")).as("__conf"))
    val ece = byBin.agg(
      (sum((col("n_bin").cast("double") * abs(col("__rate") - col("__conf")))
        .cast("decimal(30,12)")).cast("double") /
        sum(col("n_bin")).cast("double")).as("__ece"))
    byBin.crossJoin(broadcast(ece))
      .select(col("bin"), col("n_bin"),
        col("__conf").cast("float").as("mean_score"),
        col("__rate").cast("float").as("rate"),
        abs(col("__rate") - col("__conf")).cast("float").as("gap"),
        col("__ece").cast("float").as("ece"))
  }

  /** Split-conformal quantile per group (Vovk et al.; Lei et al. JASA
    * 2018 formulation): the ⌈(n+1)(1−α)⌉-th smallest calibration
    * residual — the radius q̂ that makes [ŷ − q̂, ŷ + q̂] a
    * finite-sample ≥ (1−α)-coverage prediction interval for ANY
    * underlying model, assuming only exchangeability. This is the
    * distribution-free error bar to attach to a point predictor whose
    * scores gate downstream work; the Wilson/bootstrap CIs bound a
    * MEAN, this bounds the next OBSERVATION.
    *
    * Input: one row per calibration observation with a non-negative
    * `residual` column (|y − ŷ| upstream). Output per group: n_cal,
    * q_conformal, finite_sample_exact — false when ⌈(n+1)(1−α)⌉ > n
    * (n too small for the guarantee at this α; the max residual is
    * returned and the flag tells the caller the guarantee is void
    * rather than silently fabricating one).
    *
    * Exactness: the quantile is an OBSERVED residual picked by integer
    * rank arithmetic over the distinct-residual count ledger
    * ([[Percentiles.nearestRank]]'s machinery — range-exchange prefix
    * sum, no per-group sort, no single-task window), so the value
    * replays bit-for-bit in any engine.
    *
    * Plan shape: one groupBy collapses calibration rows to the
    * (group, residual) ledger; [[Ranking.withRunningTotals]] cumulates
    * it distributed; the pick is a pure filter. */
  def conformalQuantile(df: DataFrame, keys: Seq[String], residual: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val vc = df.filter(col(residual).isNotNull && col(residual) >= 0)
      .groupBy((keys.map(col) :+ col(residual)): _*)
      .agg(count(lit(1)).as("__c"))
    val cum = Ranking.withRunningTotals(vc, keys, Seq(col(residual)),
      Seq("__c" -> "__cum"))
    val tot = cum.groupBy(keys.map(col): _*).agg(sum(col("__c")).as("__n"))
    val withTot =
      if (keys.isEmpty) cum.crossJoin(broadcast(tot))
      else cum.as("__a").join(broadcast(tot).as("__b"),
          keys.map(k => col(s"__a.$k") <=> col(s"__b.$k")).reduce(_ && _))
        .select(cum.columns.map(c => col(s"__a.$c")) :+ col("__b.__n"): _*)
    // k* = min(⌈(n+1)(1−α)⌉, n) in integer arithmetic:
    // ⌈(n+1)(1−α)⌉ computed as ceil of a double product — the same
    // fixed chain in both engines; the pick itself is pure integers
    val kStar = least(
      ceil((col("__n").cast("double") + lit(1.0)) * lit(1.0 - alpha)),
      col("__n"))
    withTot
      .filter(col("__cum") - col("__c") < kStar && kStar <= col("__cum"))
      .select(keys.map(col) ++ Seq(
        col("__n").as("n_cal"),
        col(residual).cast("float").as("q_conformal"),
        (ceil((col("__n").cast("double") + lit(1.0)) * lit(1.0 - alpha)) <=
          col("__n").cast("double")).as("finite_sample_exact")): _*)
  }

  /** Binned ROC curve points — TPR/FPR at each of `bins` fixed score
    * thresholds (descending), the CURVE behind the scalar AUC that
    * [[Experiment.mannWhitneyU]] already reports: a threshold choice
    * (what fraction of the corpus does this quality gate keep, at what
    * true/false positive trade?) needs the whole front, not one number.
    *
    * Equal-width thresholds (t_i = i/bins) for the same reason as
    * [[calibration]]: constant edges make curves comparable across
    * models and rounds, and binning is a pure map. A point at
    * threshold t reports the operating point "keep score ≥ t".
    *
    * Exactness: per-bin (pos, neg) counts are one map-side-combinable
    * groupBy to ≤ bins rows; the cumulative ≥-threshold counts close
    * over those rows with a bounded triangular self-join (≤ bins², all
    * integers — no window, no data-sized pass); TPR/FPR are one double
    * division each, FLOAT surfaces. Empty bins simply contribute no
    * point (their operating point equals the next occupied bin's).
    * Degenerate inputs (no positives / no negatives) yield NULL rates
    * rather than a division artifact. */
  def rocPoints(df: DataFrame, score: Column, label: Column,
                bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    val s = score.cast("double")
    val base = df
      .filter(s.isNotNull && label.isNotNull && s >= 0.0 && s <= 1.0)
      .select(
        least(floor(s * lit(bins.toDouble)).cast("long"),
          lit(bins.toLong - 1)).as("bin"),
        label.cast("int").as("__y"))
    val byBin = base.groupBy(col("bin"))
      .agg(sum(col("__y").cast("long")).as("__pos"),
        sum(lit(1L) - col("__y").cast("long")).as("__neg"))
    val tot = byBin.agg(sum(col("__pos")).as("__p"), sum(col("__neg")).as("__n"))
    val cum = byBin.as("a")
      .join(broadcast(byBin.as("b")), col("b.bin") >= col("a.bin"))
      .groupBy(col("a.bin").as("bin"))
      .agg(sum(col("b.__pos")).as("n_pos_ge"), sum(col("b.__neg")).as("n_neg_ge"))
    cum.crossJoin(broadcast(tot))
      .select(
        (col("bin").cast("double") / lit(bins.toDouble))
          .cast("float").as("threshold"),
        col("n_pos_ge"), col("n_neg_ge"),
        when(col("__p") > 0L,
          (col("n_pos_ge").cast("double") / col("__p").cast("double"))
            .cast("float")).as("tpr"),
        when(col("__n") > 0L,
          (col("n_neg_ge").cast("double") / col("__n").cast("double"))
            .cast("float")).as("fpr"))
  }

  /** Cumulative gains / lift at each score decile (the campaign-
    * targeting readout: "the top 20% of scores capture X% of the
    * positives"): rows rank into `k` equal-population score bands via
    * the distributed global ntile ([[Ranking.withGlobalNtile]] — no
    * single-task window), then one groupBy yields per-band capture and
    * the running totals close over the ≤ k band rows. Band 1 = highest
    * scores. Output per band: n_band, n_pos, cum_pos_share (of all
    * positives), cum_row_share, lift = cum_pos_share/cum_row_share.
    *
    * Ties across a band boundary split by the tiebreak column (pass a
    * unique id) — deterministic, both engines replay the same split. */
  def cumulativeGains(df: DataFrame, score: Column, label: Column,
                      tiebreak: Column, k: Int = 10): DataFrame = {
    require(k >= 2 && k <= 100, s"k must be in [2,100], got $k")
    val base = df.filter(score.isNotNull && label.isNotNull)
      .select(score.cast("double").as("__s"), label.cast("int").as("__y"),
        tiebreak.as("__t"))
    val banded = Ranking.withGlobalNtile(base,
      Seq(col("__s").desc, col("__t")), k, "band")
    val byBand = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n_band"),
        sum(col("__y").cast("long")).as("n_pos"))
    val tot = byBand.agg(sum(col("n_band")).as("__n"),
      sum(col("n_pos")).as("__p"))
    // running totals over ≤ k band rows: a self-join triangular sum —
    // bounded by k, never the data, no window
    val cum = byBand.as("a")
      .join(broadcast(byBand.as("b")), col("b.band") <= col("a.band"))
      .groupBy(col("a.band").as("band"))
      .agg(max(col("a.n_band")).as("n_band"), max(col("a.n_pos")).as("n_pos"),
        sum(col("b.n_band")).as("__cn"), sum(col("b.n_pos")).as("__cp"))
    cum.crossJoin(broadcast(tot))
      .select(col("band"), col("n_band"), col("n_pos"),
        (col("__cp").cast("double") / col("__p").cast("double"))
          .cast("float").as("cum_pos_share"),
        (col("__cn").cast("double") / col("__n").cast("double"))
          .cast("float").as("cum_row_share"),
        ((col("__cp").cast("double") / col("__p").cast("double")) /
          (col("__cn").cast("double") / col("__n").cast("double")))
          .cast("float").as("lift"))
  }
}
