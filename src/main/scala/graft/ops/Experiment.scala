package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B experiment readout: Welch's unequal-variance two-sample t-test
  * per metric group — the decision layer on top of the engine's
  * deterministic hash splits ([[Sampling]]): once traffic is split,
  * "did variant B move the metric?" is this one aggregation.
  *
  * Welch (not pooled Student): real experiment arms almost never share
  * a variance, and the pooled test silently inflates significance when
  * the bigger arm is also the noisier one. t = (m_a − m_b) / √(s²_a/n_a
  * + s²_b/n_b), with the Welch–Satterthwaite degrees of freedom.
  *
  * Exactness contract: per-arm sums quantize to DECIMAL(18,2) and the
  * squared values to DECIMAL(30,12) BEFORE summing, so each arm's
  * (n, Σx, Σx²) is reduction-order-exact; mean and variance are then a
  * fixed chain of double ops both engines replay bit-for-bit, and the
  * t statistic / df surface as FLOAT per the ratio-chain convention.
  * Sample variance uses the n−1 denominator via the co-moment form
  * s² = (Σx² − (Σx)²/n)/(n−1) — one subtraction of exact-decimal-
  * derived doubles, not a two-pass mean-centered sum.
  *
  * Plan shape: ONE map-side-combinable groupBy over (group, variant) —
  * the full fact table reduces to 2 rows per metric group before the
  * pivot join; nothing event-granular shuffles twice. At 100 TB this
  * is the cheapest shape a significance test can have.
  */
object Experiment {

  private def d2(c: Column) = c.cast("decimal(18,2)")
  private def d30(c: Column) = c.cast("decimal(30,12)")

  /** One row per `group` with both arms' (n, mean), the Welch t
    * statistic and degrees of freedom. `variant` must carry exactly the
    * two values `armA`/`armB`; other rows are ignored. Groups missing
    * an arm, or with an arm of n < 2, are dropped (no t-test exists). */
  def welchTTest(df: DataFrame, group: String, variant: String,
                 value: String, armA: String = "A", armB: String = "B"): DataFrame = {
    val byArm = df
      .filter(col(variant).isin(armA, armB) && col(value).isNotNull)
      .groupBy(col(group), col(variant))
      .agg(count(lit(1)).as("__n"),
        sum(d2(col(value))).as("__s"),
        sum(d30(col(value) * col(value))).as("__ss"))
    def arm(tag: String, v: String) = byArm.filter(col(variant) === v)
      .select(col(group), col("__n").as(s"n_$tag"),
        col("__s").as(s"__s_$tag"), col("__ss").as(s"__ss_$tag"))
    def mean(tag: String) =
      col(s"__s_$tag").cast("double") / col(s"n_$tag").cast("double")
    // s² = (Σx² − (Σx)²/n) / (n−1): the decimals cast to double first,
    // then one fixed subtraction/division chain — identical both engines
    def variance(tag: String) =
      (col(s"__ss_$tag").cast("double") -
        (col(s"__s_$tag").cast("double") * col(s"__s_$tag").cast("double")) /
          col(s"n_$tag").cast("double")) /
        (col(s"n_$tag").cast("double") - lit(1.0))
    arm("a", armA).join(arm("b", armB), Seq(group))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("mean_a", mean("a"))
      .withColumn("mean_b", mean("b"))
      .withColumn("__va", variance("a") / col("n_a").cast("double"))
      .withColumn("__vb", variance("b") / col("n_b").cast("double"))
      .withColumn("t_stat",
        ((col("mean_a") - col("mean_b")) /
          sqrt(col("__va") + col("__vb"))).cast("float"))
      // Welch–Satterthwaite: df = (va+vb)² / (va²/(na−1) + vb²/(nb−1))
      .withColumn("df",
        (((col("__va") + col("__vb")) * (col("__va") + col("__vb"))) /
          ((col("__va") * col("__va")) / (col("n_a").cast("double") - lit(1.0)) +
            (col("__vb") * col("__vb")) / (col("n_b").cast("double") - lit(1.0))))
          .cast("float"))
      .select(col(group), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("t_stat"), col("df"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) per metric group — the
    * nonparametric complement of [[welchTTest]]: rank-based, so a
    * heavy-tailed or skewed metric (latency, spend) cannot fake or mask
    * a shift the way it can with means. Normal approximation with the
    * standard tie correction.
    *
    * Exactness: everything up to the final z is INTEGER — ranks are
    * handled in DOUBLED form (average rank ×2 = 2·cumulative − tiecount
    * + 1, an integer even for .5 ties), so U×2, the tie term Σ(t³−t)
    * and all counts are exact BIGINTs, and z is one fixed double chain
    * both engines replay:
    *   z = (2U − n₁n₂) / (2·√((n₁n₂/12)·((n+1) − Σ(t³−t)/(n·(n−1)))))
    *
    * Direction: `u_stat` is U_A = R_A − n_a(n_a+1)/2 — the U of arm A,
    * the value scipy's `mannwhitneyu(A, B)` returns — so **z > 0 means
    * arm A is stochastically larger**, the same sign convention as
    * [[welchTTest]]'s t_stat (positive = arm A's mean larger); the two
    * readouts agree in direction on the same data.
    *
    * Plan: one groupBy to the (group, value) tie frame, one
    * group-partitioned window for cumulative counts, one final rollup —
    * the fact table reduces before anything wide. Groups with an empty
    * arm or fewer than 2 total observations drop. */
  def mannWhitneyU(df: DataFrame, group: String, variant: String,
                   value: String, armA: String = "A", armB: String = "B"): DataFrame = {
    val tie = df
      .filter(col(variant).isin(armA, armB) && col(value).isNotNull)
      .groupBy(col(group), col(value).as("__v"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col(variant) === armA, 1L).otherwise(0L)).as("__ca"))
    val w = Window.partitionBy(col(group)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = tie
      .withColumn("__cum", sum(col("__c")).over(w))
      .groupBy(col(group))
      .agg(
        sum(col("__ca")).as("n_a"),
        sum(col("__c") - col("__ca")).as("n_b"),
        // Σ over A-rows of doubled average rank — integer-exact
        sum(col("__ca") * (lit(2L) * col("__cum") - col("__c") + 1L)).as("__r1x2"),
        sum(col("__c") * col("__c") * col("__c") - col("__c")).as("__ties"))
      .filter(col("n_a") >= 1 && col("n_b") >= 1 &&
        col("n_a") + col("n_b") >= 2)
    agg
      .withColumn("__u1x2",
        col("__r1x2") - col("n_a") * (col("n_a") + 1L))
      .withColumn("u_stat", col("__u1x2").cast("double") / lit(2.0))
      .withColumn("__n", col("n_a") + col("n_b"))
      .withColumn("z", {
        val nD = col("__n").cast("double")
        val sigma2 =
          (col("n_a").cast("double") * col("n_b").cast("double") / lit(12.0)) *
            ((nD + lit(1.0)) -
              col("__ties").cast("double") / (nD * (nD - lit(1.0))))
        ((col("__u1x2") - col("n_a") * col("n_b")).cast("double") /
          nullif(lit(2.0) * sqrt(sigma2), lit(0.0))).cast("float")
      })
      .select(col(group), col("n_a"), col("n_b"), col("u_stat"), col("z"))
  }

  /** Pearson chi-square test of independence per metric group: does the
    * OUTCOME distribution differ across variants? The categorical
    * complement of [[welchTTest]] (conversion/tier shifts rather than
    * mean shifts). χ² = Σ_cells (n − e)²/e with e = row·col/N over the
    * FULL variant×outcome grid — zero cells contribute e, so the grid
    * is generated from the marginals (r×c rows per group, bounded by
    * the category counts), never just from observed cells.
    *
    * Exactness: all counts and marginals are exact BIGINTs; each
    * cell's (n−e)²/e is one fixed double chain quantized to
    * DECIMAL(20,12) before the order-free sum; df = (r−1)(c−1) is
    * integer. χ² surfaces as FLOAT per the ratio-chain convention.
    *
    * Plan: one map-side-combinable groupBy to the observed cells, two
    * marginal rollups of that (already tiny) frame, a marginal×marginal
    * grid join per group, one final rollup. The fact table reduces
    * before anything wide. */
  def chiSquare(df: DataFrame, group: String, variant: String,
                outcome: String): DataFrame = {
    val cells = df
      .filter(col(variant).isNotNull && col(outcome).isNotNull)
      .groupBy(col(group), col(variant), col(outcome))
      .agg(count(lit(1)).as("__nc"))
    val rows = cells.groupBy(col(group), col(variant))
      .agg(sum(col("__nc")).as("__nr"))
    val cols = cells.groupBy(col(group), col(outcome))
      .agg(sum(col("__nc")).as("__no"))
    val grid = rows.join(cols, Seq(group))
      .join(cells, Seq(group, variant, outcome), "left")
      .withColumn("__n", coalesce(col("__nc"), lit(0L)))
    val tot = cells.groupBy(col(group))
      .agg(sum(col("__nc")).as("n"),
        countDistinct(col(variant)).as("__r"),
        countDistinct(col(outcome)).as("__c"))
    val e = col("__nr").cast("double") * col("__no").cast("double") /
      col("n").cast("double")
    val term = (col("__n").cast("double") - e) *
      (col("__n").cast("double") - e) / e
    grid.join(tot, Seq(group))
      .groupBy(col(group))
      .agg(min(col("n")).as("n"),
        ((min(col("__r")) - 1L) * (min(col("__c")) - 1L)).as("dof"),
        sum(term.cast("decimal(20,12)")).cast("double").cast("float")
          .as("chi2"))
      .filter(col("dof") >= 1)
  }

  /** Two-sample proportion z-test per metric group — the
    * conversion-rate readout (did the SUCCESS RATE move?), the
    * directional complement of [[chiSquare]]'s 2×2 (χ² says the mix
    * shifted; z says which way and by how much):
    *   z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled.
    *
    * Exactness: successes and totals are exact BIGINTs from one
    * map-side-combinable groupBy; the rates and z close in one fixed
    * double chain both engines replay, FLOAT at the surface. A pooled
    * rate of 0 or 1 (no variance) yields NULL z via nullif, never a
    * division blowup. Groups missing an arm drop.
    *
    * `success` must be a boolean column; null successes are excluded
    * (not an observation). */
  def proportionZTest(df: DataFrame, group: String, variant: String,
                      success: String, armA: String = "A",
                      armB: String = "B"): DataFrame = {
    val byArm = df
      .filter(col(variant).isin(armA, armB) && col(success).isNotNull)
      .groupBy(col(group), col(variant))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(success), 1L).otherwise(0L)).as("__x"))
    def arm(tag: String, v: String) = byArm.filter(col(variant) === v)
      .select(col(group), col("__n").as(s"n_$tag"), col("__x").as(s"x_$tag"))
    val j = arm("a", armA).join(arm("b", armB), Seq(group))
      .filter(col("n_a") >= 1 && col("n_b") >= 1)
    val pa = col("x_a").cast("double") / col("n_a").cast("double")
    val pb = col("x_b").cast("double") / col("n_b").cast("double")
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    j.select(col(group), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      pa.cast("float").as("rate_a"), pb.cast("float").as("rate_b"),
      ((pa - pb) / nullif(se, lit(0.0))).cast("float").as("z"))
  }

  /** CUPED variance reduction (Deng 2013) per metric group: the
    * experiment readout adjusted by each unit's PRE-experiment metric —
    * the industry-standard way to shrink confidence intervals without
    * more traffic. With pooled θ = cov(x,y)/var(x) over all units, the
    * adjusted per-unit metric is y − θ(x − x̄), and because the
    * adjustment is linear the ARM MEANS close in aggregates alone:
    * diff_adj = diff_raw − θ·(x̄_A − x̄_B). Also reports the variance
    * reduction ratio ρ² = cov²/(var_x·var_y) — the fraction of metric
    * variance the covariate removes.
    *
    * Input: one row per (group, unit) with exact pre/post metric
    * columns and the unit's variant. Exactness: Σx, Σy quantize to
    * DECIMAL(18,2) and Σxy, Σx², Σy² to DECIMAL(30,12) before summing;
    * θ, the diffs and ρ² are fixed double chains over those exact
    * sums, FLOAT at the surface. Groups missing an arm or with
    * var(x) = 0 drop (θ undefined).
    *
    * Plan: ONE map-side-combinable groupBy over (group, variant) — six
    * sums — then a 2-row pivot join per group, nothing unit-granular
    * shuffles twice. */
  def cuped(df: DataFrame, group: String, variant: String,
            pre: String, post: String,
            armA: String = "A", armB: String = "B"): DataFrame = {
    val byArm = df
      .filter(col(variant).isin(armA, armB) &&
        col(pre).isNotNull && col(post).isNotNull)
      .groupBy(col(group), col(variant))
      .agg(count(lit(1)).as("__n"),
        sum(d2(col(pre))).as("__sx"),
        sum(d2(col(post))).as("__sy"),
        sum(d30(col(pre) * col(post))).as("__sxy"),
        sum(d30(col(pre) * col(pre))).as("__sxx"),
        sum(d30(col(post) * col(post))).as("__syy"))
    def arm(tag: String, v: String) = byArm.filter(col(variant) === v)
      .select(col(group), col("__n").as(s"n_$tag"),
        col("__sx").as(s"__sx_$tag"), col("__sy").as(s"__sy_$tag"),
        col("__sxy").as(s"__sxy_$tag"), col("__sxx").as(s"__sxx_$tag"),
        col("__syy").as(s"__syy_$tag"))
    // pooled moments close θ and ρ²; the (n−1) denominators cancel in
    // both ratios so the co-moment numerators are used directly
    val joined = arm("a", armA).join(arm("b", armB), Seq(group))
    val n = (col("n_a") + col("n_b")).cast("double")
    val sx = col("__sx_a").cast("double") + col("__sx_b").cast("double")
    val sy = col("__sy_a").cast("double") + col("__sy_b").cast("double")
    val sxy = col("__sxy_a").cast("double") + col("__sxy_b").cast("double")
    val sxx = col("__sxx_a").cast("double") + col("__sxx_b").cast("double")
    val syy = col("__syy_a").cast("double") + col("__syy_b").cast("double")
    val covN = sxy - sx * sy / n
    val varxN = sxx - sx * sx / n
    val varyN = syy - sy * sy / n
    val theta = covN / varxN
    val meanDiff = (s: String) =>
      col(s + "_a").cast("double") / col("n_a").cast("double") -
        col(s + "_b").cast("double") / col("n_b").cast("double")
    joined
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("__vx", varxN)
      .filter(col("__vx") =!= lit(0.0))
      .withColumn("theta", theta.cast("float"))
      .withColumn("diff_raw", meanDiff("__sy").cast("float"))
      .withColumn("diff_adj",
        (meanDiff("__sy") - theta * meanDiff("__sx")).cast("float"))
      .withColumn("var_reduction",
        (covN * covN / nullif(varxN * varyN, lit(0.0))).cast("float"))
      .select(col(group), col("n_a"), col("n_b"), col("theta"),
        col("diff_raw"), col("diff_adj"), col("var_reduction"))
  }

  /** Wilson score interval per (group, variant) success rate — the
    * small-n-safe CI for a proportion (the Wald interval collapses to
    * zero width at p̂ ∈ {0,1} and escapes [0,1] near the edges; Wilson
    * does neither), i.e. the error bars a conversion dashboard should
    * draw next to [[proportionZTest]]'s significance call. With
    * zz = z²: center = (p̂ + zz/2n)/(1 + zz/n),
    * half = z·√(p̂(1−p̂)/n + zz/4n²)/(1 + zz/n).
    *
    * Exactness: (n, x) are exact integers from ONE map-side-combinable
    * groupBy; the interval is a fixed double chain per output row
    * (≤ |groups|·|variants| rows), FLOAT at the surface.
    *
    * Rows with a NULL `success` carry no evidence and are EXCLUDED
    * from both n and x (the repo-wide NULL convention) — counting them
    * in n but not x would silently read NULL as failure and bias the
    * rate down. */
  def wilsonCi(df: DataFrame, group: String, variant: String,
               success: Column, z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be > 0, got $z")
    val zz = z * z
    val agged = df.filter(col(variant).isNotNull && success.isNotNull)
      .groupBy(col(group), col(variant))
      .agg(count(lit(1)).as("n"), sum(success.cast("long")).as("x"))
    val nD = col("n").cast("double")
    val p = col("x").cast("double") / nD
    val denom = lit(1.0) + lit(zz) / nD
    val center = (p + lit(zz) / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(zz) / (lit(4.0) * nD * nD))) / denom
    agged.select(col(group), col(variant), col("n"), col("x"),
      p.cast("float").as("rate"),
      (center - half).cast("float").as("ci_lo"),
      (center + half).cast("float").as("ci_hi"))
  }

  /** Cumulative Poisson(1) CDF thresholds for the deterministic draw:
    * u < F(k) ⟹ weight k (capped at 5, which covers 99.9941% of the
    * mass — the cap is a declared, engine-identical bias). Fixed double
    * literals, so the comparison replays in any engine. */
  private val poissonCdf =
    Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563)

  /** Distributed bootstrap confidence interval for the A−B mean
    * difference, via the POISSON bootstrap (Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google TR 2012): instead of
    * a multinomial resample — which needs n and coordination — each row
    * independently enters replica r with weight ~ Poisson(1). The draw
    * is the repo's deterministic md5 uniform (tag `boot<r>:<id>`), so
    * every replica is replayable in any engine.
    *
    * Welch gives the parametric CI; THIS is the distribution-free one a
    * skewed metric (spend, latency) needs. Shape: rows expand ×B in a
    * pure map and collapse immediately in ONE map-side-combinable
    * groupBy to ≤ |groups|·2·B partial rows — the only thing shuffled.
    * Per-replica means divide exact DECIMAL sums; the CI bounds are
    * nearest-rank order statistics over the B per-replica diffs
    * (rank ⌈α·B⌉ / ⌈(1−α)·B⌉, a bounded B-row window per group — never
    * a float-equality compare). A replica that starves an arm (sum of
    * weights 0 — vanishing for real n) is dropped and surfaces in
    * n_replicas_effective. */
  def bootstrapMeanDiffCi(df: DataFrame, group: String, variant: String,
                          value: String, id: String, armA: String = "A",
                          armB: String = "B", replicas: Int = 64,
                          alpha: Double = 0.025): DataFrame = {
    require(replicas >= 8 && replicas <= 1024,
      s"replicas must be in [8,1024], got $replicas")
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0,0.5), got $alpha")
    val u = conv(substring(md5(concat(lit("boot"), col("__r"), lit(":"),
        col(id).cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52
    val weight = poissonCdf.zipWithIndex.foldRight(lit(5)) {
      case ((thr, k), rest) => when(u < lit(thr), lit(k)).otherwise(rest)
    }
    // the ×B replica explode + per-(row, replica) md5 draw + map-side
    // combine all run ON THE SCAN PARTITIONING — a one-split events
    // file would hash |rows|·B draws in ONE task ([[Skew.spread]];
    // no-op once splits ≥ cores, so at 100 TB the exchange never fires)
    val byArm = Skew.spread(df
      .filter(col(variant).isin(armA, armB) && col(value).isNotNull))
      .select(col(group), col(variant), col(value), col(id),
        explode(sequence(lit(0), lit(replicas - 1))).as("__r"))
      .groupBy(col(group), col(variant), col("__r"))
      .agg(sum(weight.cast("long")).as("__wn"),
        sum(weight.cast("long") * d2(col(value))).as("__ws"))
    def arm(tag: String, v: String) = byArm.filter(col(variant) === v)
      .select(col(group), col("__r"), col("__wn").as(s"__wn_$tag"),
        col("__ws").as(s"__ws_$tag"))
    val diffs = arm("a", armA).join(arm("b", armB), Seq(group, "__r"))
      .filter(col("__wn_a") > 0 && col("__wn_b") > 0)
      .select(col(group), col("__r"),
        (col("__ws_a").cast("double") / col("__wn_a").cast("double") -
          col("__ws_b").cast("double") / col("__wn_b").cast("double"))
          .as("__diff"))
    // nearest-rank order statistics over the ≤ B replica diffs — the
    // per-group window is bounded by `replicas`, never the data
    val wRank = Window.partitionBy(col(group))
      .orderBy(col("__diff"), col("__r"))
    val wAll = Window.partitionBy(col(group))
    diffs.withColumn("__rank", row_number().over(wRank))
      .withColumn("__b", count(lit(1)).over(wAll))
      .groupBy(col(group))
      .agg(
        max(col("__b")).as("n_replicas_effective"),
        min(when(col("__rank") === ceil(lit(alpha) * col("__b")),
          col("__diff"))).cast("float").as("ci_lo"),
        min(when(col("__rank") === ceil(lit(1 - alpha) * col("__b")),
          col("__diff"))).cast("float").as("ci_hi"),
        // quantized exact sum, ONE double division — a raw double avg
        // would be reduction-order-dependent, and engines disagree on
        // avg-over-decimal intermediates
        (sum(col("__diff").cast("decimal(30,12)")).cast("double") /
          count(lit(1)).cast("double")).cast("float").as("diff_boot_mean"))
  }

  /** Mixture sequential probability ratio test (mSPRT) — the
    * always-valid sequential boundary over the Welch machinery (Johari,
    * Koomen, Pekelis & Walsh, "Peeking at A/B tests", KDD 2017): a
    * dashboard that polls [[welchTTest]] hourly and stops at the first
    * p < α inflates its false-positive rate several-fold, because the
    * fixed-n test license is one look. The mSPRT's likelihood-ratio
    * martingale Λ_n makes EVERY peek licensed: under H₀: θ = 0 with a
    * N(0, τ²) mixture over alternatives,
    *
    *   ln Λ_n = ½·ln(V_n/(V_n+τ²)) + Δ_n²·τ² / (2·V_n·(V_n+τ²))
    *
    * with Δ_n the observed A−B mean difference and V_n = s²_A/n_A +
    * s²_B/n_B its Welch variance at peek n; the always-valid p-value
    * is p_n = min(1, 1/max_{k≤n} Λ_k) — monotone non-increasing, and
    * P(reject ever | H₀) ≤ α by the optional stopping theorem, however
    * often anyone peeks. τ² is the caller's prior scale on plausible
    * effect sizes (the standard tuning: near the V_n the experiment is
    * expected to reach — too small wastes power early, too large late).
    *
    * Peeks are the distinct values of `peek` (a date/hour column)
    * where BOTH arms have accumulated ≥ 2 observations and V_n > 0
    * — cumulative stats at each peek cover all rows up to and
    * including it.
    *
    * Exactness: per-(group, peek, arm) sums quantize to DECIMAL(18,2)
    * / (30,12) ([[welchTTest]]'s contract) and CUMULATE in DECIMAL —
    * exact at every peek, order-free; ln Λ is then a fixed double
    * chain per peek row, FLOAT at the surface. The rejection compare
    * runs in doubles (ln Λ vs ln(1/α), both fixed chains from
    * literals).
    *
    * Plan shape: ONE map-side-combinable groupBy to ≤ |groups|·|peeks|
    * ·2 rows, then windows partitioned by (group, variant) / (group) —
    * bounded per partition by the CALENDAR (peek count), never by the
    * data; one equi-join pivots the arms. Nothing event-granular
    * shuffles twice. */
  def msprt(df: DataFrame, group: String, variant: String, value: String,
            peek: String, tauSq: Double, alpha: Double = 0.05,
            armA: String = "A", armB: String = "B"): DataFrame = {
    require(tauSq > 0, s"tauSq must be > 0, got $tauSq")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val byPeek = df
      .filter(col(variant).isin(armA, armB) && col(value).isNotNull &&
        col(peek).isNotNull)
      .groupBy(col(group), col(variant), col(peek))
      .agg(count(lit(1)).as("__n"),
        sum(d2(col(value))).as("__s"),
        sum(d30(col(value) * col(value))).as("__ss"))
    // cumulative (n, Σx, Σx²) per arm — DECIMAL window sums stay exact
    val wCum = Window.partitionBy(col(group), col(variant))
      .orderBy(col(peek))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byPeek
      .withColumn("__cn", sum(col("__n")).over(wCum))
      .withColumn("__cs", sum(col("__s")).over(wCum))
      .withColumn("__css", sum(col("__ss")).over(wCum))
    def arm(tag: String, v: String) = cum.filter(col(variant) === v)
      .select(col(group), col(peek), col("__cn").as(s"n_$tag"),
        col("__cs").as(s"__cs_$tag"), col("__css").as(s"__css_$tag"))
    def mean(tag: String) =
      col(s"__cs_$tag").cast("double") / col(s"n_$tag").cast("double")
    def variance(tag: String) =
      (col(s"__css_$tag").cast("double") -
        (col(s"__cs_$tag").cast("double") * col(s"__cs_$tag").cast("double")) /
          col(s"n_$tag").cast("double")) /
        (col(s"n_$tag").cast("double") - lit(1.0))
    // peeks where both arms have cumulative rows (with a shared event
    // clock both arms see every peek; a one-sided peek has no test)
    val joined = arm("a", armA).join(arm("b", armB), Seq(group, peek))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
    val vN = variance("a") / col("n_a").cast("double") +
      variance("b") / col("n_b").cast("double")
    val diff = mean("a") - mean("b")
    val lnLambda = lit(0.5) * log(vN / (vN + lit(tauSq))) +
      diff * diff * lit(tauSq) / (lit(2.0) * vN * (vN + lit(tauSq)))
    val scored = joined.filter(vN > lit(0.0))
      .withColumn("__lnl", lnLambda)
    // running max of ln Λ per group over peeks → the always-valid
    // p-value and the boundary decision at every peek
    val wRun = Window.partitionBy(col(group)).orderBy(col(peek))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("__lnlMax", max(col("__lnl")).over(wRun))
      .select(col(group), col(peek), col("n_a"), col("n_b"),
        diff.cast("float").as("diff"),
        col("__lnl").cast("float").as("log_lambda"),
        exp(lit(0.0) - greatest(col("__lnlMax"), lit(0.0)))
          .cast("float").as("p_always_valid"),
        (col("__lnlMax") >= lit(math.log(1.0 / alpha))).as("reject_h0"))
  }
}
