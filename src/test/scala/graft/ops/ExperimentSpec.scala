package graft.ops

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("welchTTest: matches the hand-computed unequal-variance statistic") {
    // A = [1,2,3]: mean 2, s² 1; B = [2,4,6,8]: mean 5, s² 20/3
    // va = 1/3, vb = 5/3 → t = −3/√2; df = 4 / (1/18 + 25/27)
    val df = Seq(
      ("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0),
      ("g", "B", 2.0), ("g", "B", 4.0), ("g", "B", 6.0), ("g", "B", 8.0)
    ).toDF("grp", "variant", "v")
    val r = Experiment.welchTTest(df, "grp", "variant", "v").rows.head
    r(1) shouldBe 3L
    r(2) shouldBe 4L
    r(3) shouldBe 2.0
    r(4) shouldBe 5.0
    r(5).asInstanceOf[Float].toDouble shouldBe (-3.0 / math.sqrt(2.0) +- 1e-6)
    r(6).asInstanceOf[Float].toDouble shouldBe
      (4.0 / (1.0 / 18.0 + 25.0 / 27.0) +- 1e-5)
  }

  test("welchTTest: null metric values drop; a one-sided or tiny arm drops the group") {
    val df = Seq(
      ("only_a", "A", Some(1.0)), ("only_a", "A", Some(2.0)),
      ("tiny_b", "A", Some(1.0)), ("tiny_b", "A", Some(2.0)),
      ("tiny_b", "B", Some(9.0)),
      ("ok", "A", Some(1.0)), ("ok", "A", Some(2.0)), ("ok", "A", None),
      ("ok", "B", Some(1.0)), ("ok", "B", Some(3.0))
    ).toDF("grp", "variant", "v")
    val out = Experiment.welchTTest(df, "grp", "variant", "v")
      .orderBy("grp").rows
    out.map(_.head) shouldBe Seq("ok")
    out.head(1) shouldBe 2L // the NULL A-value did not count
  }

  test("mannWhitneyU: textbook no-tie case") {
    // A = {1,2}, B = {3,4}: R1 = 3 → U_A = R1 − n_a(n_a+1)/2 = 0;
    // σ² = 5/3 → z = −2/√(5/3) — NEGATIVE: arm A is smaller, matching
    // welchTTest's sign on the same data (and scipy's mannwhitneyu(A,B))
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0),
      ("g", "B", 3.0), ("g", "B", 4.0)).toDF("grp", "variant", "v")
    val r = Experiment.mannWhitneyU(df, "grp", "variant", "v").rows.head
    (r(1), r(2), r(3)) shouldBe ((2L, 2L, 0.0))
    r(4).asInstanceOf[Float].toDouble shouldBe
      (-2.0 / math.sqrt(5.0 / 3.0) +- 1e-6)
  }

  test("mannWhitneyU: ties take average ranks with the variance correction") {
    // A = {1,1}, B = {1,2}: tied trio at rank 2 → R1 = 4, U_A = 1;
    // Σ(t³−t) = 24 → σ² = 1 → z = (2U_A − n₁n₂)/2 = −1 (A smaller)
    val df = Seq(("g", "A", 1.0), ("g", "A", 1.0),
      ("g", "B", 1.0), ("g", "B", 2.0)).toDF("grp", "variant", "v")
    val r = Experiment.mannWhitneyU(df, "grp", "variant", "v").rows.head
    (r(3), r(4)) shouldBe ((1.0, -1.0f))
  }

  test("mannWhitneyU: all-tied group yields NULL z, not infinity; empty arm drops") {
    val df = Seq(("t", "A", 5.0), ("t", "B", 5.0), ("t", "B", 5.0),
      ("solo", "A", 1.0), ("solo", "A", 2.0)).toDF("grp", "variant", "v")
    val out = Experiment.mannWhitneyU(df, "grp", "variant", "v")
      .rows.map(r => r.head -> r(4)).toMap
    out.keySet shouldBe Set("t")
    assert(out("t") == null)
  }

  test("welchTTest: variants outside the two arms are ignored") {
    val df = Seq(
      ("g", "A", 1.0), ("g", "A", 2.0),
      ("g", "B", 1.0), ("g", "B", 2.0),
      ("g", "HOLDOUT", 99.0)
    ).toDF("grp", "variant", "v")
    val r = Experiment.welchTTest(df, "grp", "variant", "v").rows.head
    (r(1), r(2)) shouldBe ((2L, 2L))
  }

  test("chiSquare: hand-computed 2x2; zero cells contribute e; independent table scores 0") {
    // 2x2: A:(yes 30, no 10), B:(yes 20, no 40). N=100, rows 40/60,
    // cols 50/50 → e = 20/20/30/30; χ² = 100/20+100/20+100/30+100/30
    //             = 5+5+3.3333…+3.3333… = 16.6666…
    val df = (Seq.fill(30)(("g", "A", "yes")) ++ Seq.fill(10)(("g", "A", "no")) ++
      Seq.fill(20)(("g", "B", "yes")) ++ Seq.fill(40)(("g", "B", "no")))
      .toDF("grp", "variant", "outcome")
    val r = Experiment.chiSquare(df, "grp", "variant", "outcome").rows.head
    r(1) shouldBe 100L
    r(2) shouldBe 1L
    r(3).asInstanceOf[Float].toDouble shouldBe (50.0 / 3.0) +- 1e-4
    // zero cell: B never converts → its cell contributes e, grid is full
    val zc = (Seq.fill(5)(("g", "A", "yes")) ++ Seq.fill(5)(("g", "A", "no")) ++
      Seq.fill(10)(("g", "B", "no"))).toDF("grp", "variant", "outcome")
    // e(B,yes)=10*5/20=2.5 → term 2.5; e(A,yes)=2.5 → (5−2.5)²/2.5=2.5;
    // no-col: e=7.5 both → (5−7.5)²/7.5 + (10−7.5)²/7.5 = 0.8333+0.8333
    Experiment.chiSquare(zc, "grp", "variant", "outcome")
      .rows.head(3).asInstanceOf[Float].toDouble shouldBe (20.0 / 3.0) +- 1e-4
    // perfectly proportional → 0
    val ind = (Seq.fill(10)(("g", "A", "yes")) ++ Seq.fill(10)(("g", "A", "no")) ++
      Seq.fill(5)(("g", "B", "yes")) ++ Seq.fill(5)(("g", "B", "no")))
      .toDF("grp", "variant", "outcome")
    Experiment.chiSquare(ind, "grp", "variant", "outcome")
      .rows.head(3).asInstanceOf[Float].toDouble shouldBe 0.0 +- 1e-9
    // single-variant group → df 0 → dropped
    val one = Seq(("g", "A", "yes"), ("g", "A", "no")).toDF("grp", "variant", "outcome")
    Experiment.chiSquare(one, "grp", "variant", "outcome").count() shouldBe 0L
  }

  test("proportionZTest: hand-computed z; degenerate pooled rate yields NULL; missing arm drops") {
    // A: 30/40 convert (0.75), B: 20/60 (0.3333…); pooled 50/100 = 0.5
    // se = √(0.25·(1/40+1/60)) = √(0.25·(1/24)) = √(1/96)
    // z = (0.75 − 1/3)·√96 = 0.41666…·9.79796 = 4.08248…
    val df = (Seq.fill(30)(("g", "A", true)) ++ Seq.fill(10)(("g", "A", false)) ++
      Seq.fill(20)(("g", "B", true)) ++ Seq.fill(40)(("g", "B", false)))
      .toDF("grp", "variant", "ok")
    val r = Experiment.proportionZTest(df, "grp", "variant", "ok").rows.head
    (r(1), r(2), r(3), r(4)) shouldBe ((40L, 30L, 60L, 20L))
    r(5).asInstanceOf[Float].toDouble shouldBe 0.75 +- 1e-7
    r(7).asInstanceOf[Float].toDouble shouldBe
      ((0.75 - 20.0 / 60.0) / math.sqrt(0.25 / 24.0)) +- 1e-5
    // all convert → pooled p = 1 → se = 0 → NULL z, not a blowup
    val deg = Seq(("g", "A", true), ("g", "B", true)).toDF("grp", "variant", "ok")
    assert(Experiment.proportionZTest(deg, "grp", "variant", "ok").rows.head(7) == null)
    // one-armed group drops
    val solo = Seq(("g", "A", true)).toDF("grp", "variant", "ok")
    Experiment.proportionZTest(solo, "grp", "variant", "ok").count() shouldBe 0L
  }

  test("cuped: perfectly-correlated covariate removes the raw difference entirely") {
    // y = x exactly → θ = 1, ρ² = 1, diff_adj = diff_raw − 1·(x̄A−x̄B) = 0
    val df = Seq(
      ("g", "A", 10.0, 10.0), ("g", "A", 20.0, 20.0), ("g", "A", 30.0, 30.0),
      ("g", "B", 1.0, 1.0), ("g", "B", 2.0, 2.0), ("g", "B", 3.0, 3.0)
    ).toDF("grp", "variant", "pre", "post")
    val r = Experiment.cuped(df, "grp", "variant", "pre", "post").rows.head
    (r(1), r(2)) shouldBe ((3L, 3L))
    r(3).asInstanceOf[Float].toDouble shouldBe 1.0 +- 1e-9   // theta
    r(4).asInstanceOf[Float].toDouble shouldBe 18.0 +- 1e-9  // diff_raw
    r(5).asInstanceOf[Float].toDouble shouldBe 0.0 +- 1e-9   // diff_adj
    r(6).asInstanceOf[Float].toDouble shouldBe 1.0 +- 1e-9   // var_reduction
  }

  test("cuped: uncorrelated covariate leaves the difference; zero-variance covariate drops") {
    // x constant within arms ↔ y varying → cov over the pooled frame:
    // x̄A = x̄B = 5 → pooled var(x) = 0 → group drops
    val flat = Seq(
      ("g", "A", 5.0, 10.0), ("g", "A", 5.0, 20.0),
      ("g", "B", 5.0, 1.0), ("g", "B", 5.0, 2.0)
    ).toDF("grp", "variant", "pre", "post")
    Experiment.cuped(flat, "grp", "variant", "pre", "post").count() shouldBe 0L
    // symmetric x with y flipped across arms → cov = 0 → θ = 0 →
    // diff_adj = diff_raw
    val unc = Seq(
      ("g", "A", 1.0, 10.0), ("g", "A", 3.0, 10.0),
      ("g", "B", 1.0, 4.0), ("g", "B", 3.0, 4.0)
    ).toDF("grp", "variant", "pre", "post")
    val r = Experiment.cuped(unc, "grp", "variant", "pre", "post").rows.head
    r(3).asInstanceOf[Float].toDouble shouldBe 0.0 +- 1e-9
    r(5).asInstanceOf[Float] shouldBe r(4).asInstanceOf[Float]
  }

  test("bootstrapMeanDiffCi: CI brackets a clear gap, deterministic, shift-equivariant") {
    import org.apache.spark.sql.functions.col
    // A ~ 10, B ~ 1: every resampled mean diff sits near 9
    val rows = (1 to 60).map { i =>
      if (i % 2 == 0) ("g", "A", 10.0 + (i % 5) * 0.1, i.toLong)
      else ("g", "B", 1.0 + (i % 5) * 0.1, i.toLong)
    }
    val df = rows.toDF("grp", "variant", "v", "id")
    val r = Experiment.bootstrapMeanDiffCi(df, "grp", "variant", "v", "id",
      replicas = 64).rows.head
    val (n, lo, hi, mean) = (r(1).asInstanceOf[Long],
      r(2).asInstanceOf[Float], r(3).asInstanceOf[Float],
      r(4).asInstanceOf[Float])
    n should be <= 64L
    lo should be <= hi
    lo.toDouble shouldBe 9.0 +- 1.5
    hi.toDouble shouldBe 9.0 +- 1.5
    (lo.toDouble <= mean && mean <= hi.toDouble) shouldBe true
    // deterministic md5 draw: a rerun is bit-identical
    Experiment.bootstrapMeanDiffCi(df, "grp", "variant", "v", "id",
      replicas = 64).rows.head shouldBe r
    // shifting BOTH arms by a constant shifts the CI by exactly that
    // constant in every replica (weights depend only on ids)
    val shifted = df.withColumn("v", col("v") + 100.0)
    val r2 = Experiment.bootstrapMeanDiffCi(shifted, "grp", "variant",
      "v", "id", replicas = 64).rows.head
    r2(1) shouldBe n
    r2(2).asInstanceOf[Float].toDouble shouldBe lo.toDouble +- 1e-4
    intercept[IllegalArgumentException] {
      Experiment.bootstrapMeanDiffCi(df, "grp", "variant", "v", "id",
        replicas = 4)
    }
  }

  test("msprt: hand-computed ln-lambda chain; p always-valid is " +
    "monotone; a real effect crosses the alpha boundary") {
    import org.apache.spark.sql.functions.col
    // peek 1: identical arms (no effect yet); peek 2 adds a moderate
    // effect; peek 3 adds a decisive one — the boundary crossing
    val df = Seq(
      ("g", "A", 10.0, 1), ("g", "A", 12.0, 1),
      ("g", "B", 10.0, 1), ("g", "B", 12.0, 1),
      ("g", "A", 20.0, 2), ("g", "A", 22.0, 2),
      ("g", "B", 4.0, 2), ("g", "B", 6.0, 2),
      ("g", "A", 30.0, 3), ("g", "A", 32.0, 3),
      ("g", "A", 31.0, 3), ("g", "A", 29.0, 3),
      ("g", "B", 1.0, 3), ("g", "B", 2.0, 3),
      ("g", "B", 1.0, 3), ("g", "B", 2.0, 3)).toDF("grp", "variant", "v", "d")
    val tauSq = 25.0
    val out = Experiment.msprt(df, "grp", "variant", "v", "d",
      tauSq = tauSq, alpha = 0.05).orderBy(col("d")).rows
    out.length shouldBe 3
    // replay the chain for each peek: cumulative (n, Σx, Σx²) per arm
    def lnl(xa: Seq[Double], xb: Seq[Double]): Double = {
      def stats(x: Seq[Double]) = {
        val n = x.length.toDouble
        val s = x.sum; val ss = x.map(v => v * v).sum
        val va = (ss - s * s / n) / (n - 1.0)
        (n, s / n, va)
      }
      val (na, ma, va) = stats(xa); val (nb, mb, vb) = stats(xb)
      val vn = va / na + vb / nb
      val d = ma - mb
      0.5 * math.log(vn / (vn + tauSq)) +
        d * d * tauSq / (2.0 * vn * (vn + tauSq))
    }
    val l1 = lnl(Seq(10, 12), Seq(10, 12))
    val l2 = lnl(Seq(10, 12, 20, 22), Seq(10, 12, 4, 6))
    val l3 = lnl(Seq(10, 12, 20, 22, 30, 32, 31, 29),
      Seq(10, 12, 4, 6, 1, 2, 1, 2))
    out(0)(5).asInstanceOf[Float].toDouble shouldBe l1 +- 1e-5
    out(1)(5).asInstanceOf[Float].toDouble shouldBe l2 +- 1e-5
    out(2)(5).asInstanceOf[Float].toDouble shouldBe l3 +- 1e-4
    // always-valid p: min(1, 1/max Λ) — monotone non-increasing
    val p1 = out(0)(6).asInstanceOf[Float]
    val p2 = out(1)(6).asInstanceOf[Float]
    val p3 = out(2)(6).asInstanceOf[Float]
    p1.toDouble shouldBe math.exp(-math.max(l1, 0.0)) +- 1e-5
    p2.toDouble shouldBe math.exp(-math.max(math.max(l1, l2), 0.0)) +- 1e-5
    p2 should be <= p1
    p3 should be <= p2
    // peek 1 (identical arms) must not reject; the moderate peek-2
    // effect stays inside the boundary (a fixed-n z-test at p<0.05
    // would already have stopped here — the peeking-protection point);
    // peek 3's decisive effect crosses ln(1/0.05)
    out(0)(7) shouldBe false
    withClue(s"l2=$l2: ") { out(1)(7) shouldBe (l2 >= math.log(20.0)) }
    withClue(s"l3=$l3: ") { l3 should be >= math.log(20.0) }
    out(2)(7) shouldBe true
  }

  test("msprt: one-sided peeks and tiny arms drop; bad params rejected") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("g", "A", 1.0, 1), ("g", "A", 2.0, 1), // no B at peek 1
      ("g", "B", 1.0, 2), ("g", "B", 2.0, 2), ("g", "A", 3.0, 2),
      ("g", "A", 4.0, 2)).toDF("grp", "variant", "v", "d")
    // peek 1: B absent → dropped; peek 2: both arms have n ≥ 2 → kept
    val out = Experiment.msprt(df, "grp", "variant", "v", "d", tauSq = 1.0)
    out.rows.map(_(1)) shouldBe Seq(2)
    intercept[IllegalArgumentException] {
      Experiment.msprt(df, "grp", "variant", "v", "d", tauSq = 0.0)
    }
    intercept[IllegalArgumentException] {
      Experiment.msprt(df, "grp", "variant", "v", "d", tauSq = 1.0,
        alpha = 1.5)
    }
  }
}
