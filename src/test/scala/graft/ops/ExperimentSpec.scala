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
}
