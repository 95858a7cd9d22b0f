package graft.ops

import graft.SparkSpec

/** Closed-form distribution shapes for [[Moments.skewKurtosis]]. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def shape(values: Seq[Double]): (Long, Float, Float) = {
    val out = Moments.skewKurtosis(
      values.map(("g", _)).toDF("k", "v"), Seq("k"), "v").rows.head
    (out(1).asInstanceOf[Long],
      out(2).asInstanceOf[Float], out(3).asInstanceOf[Float])
  }

  test("Bernoulli(1/4): skew (1−2p)/√(p(1−p)), excess kurtosis (1−6p(1−p))/(p(1−p))") {
    val (n, skew, kurt) = shape(Seq(0.0, 0.0, 0.0, 1.0))
    n shouldBe 4L
    skew shouldBe 1.1547005f +- 1e-6f   // 0.5/√0.1875
    kurt shouldBe -0.6666667f +- 1e-6f  // (1−1.125)/0.1875
  }

  test("symmetric uniform {1,2,3}: zero skew, excess kurtosis −3/2") {
    val (_, skew, kurt) = shape(Seq(1.0, 2.0, 3.0))
    skew shouldBe 0.0f +- 1e-7f
    kurt shouldBe -1.5f +- 1e-6f
  }

  test("mirror-image data flips skewness sign exactly; kurtosis unchanged") {
    val xs = Seq(1.0, 1.0, 2.0, 7.0)
    val (_, s1, k1) = shape(xs)
    val (_, s2, k2) = shape(xs.map(10.0 - _)) // reflection about 5
    s2 shouldBe -s1
    k2 shouldBe k1
  }

  test("constant column: zero variance → null shape, not a division blowup") {
    val out = Moments.skewKurtosis(
      Seq(("g", 4.0), ("g", 4.0)).toDF("k", "v"), Seq("k"), "v").rows.head
    assert(out(2) == null)
    assert(out(3) == null)
  }

  test("negative values: the floor-mean shift is sign-safe (pmod construction)") {
    // mean = −0.5 cents·…: values −1.0, 0.0 → cents −100, 0, μ = floor(−50) = −50
    val (_, skew, _) = shape(Seq(-1.0, 0.0))
    skew shouldBe 0.0f +- 1e-7f // two points are always symmetric
  }

  test("over-threshold μ frame joins WITHOUT a broadcast hint, rows identical") {
    val df = (1 to 10).flatMap(g => Seq(1.0, 2.0, 3.0, 7.0).map((s"g$g", _)))
      .toDF("k", "v")
    def rws(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("k").rows.map(_.toString)
    val hinted = Moments.skewKurtosis(df, Seq("k"), "v")
    val guarded = Moments.skewKurtosis(df, Seq("k"), "v",
      maxBroadcastGroups = 1) // 10 groups ≫ 1
    rws(guarded) shouldBe rws(hinted)
    rws(guarded) should not be empty
    // the scale contract: past the probe threshold the logical plan
    // carries NO broadcast hint — AQE may still broadcast a measured-
    // tiny side, but nothing FORCES a driver-sized build at millions
    // of groups (per-entity moments)
    val optimized = guarded.queryExecution.optimizedPlan.toString
    withClue(optimized.take(2000)) {
      optimized should not include "strategy=broadcast"
    }
    hinted.queryExecution.optimizedPlan.toString should include("strategy=broadcast")
  }
}
