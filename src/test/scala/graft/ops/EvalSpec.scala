package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("calibration: hand-computed bins, ECE, top-edge closure, " +
    "out-of-range/null exclusion") {
    val df = Seq(
      (Some(0.1), Some(1)), (Some(0.2), Some(0)),
      (Some(0.8), Some(1)), (Some(0.9), Some(1)),
      (Some(1.0), Some(1)),              // top edge closes into last bin
      (Some(-0.1), Some(1)), (Some(1.5), Some(0)), // out of range: excluded
      (None, Some(1)), (Some(0.5), None) // nulls: excluded
    ).toDF("s", "y")
    val out = Eval.calibration(df, col("s"), col("y"), bins = 2)
      .orderBy(col("bin")).rows
    out.length shouldBe 2
    // bin 0: scores {0.1, 0.2} → conf 0.15, rate 0.5, gap 0.35
    out(0)(0) shouldBe 0L
    out(0)(1) shouldBe 2L
    out(0)(2).asInstanceOf[Float].toDouble shouldBe 0.15 +- 1e-6
    out(0)(3) shouldBe 0.5f
    out(0)(4).asInstanceOf[Float].toDouble shouldBe 0.35 +- 1e-6
    // bin 1: scores {0.8, 0.9, 1.0} → conf 0.9, rate 1.0, gap 0.1
    out(1)(0) shouldBe 1L
    out(1)(1) shouldBe 3L
    out(1)(2).asInstanceOf[Float].toDouble shouldBe 0.9 +- 1e-6
    out(1)(3) shouldBe 1.0f
    out(1)(4).asInstanceOf[Float].toDouble shouldBe 0.1 +- 1e-6
    // ECE = (2·0.35 + 3·0.1)/5 = 0.2, same value on every row
    out(0)(5).asInstanceOf[Float].toDouble shouldBe 0.2 +- 1e-6
    out(1)(5) shouldBe out(0)(5)
    intercept[IllegalArgumentException] {
      Eval.calibration(df, col("s"), col("y"), bins = 1)
    }
  }

  test("calibration: a perfectly calibrated score has gap 0 in every bin") {
    // each score value appears 10x with exactly score·10 positives
    val rows = for {
      s <- Seq(0.1, 0.3, 0.7)
      i <- 1 to 10
    } yield (s, if (i <= (s * 10).round) 1 else 0)
    val out = Eval.calibration(rows.toDF("s", "y"), col("s"), col("y"),
      bins = 10).rows
    all(out.map(_(4).asInstanceOf[Float])) shouldBe 0.0f
    out.head(5) shouldBe 0.0f
  }

  test("conformalQuantile: the ceil((n+1)(1-alpha))-th smallest " +
    "residual; small-n guarantee void is flagged, never fabricated") {
    // group g: residuals 1..9 (n=9), alpha=0.1 → k* = ceil(10·0.9) = 9
    // → q = 9, exact (k* ≤ n); alpha=0.05 → ceil(10·0.95) = 10 > 9 →
    // max returned, flag false
    val df = (1 to 9).map(i => ("g", i.toDouble)).toDF("grp", "res")
    val ex = Eval.conformalQuantile(df, Seq("grp"), "res", alpha = 0.1)
      .rows.head
    ex(1) shouldBe 9L
    ex(2) shouldBe 9.0f
    ex(3) shouldBe true
    val void = Eval.conformalQuantile(df, Seq("grp"), "res", alpha = 0.05)
      .rows.head
    void(2) shouldBe 9.0f
    void(3) shouldBe false
    // alpha=0.5 → k* = ceil(10·0.5) = 5 → the 5th smallest = 5; ties
    // collapse into the ledger (duplicate 5s share the rank range)
    val tied = ((1 to 9).map(i => ("g", i.toDouble)) ++
      Seq(("g", 5.0), ("g", 5.0))).toDF("grp", "res")
    Eval.conformalQuantile(tied, Seq("grp"), "res", alpha = 0.5)
      .rows.head(2) shouldBe 5.0f
    intercept[IllegalArgumentException] {
      Eval.conformalQuantile(df, Seq("grp"), "res", alpha = 0.0)
    }
  }

  test("conformalQuantile: empirical coverage meets the 1-alpha " +
    "guarantee on an exchangeable split") {
    // 4000 deterministic pseudo-residuals (seeded, exchangeable);
    // calibrate on half, test on half. The guarantee holds in
    // expectation over BOTH halves, so a fixed split fluctuates with
    // joint sigma ≈ √(2·0.9·0.1/2000) ≈ 0.013 around ~0.9 — assert
    // the 3-sigma floor (0.86). Deterministic seed: green forever
    // once green.
    val rng = new scala.util.Random(7)
    val all = (1 to 4000).map(i => (i, math.abs(rng.nextGaussian()))).toSeq
    val cal = all.filter(_._1 % 2 == 0).map(t => ("g", t._2)).toDF("grp", "res")
    val q = Eval.conformalQuantile(cal, Seq("grp"), "res", alpha = 0.1)
      .rows.head(2).asInstanceOf[Float].toDouble
    val test = all.filter(_._1 % 2 == 1).map(_._2)
    val cov = test.count(_ <= q).toDouble / test.size
    withClue(s"q=$q cov=$cov: ") { cov should be >= 0.86 }
  }

  test("rocPoints: hand-computed operating points; a perfect scorer " +
    "hits (0,1); degenerate one-class input yields NULL rates") {
    // bins=2: low bin {0.1(y0), 0.2(y0), 0.3(y1)}, high {0.8(y1), 0.9(y1)}
    val df = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.8, 1), (0.9, 1))
      .toDF("s", "y")
    val out = Eval.rocPoints(df, col("s"), col("y"), bins = 2)
      .orderBy(col("threshold")).rows
    out.length shouldBe 2
    // t=0: everything kept → (tpr, fpr) = (1, 1)
    out(0)(0) shouldBe 0.0f
    out(0)(3) shouldBe 1.0f
    out(0)(4) shouldBe 1.0f
    // t=0.5: keeps the 2 high positives of 3 pos, 0 of 2 neg
    out(1)(0) shouldBe 0.5f
    out(1)(1) shouldBe 2L
    out(1)(2) shouldBe 0L
    out(1)(3).asInstanceOf[Float].toDouble shouldBe 2.0 / 3 +- 1e-6
    out(1)(4) shouldBe 0.0f
    // all-positive input: fpr undefined → NULL, tpr still real
    val onePos = Seq((0.1, 1), (0.9, 1)).toDF("s", "y")
    val deg = Eval.rocPoints(onePos, col("s"), col("y"), bins = 2)
      .orderBy(col("threshold")).rows
    all(deg.map(_(4) == null)) shouldBe true
    deg.head(3) shouldBe 1.0f
  }

  test("prPoints: hand-computed operating points; recall/f1 NULL on " +
    "no-positive input; precision never 0/0") {
    // bins=2: low bin {0.1(y0), 0.2(y0), 0.3(y1)}, high {0.8(y1), 0.9(y1)}
    val df = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.8, 1), (0.9, 1))
      .toDF("s", "y")
    val out = Eval.prPoints(df, col("s"), col("y"), bins = 2)
      .orderBy(col("threshold")).rows
    out.length shouldBe 2
    // t=0: keeps all 5, 3 pos → precision 0.6, recall 1, f1 = 2·.6/1.6
    out(0)(0) shouldBe 0.0f
    out(0)(1) shouldBe 5L
    out(0)(2) shouldBe 3L
    out(0)(3).asInstanceOf[Float].toDouble shouldBe 0.6 +- 1e-6
    out(0)(4) shouldBe 1.0f
    out(0)(5).asInstanceOf[Float].toDouble shouldBe 0.75 +- 1e-6
    // t=0.5: keeps the 2 high rows, both positive → precision 1,
    // recall 2/3, f1 = 2·(2/3)/(5/3) = 0.8
    out(1)(1) shouldBe 2L
    out(1)(3) shouldBe 1.0f
    out(1)(4).asInstanceOf[Float].toDouble shouldBe 2.0 / 3 +- 1e-6
    out(1)(5).asInstanceOf[Float].toDouble shouldBe 0.8 +- 1e-6
    // all-negative input: precision real (0), recall/f1 NULL
    val noPos = Seq((0.1, 0), (0.9, 0)).toDF("s", "y")
    val deg = Eval.prPoints(noPos, col("s"), col("y"), bins = 2).rows
    all(deg.map(_(3) == 0.0f)) shouldBe true
    all(deg.map(_(4) == null)) shouldBe true
    all(deg.map(_(5) == null)) shouldBe true
  }

  test("averagePrecision: hand-computed; a perfect scorer reads 1; " +
    "no-positive input reads NULL beside a real prevalence") {
    // bins=2: low {0.1(y0), 0.2(y0), 0.3(y1)}, high {0.8(y1), 0.9(y1)}
    // terms: high bin pos=2, precision 2/2=1 -> 2; low bin pos=1,
    // precision 3/5 -> 0.6; AP = 2.6/3
    val df = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.8, 1), (0.9, 1))
      .toDF("s", "y")
    val out = Eval.averagePrecision(df, col("s"), col("y"), bins = 2)
      .rows.head
    out(0) shouldBe 3L
    out(1) shouldBe 2L
    out(2).asInstanceOf[Float].toDouble shouldBe 2.6 / 3 +- 1e-6
    out(3).asInstanceOf[Float].toDouble shouldBe 0.6 +- 1e-6
    // perfect separation at bins=2: all positives above, negatives below
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    Eval.averagePrecision(perfect, col("s"), col("y"), bins = 2)
      .rows.head(2) shouldBe 1.0f
    // no positives: AP NULL, prevalence 0
    val noPos = Seq((0.9, 0), (0.1, 0)).toDF("s", "y")
    val deg = Eval.averagePrecision(noPos, col("s"), col("y"), bins = 2)
      .rows.head
    (deg(2) == null) shouldBe true
    deg(3) shouldBe 0.0f
  }

  test("brier: hand-computed score and Murphy terms; residual is zero " +
    "when scores are constant within bins") {
    // bin-constant scores (bins=2, scores 0.25 and 0.75):
    // low bin {0.25: y=0, y=1}, high bin {0.75: y=1, y=1}
    val df = Seq((0.25, 0), (0.25, 1), (0.75, 1), (0.75, 1)).toDF("s", "y")
    val out = Eval.brier(df, col("s"), col("y"), bins = 2).rows.head
    out(0) shouldBe 4L
    // BS = (0.0625 + 0.5625 + 0.0625 + 0.0625)/4 = 0.1875
    out(1).asInstanceOf[Float].toDouble shouldBe 0.1875 +- 1e-6
    // ybar = 3/4; rel = (2·0.0625 + 2·0.0625)/4 = 0.0625
    out(2).asInstanceOf[Float].toDouble shouldBe 0.0625 +- 1e-6
    // res = (2·(0.5−0.75)² + 2·(1−0.75)²)/4 = 0.0625
    out(3).asInstanceOf[Float].toDouble shouldBe 0.0625 +- 1e-6
    // unc = 0.75·0.25 = 0.1875
    out(4).asInstanceOf[Float].toDouble shouldBe 0.1875 +- 1e-6
    // bin-constant scores → the three-term identity is exact
    out(5).asInstanceOf[Float].toDouble shouldBe 0.0 +- 1e-6
  }

  test("label contract: a non-binary label fails loudly in every " +
    "binned eval, never a silent rate > 1") {
    val bad = Seq((0.5, 2), (0.6, 0)).toDF("s", "y")
    val e1 = intercept[Exception] {
      Eval.calibration(bad, col("s"), col("y"), bins = 2).rows
    }
    e1.getMessage should include("label must be 0/1")
    val e2 = intercept[Exception] {
      Eval.rocPoints(bad, col("s"), col("y"), bins = 2).rows
    }
    e2.getMessage should include("label must be 0/1")
    val e3 = intercept[Exception] {
      Eval.brier(bad, col("s"), col("y"), bins = 2).rows
    }
    e3.getMessage should include("label must be 0/1")
    // a FRACTIONAL label (probability column passed as the outcome)
    // must also raise — the pre-cast check; an int cast would
    // silently truncate 0.7 to 0 and compute plausible wrong rates
    val frac = Seq((0.5, 0.7), (0.6, 0.0)).toDF("s", "y")
    val e4 = intercept[Exception] {
      Eval.calibration(frac, col("s"), col("y"), bins = 2).rows
    }
    e4.getMessage should include("label must be 0/1")
    e4.getMessage should include("0.7")
  }

  test("cumulativeGains: hand-computed bands, shares and lift; " +
    "descending score order with deterministic tiebreak") {
    val df = Seq(
      (0.9, 1, 1L), (0.8, 1, 2L), (0.7, 1, 3L),
      (0.6, 0, 4L), (0.5, 0, 5L), (0.4, 0, 6L)).toDF("s", "y", "id")
    val out = Eval.cumulativeGains(df, col("s"), col("y"), col("id"), k = 3)
      .orderBy(col("band")).rows
    out.length shouldBe 3
    // band 1 = top scores {0.9, 0.8}: 2 of 3 positives → share 2/3, lift 2
    out(0)(1) shouldBe 2L
    out(0)(2) shouldBe 2L
    out(0)(3).asInstanceOf[Float].toDouble shouldBe 2.0 / 3 +- 1e-6
    out(0)(5).asInstanceOf[Float].toDouble shouldBe 2.0 +- 1e-6
    // band 2 adds the last positive → cumulative share 1, lift 1.5
    out(1)(3) shouldBe 1.0f
    out(1)(5).asInstanceOf[Float].toDouble shouldBe 1.5 +- 1e-6
    // band 3: everything → shares 1, lift 1
    out(2)(3) shouldBe 1.0f
    out(2)(4) shouldBe 1.0f
    out(2)(5) shouldBe 1.0f
  }
}
