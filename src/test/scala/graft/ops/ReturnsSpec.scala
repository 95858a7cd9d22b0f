package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReturnsSpec extends SparkSpec {
  import spark.implicits._

  private val series = Seq(
    ("A", 1, 100.0), ("A", 2, 110.0), ("A", 3, 99.0),
    ("B", 1, 50.0), ("B", 2, 50.0)
  ).toDF("k", "t", "v")

  test("lagReturn: first row per key is null, then (v - prev)/prev") {
    val out = Returns.lagReturn(series, Seq("k"), Seq("t"), "v", "r")
      .orderBy("k", "t").select("r").rows.map(_.head)
    assert(out(0) == null)
    out(1).asInstanceOf[Double] shouldBe 0.10 +- 1e-12
    out(2).asInstanceOf[Double] shouldBe (99.0 - 110.0) / 110.0 +- 1e-12
    assert(out(3) == null)
    out(4).asInstanceOf[Double] shouldBe 0.0 +- 1e-12
  }

  test("lagReturn: zero previous value yields null, not error/Infinity") {
    val df = Seq(("A", 1, 0.0), ("A", 2, 5.0)).toDF("k", "t", "v")
    val out = Returns.lagReturn(df, Seq("k"), Seq("t"), "v", "r")
      .orderBy("t").select("r").rows.map(_.head)
    out shouldBe Seq(null, null)
  }

  test("cumulativeReturn: compounds (1+r) in order, null r treated as 0") {
    val df = Seq(("A", 1, null.asInstanceOf[java.lang.Double]),
      ("A", 2, java.lang.Double.valueOf(0.10)),
      ("A", 3, java.lang.Double.valueOf(-0.50))).toDF("k", "t", "r")
    val out = Returns.cumulativeReturn(df, Seq("k"), Seq("t"), "r", "c")
      .orderBy("t").select("c").rows.map(_.head.asInstanceOf[Double])
    out(0) shouldBe 1.0 +- 1e-12
    out(1) shouldBe 1.10 +- 1e-12
    out(2) shouldBe 0.55 +- 1e-12
  }

  test("cumulativeReturn: a -100% day zeroes the series forever (wipeout clamp)") {
    val df = Seq(("A", 1, 0.5), ("A", 2, -1.0), ("A", 3, 0.8))
      .toDF("k", "t", "r")
    val out = Returns.cumulativeReturn(df, Seq("k"), Seq("t"), "r", "c")
      .orderBy("t").select("c").rows.map(_.head.asInstanceOf[Double])
    out(0) shouldBe 1.5 +- 1e-12
    out(1) shouldBe 0.0
    out(2) shouldBe 0.0   // without the clamp, ln(0)→null is skipped and this would be 2.7
  }

  test("cumulativeReturn (exp-sum-ln) agrees with exact ProductAgg form") {
    // seeded random series (property-style, deterministic replay)
    val rng = new scala.util.Random(42)
    val rs = List.fill(120)(rng.nextDouble() * 2.9 - 0.9)  // returns in (-0.9, 2.0)
    val df = rs.zipWithIndex.map { case (r, i) => ("k" + (i % 3), i, r) }.toDF("k", "t", "r")
    val approx = Returns.cumulativeReturn(df, Seq("k"), Seq("t"), "r", "c")
      .orderBy("k", "t").select("c").rows.map(_.head.asInstanceOf[Double])
    val exact = Returns.cumulativeReturnExact(df, Seq("k"), Seq("t"), "r", "c")
      .orderBy("k", "t").select("c").rows.map(_.head.asInstanceOf[Double])
    approx.zip(exact).foreach { case (a, e) =>
      a shouldBe e +- math.max(1e-9, math.abs(e) * 1e-9)
    }
  }

  test("ProductAgg works as a grouping aggregate, not only a window function") {
    val df = Seq[(String, java.lang.Double)](("A", 2.0), ("A", 3.0), ("B", 0.5),
      ("B", null)).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(graft.agg.ProductAgg.product(col("v")).as("p"))
      .orderBy("k").select("p").rows.map(_.head.asInstanceOf[Double])
    out(0) shouldBe 6.0 +- 1e-12
    out(1) shouldBe 0.5 +- 1e-12   // null input ignored
  }

  test("unpivot → pivot round-trips") {
    import graft.ops.Reshape
    val wide = Seq((1, 10.0, 20.0), (2, 30.0, 40.0)).toDF("id", "a", "b")
    val long = Reshape.unpivot(wide, Seq("id"), Seq("a", "b"), "attr", "val")
    val back = Reshape.pivot(long, "id", "attr", "val").orderBy("id")
    back.columns.toSeq shouldBe Seq("id", "a", "b")
    back.rows shouldBe Seq(Seq(1, 10.0, 20.0), Seq(2, 30.0, 40.0))
  }

  test("relativeReturns: aligned diff × 100; one-sided axis values drop (inner-join semantics)") {
    val df = Seq((1, "base", 0.5), (1, "comp", 0.2), (2, "base", 0.1), (2, "comp", 0.4),
      (3, "base", 9.9),            // no comp on t=3 → excluded
      (4, "other", 1.0))           // unrelated series ignored entirely
      .toDF("t", "s", "v")
    val out = Returns.relativeReturns(df, "t", "s", "base", "comp", "v")
      .orderBy("t").select("t", "pct_diff").rows
    out.map(_.head) shouldBe Seq(1, 2)
    out(0)(1).asInstanceOf[Double] shouldBe 30.0 +- 1e-9
    out(1)(1).asInstanceOf[Double] shouldBe -30.0 +- 1e-9
  }
}
