package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VolatilitySnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("rollingStd: single-row window → null (ddof=1 / min_samples=1 semantics)") {
    val df = Seq(("A", 1, 1.0), ("A", 2, 3.0), ("A", 3, 5.0), ("B", 1, 7.0))
      .toDF("k", "t", "v")
    val out = Volatility.rollingStd(df, Seq("k"), Seq("t"), "v", window = 30, out = "s")
      .orderBy("k", "t").select("s").rows.map(_.head)
    assert(out(0) == null)                                     // first row per key
    out(1).asInstanceOf[Double] shouldBe math.sqrt(2.0) +- 1e-12  // std([1,3])
    out(2).asInstanceOf[Double] shouldBe 2.0 +- 1e-12             // std([1,3,5])
    assert(out(3) == null)                                     // B's only row
  }

  test("rollingStd: frame is trailing N rows, not all-preceding") {
    val df = (1 to 5).map(i => ("A", i, i.toDouble)).toDF("k", "t", "v")
    val out = Volatility.rollingStd(df, Seq("k"), Seq("t"), "v", window = 2, out = "s")
      .orderBy("t").select("s").rows.map(_.head)
    // window=2 → std of consecutive pairs = sqrt(0.5) everywhere after row 1
    out.drop(1).foreach(_.asInstanceOf[Double] shouldBe math.sqrt(0.5) +- 1e-12)
  }

  test("ewma: renormalizes over present lags; nulls pass through; constants are fixed points") {
    val df = Seq(("A", 1, Some(10.0)), ("A", 2, None), ("A", 3, Some(20.0)))
      .toDF("k", "t", "v")
    val out = Volatility.ewma(df, Seq("k"), Seq("t"), "v",
        alpha = 0.1, lags = 20, out = "e")
      .orderBy("t").select("e").rows.map(_.head)
    // row 1: only lag 0 present → renormalized to the value itself
    out(0).asInstanceOf[Double] shouldBe 10.0 +- 1e-12
    assert(out(1) == null) // null value stays null, not smoothed over
    // row 3: lags 0 and 2 present with weights 0.1 and 0.081
    out(2).asInstanceOf[Double] shouldBe
      ((0.1 * 20 + 0.081 * 10) / (0.1 + 0.081)) +- 1e-12
    // a constant series is a fixed point at every prefix length
    val const = (1 to 25).map(i => ("A", i, 7.0)).toDF("k", "t", "v")
    Volatility.ewma(const, Seq("k"), Seq("t"), "v", out = "e")
      .select("e").rows.foreach(_.head.asInstanceOf[Double] shouldBe 7.0 +- 1e-12)
  }

  test("latestPerKey: picks the row maximal under order, deterministic on ties") {
    val df = Seq(("A", 3, "x"), ("A", 3, "y"), ("A", 1, "z"), ("B", 9, "w"))
      .toDF("k", "t", "tag")
    val out = Snapshot.latestPerKey(df, Seq("k"), Seq("t", "tag"))
      .orderBy("k").select("k", "t", "tag").rows
    out shouldBe Seq(Seq("A", 3, "y"), Seq("B", 9, "w"))
  }

  test("finalValueByKey: max_by over (order, tiebreak) — not Spark's last()") {
    val df = Seq(("A", 1, 10.0), ("A", 3, 30.0), ("A", 2, 20.0), ("B", 5, 50.0))
      .toDF("k", "t", "v")
    val out = Snapshot.finalValueByKey(df, "k", "v", Seq("t"))
      .orderBy("k").rows
    out shouldBe Seq(Seq("A", 30.0, 3, 3L), Seq("B", 50.0, 5, 1L))
  }

  test("topK: k rows by value desc with ascending tiebreak") {
    val df = Seq((1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)).toDF("id", "v")
    val out = Snapshot.topK(df, "v", 3, "id").select("id").rows.map(_.head)
    out shouldBe Seq(2, 3, 1)
  }

  test("groupedTopK equals the plain per-group window, at any salt count") {
    val rng = new scala.util.Random(3)
    val df = (1 to 400).map(i =>
      (s"g${i % 3}", i.toLong, rng.nextInt(50).toLong)).toDF("g", "id", "n")
    val plain = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("g")).orderBy(col("n").desc, col("id"))
      df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("g", "rank", "id", "n").rows.sortBy(_.toString)
    }
    for (salts <- Seq(1, 4, 32)) {
      val two = Snapshot.groupedTopK(df, keys = Seq("g"),
          order = Seq(col("n").desc, col("id")), k = 5,
          discriminator = col("id"), salts = salts)
        .select("g", "rank", "id", "n").rows.sortBy(_.toString)
      two shouldBe plain
    }
  }
}
