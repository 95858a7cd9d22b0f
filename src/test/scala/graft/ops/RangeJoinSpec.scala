package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches a brute-force inequality join") {
    val rng = new scala.util.Random(11)
    val points = (1 to 300).map(i => (i.toLong, rng.nextLong() % 10000L))
      .toDF("pid", "p")
    val intervals = (1 to 40).map { i =>
      val lo = rng.nextLong() % 10000L
      (i.toLong, lo, lo + rng.nextInt(700).toLong)
    }.toDF("ivid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        binWidth = 250L)
      .select("pid", "ivid").rows.map(r => (r(0), r(1))).sortBy(_.toString)
    val want = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "ivid").rows.map(r => (r(0), r(1))).sortBy(_.toString)
    got shouldBe want
    want should not be empty // the test would be vacuous otherwise
  }

  test("boundaries are inclusive on both ends, and each match appears once") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "p")
    val iv = Seq((100L, 10L, 20L)).toDF("ivid", "lo", "hi")
    // binWidth 3 → the interval spans bins 3..6; points hit exactly once
    val out = RangeJoin.pointInInterval(points, "p", iv, "lo", "hi", binWidth = 3L)
      .select("pid").rows.map(_.head)
    out.sortBy(_.toString) shouldBe Seq(1L, 2L)
  }

  test("values beyond double's 2^53 exact range bin correctly") {
    // nanos-scale coordinates: 1.7e18 ± small offsets; float division
    // would mis-bin these
    val base = 1700000000000000000L
    val points = Seq((1L, base + 1L), (2L, base + 999999999L)).toDF("pid", "p")
    val iv = Seq((7L, base, base + 1000000000L)).toDF("ivid", "lo", "hi")
    RangeJoin.pointInInterval(points, "p", iv, "lo", "hi",
        binWidth = 300000000L)
      .count() shouldBe 2L
  }

  test("overlapping column names are rejected") {
    val p = Seq((1L, 2L)).toDF("id", "p")
    val iv = Seq((1L, 0L, 5L)).toDF("id", "lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", 10L)
  }

  test("empty intervals and empty points both yield empty results") {
    val p = Seq((1L, 5L)).toDF("pid", "p")
    val iv = Seq((1L, 0L, 9L)).toDF("ivid", "lo", "hi")
    RangeJoin.pointInInterval(p, "p", iv.limit(0), "lo", "hi", 4L)
      .count() shouldBe 0L
    RangeJoin.pointInInterval(p.limit(0), "p", iv, "lo", "hi", 4L)
      .count() shouldBe 0L
    // inverted interval matches nothing
    val bad = Seq((2L, 9L, 0L)).toDF("ivid", "lo", "hi")
    RangeJoin.pointInInterval(p, "p", bad, "lo", "hi", 4L).count() shouldBe 0L
  }

  test("an extreme corrupt inversion is dropped, not exploded") {
    // one corrupt row with lo=Long.MaxValue, hi=0 would step sequence()
    // DOWNWARD across ~2^61 bins and kill the job if it reached the
    // explode; the pre-filter must drop it while valid rows still match
    val p = Seq((1L, 5L)).toDF("pid", "p")
    val iv = Seq((1L, 0L, 9L), (2L, Long.MaxValue, 0L)).toDF("ivid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", 4L)
      .select("ivid").rows.map(_.head)
    out shouldBe Seq(1L)
  }

  test("reserved working column is rejected") {
    val p = Seq((1L, 5L)).toDF("__rj_bin", "p")
    val iv = Seq((1L, 0L, 9L)).toDF("ivid", "lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", 4L)
  }
}
