package graft.ops

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String, Double)], window: Long) =
    Attribution.multiTouch(
      rows.toDF("u", "t", "eid", "ch", "v"),
      key = "u", tsCol = "t", tieCol = "eid", typeCol = "ch",
      valueCol = "v", touchTypes = Seq("click", "view"),
      convType = "purchase", windowTicks = window)

  test("first/last/linear split one conversion; out-of-window touch drops") {
    val out = run(Seq(
      (1L, 10L, 1L, "click", 0.0),
      (1L, 20L, 2L, "view", 0.0),
      (1L, 30L, 3L, "purchase", 100.0),
      (1L, 35L, 4L, "click", 0.0), // next purchase 65 ticks away > 50
      (1L, 100L, 5L, "purchase", 40.0) // unattributed: no in-window touch
    ), window = 50L).orderBy("channel")
      .rows.map(r => (r(0), r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      ("click", 1L, 100.0, 0.0, 50.0),
      ("view", 1L, 0.0, 100.0, 50.0))
  }

  test("same-ts conversions merge; a touch at the conversion instant counts") {
    val out = run(Seq(
      (2L, 5L, 1L, "view", 0.0),
      (2L, 5L, 2L, "purchase", 10.0),
      (2L, 5L, 3L, "purchase", 20.0)
    ), window = 50L).rows.map(r => (r(0), r(1), r(2), r(3), r(4)))
    out shouldBe Seq(("view", 1L, 30.0, 30.0, 30.0))
  }

  test("a touch credits only its EARLIEST in-window conversion") {
    // touch at 10 sees purchases at 20 and 40: credits 20 only
    val out = run(Seq(
      (3L, 10L, 1L, "click", 0.0),
      (3L, 20L, 2L, "purchase", 7.0),
      (3L, 40L, 3L, "purchase", 9.0)
    ), window = 100L).rows.map(r => (r(0), r(1), r(2)))
    out shouldBe Seq(("click", 1L, 7.0))
  }

  test("tie-breaks pin first/last by event id at equal ts") {
    val out = run(Seq(
      (4L, 10L, 2L, "view", 0.0), // same ts, higher eid → last
      (4L, 10L, 1L, "click", 0.0), // same ts, lower eid → first
      (4L, 15L, 3L, "purchase", 60.0)
    ), window = 50L).orderBy("channel")
      .rows.map(r => (r(0), r(2), r(3), r(4)))
    out shouldBe Seq(
      ("click", 60.0, 0.0, 30.0),
      ("view", 0.0, 60.0, 30.0))
  }

  test("conversion type may not be a touch type") {
    an[IllegalArgumentException] should be thrownBy
      run(Seq.empty, window = 0L)
    an[IllegalArgumentException] should be thrownBy
      Attribution.multiTouch(
        Seq((1L, 1L, 1L, "x", 0.0)).toDF("u", "t", "eid", "ch", "v"),
        "u", "t", "eid", "ch", "v",
        touchTypes = Seq("x"), convType = "x", windowTicks = 10L)
  }
}
