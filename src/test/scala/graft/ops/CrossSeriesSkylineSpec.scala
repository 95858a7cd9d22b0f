package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round-9 additions: cross-series
  * correlation/beta, the 2-D skyline, OHLC resampling, and the
  * equi-depth histogram. */
class CrossSeriesSkylineSpec extends SparkSpec {
  import spark.implicits._

  // ── CrossSeries ────────────────────────────────────────────────────

  private val day = 86400000000000L

  test("bucketSeries: cents sums per (key, day); nulls excluded; div is integer") {
    val df = Seq(
      ("a", 0L, Some(1.25)), ("a", day - 1, Some(2.0)), // same bucket 0
      ("a", day, Some(3.0)),                            // bucket 1
      ("b", 0L, None)                                   // null → dropped
    ).toDF("k0", "ts", "value")
      .select(col("k0"), col("ts"), col("value").cast("double"))
    val s = CrossSeries.bucketSeries(df, "k0", "ts", "value", day)
      .rows.map(r => (r.head, r(1), r(2))).toSet
    s shouldBe Set(("a", 0L, 325L), ("a", 1L, 300L))
  }

  test("corrPairs: perfectly correlated and anti-correlated pairs; min overlap enforced") {
    // x: 1,2,3  y = 2x (corr +1)  z = -x (corr −1)  w: one shared bucket only
    val series = Seq(
      ("x", 0L, 100L), ("x", 1L, 200L), ("x", 2L, 300L),
      ("y", 0L, 200L), ("y", 1L, 400L), ("y", 2L, 600L),
      ("z", 0L, -100L), ("z", 1L, -200L), ("z", 2L, -300L),
      ("w", 0L, 500L)
    ).toDF("k", "b", "v")
    val out = CrossSeries.corrPairs(series)
      .rows.map(r => ((r.head, r(1)), r(3).asInstanceOf[Float])).toMap
    out(("x", "y")) shouldBe 1.0f
    out(("x", "z")) shouldBe -1.0f
    out(("y", "z")) shouldBe -1.0f
    out.keySet should not contain (("w", "x")) // n=1 < minOverlap
  }

  test("betaVsMarket: a series that IS the market scaled has beta = its share slope") {
    // two keys, a = 2·b. market m = a+b = 3·b. cov(a,m)/var(m):
    // b: 100,200,300  a: 200,400,600  m: 300,600,900
    // beta(a) = cov(a,m)/var(m) = 2/3, beta(b) = 1/3
    val series = Seq(
      ("a", 0L, 200L), ("a", 1L, 400L), ("a", 2L, 600L),
      ("b", 0L, 100L), ("b", 1L, 200L), ("b", 2L, 300L)
    ).toDF("k", "b", "v")
    val out = CrossSeries.betaVsMarket(series)
      .rows.map(r => (r.head, r(2).asInstanceOf[Float])).toMap
    out("a") shouldBe (2.0f / 3.0f)
    out("b") shouldBe (1.0f / 3.0f)
  }

  test("rollingCorrVsMarket: trailing frame tracks local regime, not history") {
    // two keys; key a = market/2 on buckets 0-3 (corr 1), then inverts
    val series = Seq(
      ("a", 0L, 100L), ("a", 1L, 200L), ("a", 2L, 300L), ("a", 3L, 400L),
      ("a", 4L, 100L),
      ("bkey", 0L, 100L), ("bkey", 1L, 200L), ("bkey", 2L, 300L),
      ("bkey", 3L, 400L), ("bkey", 4L, 900L)
    ).toDF("k", "b", "v")
    val out = CrossSeries.rollingCorrVsMarket(series, window = 3)
      .rows.map(r => (r.head, r(1)) -> r(3).asInstanceOf[Float]).toMap
    // buckets 0-3: a and bkey are identical → market = 2a → corr 1
    out(("a", 2L)) shouldBe 1.0f
    out(("a", 3L)) shouldBe 1.0f
    // bucket 4 window {2,3,4}: a falls while the market rises → negative
    out(("a", 4L)) should be < 0.0f
    out(("bkey", 4L)) should be > 0.9f
    // first bucket has n=1 < minOverlap → absent
    out.keySet should not contain (("a", 0L))
  }

  // ── Skyline ────────────────────────────────────────────────────────

  private def frontier(pts: Seq[(Double, Double)], buckets: Int = 4) =
    Skyline.frontier2d(pts.toDF("h", "l"), "h", "l", buckets)
      .rows.map(r => (r.head.asInstanceOf[Double], r(1).asInstanceOf[Double]))
      .toSet

  test("frontier2d: staircase survives, dominated points cut, ties co-frontier rules") {
    val pts = Seq(
      (10.0, 5.0),  // frontier (highest h)
      (8.0, 3.0),   // frontier (lower h, lower l)
      (8.0, 7.0),   // same h, worse l → dominated by (8,3)
      (9.0, 5.0),   // dominated by (10,5): h strictly lower at equal l
      (7.0, 3.0),   // dominated by (8,3): equal l, lower h
      (6.0, 1.0)    // frontier
    )
    frontier(pts) shouldBe Set((10.0, 5.0), (8.0, 3.0), (6.0, 1.0))
  }

  test("frontier2d: transitively pruned dominator chains still cut their victims") {
    // c is dominated only by b; b is dominated by a. Even if the bucket
    // prune removes b, a must still cut c through the chain.
    val pts = Seq((3.0, 1.0), (2.0, 2.0), (1.9, 2.5))
    frontier(pts, buckets = 1) shouldBe Set((3.0, 1.0))
    frontier(pts, buckets = 256) shouldBe Set((3.0, 1.0))
  }

  test("frontier2d: all-equal h collapses to single best point; bucket count invariant") {
    val pts = Seq((5.0, 3.0), (5.0, 2.0), (5.0, 9.0))
    (1 to 8).foreach { b => frontier(pts, b) shouldBe Set((5.0, 2.0)) }
  }

  // ── Resample ───────────────────────────────────────────────────────

  test("ohlc: open/close by (ts, tie) order, high/low/count/cents volume") {
    val df = Seq(
      ("a", 0L, 1L, 4.0), ("a", 5L, 2L, 9.0), ("a", 9L, 3L, 2.0),
      ("a", 5L, 9L, 7.0),          // same ts as tick 2, higher tie
      ("a", 10L, 4L, 6.0),         // next bucket
      ("b", 0L, 5L, 1.005)         // 1.005·100 = 100.4999… in IEEE → 100
                                   // (same double path both engines take)
    ).toDF("key", "ts", "id", "value")
    val out = Resample.ohlc(df, "key", "ts", "id", "value", bucketNanos = 10L)
      .rows.map(r => (r.head, r(1)) -> (r(2), r(3), r(4), r(5), r(6), r(7))).toMap
    out(("a", 0L)) shouldBe ((4.0, 9.0, 2.0, 2.0, 4L, 2200L))
    out(("a", 1L)) shouldBe ((6.0, 6.0, 6.0, 6.0, 1L, 600L))
    out(("b", 0L)) shouldBe ((1.005, 1.005, 1.005, 1.005, 1L, 100L))
  }

  // ── TWAP ───────────────────────────────────────────────────────────

  test("timeWeightedAvg: holds weight by duration; final observation carries none") {
    // key a: 10.0 held 0→30 (dur 30), 40.0 held 30→40 (dur 10), last at 40 dropped
    // twap = (1000·30 + 4000·10)/40/100 = 17.5
    val df = Seq(("a", 0L, 1L, 10.0), ("a", 30L, 2L, 40.0), ("a", 40L, 3L, 99.0))
      .toDF("k0", "ts", "id", "value")
    val out = Resample.timeWeightedAvg(df, "k0", "ts", "id", "value").rows.head
    out(1) shouldBe 17.5f
    out(2) shouldBe 40L
    out(3) shouldBe 2L
  }

  test("timeWeightedAvg: a single observation per key yields no row (no duration)") {
    val df = Seq(("a", 0L, 1L, 10.0)).toDF("k0", "ts", "id", "value")
    Resample.timeWeightedAvg(df, "k0", "ts", "id", "value").rows shouldBe empty
  }

  test("gridForwardFill: daily grid inside [min,max], forward fill, duplicate-ts collapse") {
    val obs = Seq(
      ("a", 5L, 1.0), ("a", 5L, 3.0), // duplicate instant → max = 3.0
      ("a", 25L, 2.0),
      ("b", 7L, 9.0) // span < step → no grid point
    ).toDF("k0", "ts", "value")
    val out = Resample.gridForwardFill(obs, "k0", "ts", "value", stepNanos = 10L)
      .orderBy("k0", "ts").rows.map(r => (r.head, r(1), r(2)))
    // grid for a: t = 10, 20 (ceil(5/10)=1 .. floor(25/10)=2); both
    // carry the last observation at-or-before them (ts 5 → 3.0)
    out shouldBe Seq(("a", 10L, 3.0), ("a", 20L, 3.0))
    // a grid instant exactly on an observation takes it, not the prior
    val exact = Resample.gridForwardFill(
        Seq(("a", 10L, 5.0), ("a", 20L, 7.0)).toDF("k0", "ts", "value"),
        "k0", "ts", "value", stepNanos = 10L)
      .orderBy("ts").rows.map(r => (r(1), r(2)))
    exact shouldBe Seq((10L, 5.0), (20L, 7.0))
  }

  test("seasonalDecompose: pure weekly pattern decomposes exactly — zero residual") {
    // v(t) = 14 on pos 0, 7 elsewhere; weekly mean m = 8, so any full
    // 7-day centered window's trend is exactly 8, seasonal(0) = +6,
    // seasonal(1..6) = −1, residual 0 wherever the trend exists
    val s = (0L to 13L).map(t => ("k", t, if (t % 7 == 0) 14L else 7L))
      .toDF("k0", "t", "v")
    val out = Resample.seasonalDecompose(s, "k0", "t", "v")
      .orderBy("t")
      .rows.map(r => (r(1).asInstanceOf[Long], r(3), r(4), r(5)))
    out.foreach { case (t, trend, seasonal, residual) =>
      val pos = t % 7
      seasonal shouldBe (if (pos == 0) 6.0 else -1.0)
      if (t >= 3 && t <= 10) {
        trend shouldBe 8.0
        residual shouldBe 0.0
      } else {
        assert(trend == null)
        assert(residual == null)
      }
    }
  }

  test("seasonalDecompose: a gap in the series suppresses the trend, never mis-averages") {
    // t=7 missing: every centered RANGE window that should contain it
    // has only 6 rows → trend null there; windows clear of the gap
    // (t=3 needs 0..6) still produce one
    val s = ((0L to 13L).filterNot(_ == 7L))
      .map(t => ("k", t, 7L)).toDF("k0", "t", "v")
    val trends = Resample.seasonalDecompose(s, "k0", "t", "v")
      .rows.map(r => r(1).asInstanceOf[Long] -> r(3)).toMap
    trends(3L) shouldBe 7.0
    (4L to 10L).filterNot(_ == 7L).foreach(t => assert(trends(t) == null))
  }

  test("acf: matches the hand-computed sample autocorrelation") {
    // series 1,2,3,4: mean 2.5, den Σdev² = 5; lag1 num 1.25 → 0.25,
    // lag2 num −1.5 → −0.3
    val s = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L), ("a", 3L, 4L))
      .toDF("k", "b", "v")
    val out = CrossSeries.acf(s, maxLag = 2)
      .orderBy("lag").rows.map(r => (r(1), r(2), r(3)))
    out shouldBe Seq((1L, 3L, 0.25f), (2L, 2L, -0.3f))
  }

  test("acf: a gap contributes no pair at the bridged lag") {
    // buckets 0,1,3: lag 1 pairs (0,1) only; lag 2 pairs (1,3) only
    val s = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 3L, 4L)).toDF("k", "b", "v")
    val n = CrossSeries.acf(s, maxLag = 2)
      .orderBy("lag").rows.map(r => (r(1), r(2)))
    n shouldBe Seq((1L, 1L), (2L, 1L))
  }

  test("theilSen: median slope shrugs off a single outlier bucket") {
    // 10/bucket trend with one wild endpoint; 6 of 10 pairwise slopes
    // are exactly 10 → median 10, where OLS would be dragged far off
    val s = Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L),
      ("a", 3L, 30L), ("a", 4L, 1000L)).toDF("k", "b", "v")
    val out = CrossSeries.theilSen(s).rows.map(r => (r(0), r(1), r(2)))
    out shouldBe Seq(("a", 10L, 10.0))
  }

  test("theilSen: even pair count averages the two middle slopes") {
    // slopes of 1,3,5 (b=0,1,2): pairs → 2, 2, 2? no: (0,1)=2,(1,2)=2,
    // (0,2)=2 — use 1,3,9: slopes 2, 6, 4 → sorted 2,4,6, odd → 4
    val odd = Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 9L)).toDF("k", "b", "v")
    CrossSeries.theilSen(odd).rows.head(2) shouldBe 4.0
    // two buckets → single slope
    val two = Seq(("a", 0L, 1L), ("a", 2L, 5L)).toDF("k", "b", "v")
    CrossSeries.theilSen(two).rows.head(2) shouldBe 2.0
  }

  test("changepoint: level shift found at the boundary, ties go earliest") {
    val s = Seq(("a", 0L, 0L), ("a", 1L, 0L), ("a", 2L, 0L),
      ("a", 3L, 10L), ("a", 4L, 10L)).toDF("k", "b", "v")
    val out = CrossSeries.changepoint(s).rows.map(r =>
      (r(0), r(1), r(2), r(3), r(4), r(5)))
    out shouldBe Seq(("a", 2L, 5L, 0.0, 10.0, 120.0f))
    // constant series: every split gains 0 → earliest bucket wins
    val flat = Seq(("a", 0L, 5L), ("a", 1L, 5L), ("a", 2L, 5L)).toDF("k", "b", "v")
    CrossSeries.changepoint(flat).rows.head(1) shouldBe 0L
  }

  test("seasonalNaiveBacktest: exact MAE/sMAPE; gaps unevaluated; both-zero pairs score 0") {
    // series a: buckets 0..3 with period 2 → eval at b=2 (v=30 vs 10,
    // e=20, smape 2·20/40=1.0) and b=3 (v=20 vs 20, e=0, smape 0)
    val s = Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 2L, 30L), ("a", 3L, 20L),
      ("b", 0L, 0L), ("b", 2L, 0L), // both zero → term 0, not NULL
      ("c", 0L, 5L), ("c", 5L, 9L)  // gap: no b−2 → never evaluated
    ).toDF("k", "b", "v")
    val out = Resample.seasonalNaiveBacktest(s, period = 2L)
      .rows.map(r => (r.head, r(1), r(2), r(3))).sortBy(_._1.toString)
    out.map(_._1) shouldBe Seq("a", "b")
    val a = out.head
    a._2 shouldBe 2L
    a._3.asInstanceOf[Float] shouldBe 10.0f       // (20+0)/2
    a._4.asInstanceOf[Float] shouldBe 0.5f        // (1.0+0)/2
    val b = out(1)
    (b._2, b._3, b._4) shouldBe ((1L, 0.0f, 0.0f))
  }

  test("seasonalDecompose: duplicate t within a key fails loudly") {
    val s = Seq(("k", 0L, 7L), ("k", 0L, 8L), ("k", 1L, 7L))
      .toDF("k0", "t", "v")
    val ex = intercept[Exception] {
      Resample.seasonalDecompose(s, "k0", "t", "v").collect()
    }
    ex.getMessage should include("duplicate t")
  }

  test("seasonalDecompose: over-threshold seasonal frame joins WITHOUT a broadcast hint, rows identical") {
    val s = (0L to 13L).flatMap(t => Seq(("a", t, if (t % 7 == 0) 14L else 7L),
      ("b", t, if (t % 7 == 3) 21L else 7L))).toDF("k0", "t", "v")
    def rws(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k0", "t").rows.map(_.toString)
    val hinted = Resample.seasonalDecompose(s, "k0", "t", "v")
    val guarded = Resample.seasonalDecompose(s, "k0", "t", "v",
      maxBroadcastSeasonal = 1) // 2 keys × 7 positions = 14 rows ≫ 1
    rws(guarded) shouldBe rws(hinted)
    rws(guarded) should not be empty
    // the scale contract: past the probe threshold the logical plan
    // carries NO broadcast hint — the join may still broadcast if AQE
    // measures it tiny at runtime, but nothing FORCES a driver-sized
    // build at millions of series
    val optimized = guarded.queryExecution.optimizedPlan.toString
    withClue(optimized.take(2000)) {
      optimized should not include "strategy=broadcast"
    }
    // and the below-threshold path still pins the hint (tiny-by-probe)
    hinted.queryExecution.optimizedPlan.toString should include("strategy=broadcast")
  }

  // ── peak concurrency ───────────────────────────────────────────────

  test("peakConcurrency: sweep counts overlaps; half-open boundaries never double-count") {
    // [0,10) [5,15) overlap → 2; [15,20) starts exactly as [5,15) ends → stays ≤ 2
    val iv = Seq((0L, 10L), (5L, 15L), (15L, 20L)).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e", bucket = 100L)
      .rows.map(r => r.head -> r(1)).toMap
    out shouldBe Map(0L -> 2L)
  }

  test("peakConcurrency: per-bucket peaks and degenerate intervals excluded") {
    val iv = Seq((0L, 5L), (1L, 6L), (2L, 7L),      // bucket 0: 3 deep
      (10L, 12L),                                    // bucket 1: alone
      (20L, 20L)                                     // zero-length → dropped
    ).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e", bucket = 10L)
      .rows.map(r => r.head -> r(1)).toMap
    out shouldBe Map(0L -> 3L, 1L -> 1L)
  }

  test("peakConcurrency: level carried in from earlier buckets sets the peak") {
    // [0,12) [0,13) [15,16), bucket 10: bucket 1 holds level 2 during
    // [10,13) purely from intervals opened in bucket 0 — its only
    // in-bucket opening (t=15) reaches just 1
    val iv = Seq((0L, 12L), (0L, 13L), (15L, 16L)).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e", bucket = 10L)
      .rows.map(r => r.head -> r(1)).toMap
    out shouldBe Map(0L -> 2L, 1L -> 2L)
  }

  test("peakConcurrency: closes-only bucket reports the carry-in; event-free buckets absent") {
    // [0,25) bucket 10: bucket 2 contains only the close at t=25 but the
    // interval was live throughout → peak 1; bucket 1 has no boundary at
    // all (level constant at 1) and stays absent by documented contract
    val iv = Seq((0L, 25L)).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e", bucket = 10L)
      .rows.map(r => r.head -> r(1)).toMap
    out shouldBe Map(0L -> 1L, 2L -> 1L)
  }

  test("peakConcurrency: close landing exactly on a bucket boundary does not carry in") {
    // [0,10) [0,10) close exactly at bucket 1's start; [15,16) is the
    // only interval ever live inside bucket 1 — the bucket's first
    // boundary row is the collapsed close at t=10, whose PRE-close
    // level (2) was never in force inside [10,20) under the half-open
    // convention. Peak must be 1, not 2.
    val iv = Seq((0L, 10L), (0L, 10L), (15L, 16L)).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e", bucket = 10L)
      .rows.map(r => r.head -> r(1)).toMap
    out shouldBe Map(0L -> 2L, 1L -> 1L)
    // ...and when something DOES survive the boundary close, the
    // post-close level carries in: [0,10) closes at 10, [5,25) lives on
    val mixed = Seq((0L, 10L), (5L, 25L)).toDF("s", "e")
    val got = Intervals.peakConcurrency(mixed, "s", "e", bucket = 10L)
      .rows.map(r => r.head -> r(1)).toMap
    got shouldBe Map(0L -> 2L, 1L -> 1L, 2L -> 1L)
  }

  // ── equi-depth histogram ───────────────────────────────────────────

  test("equiDepthHistogram: equal depths on distinct values; ties share a bucket") {
    val even = (1 to 8).map(_.toDouble).toDF("v")
    val h = Percentiles.equiDepthHistogram(even, "v", 4)
      .rows.map(r => (r.head, r(1), r(2), r(3))).toSet
    h shouldBe Set((1L, 1.0, 2.0, 2L), (2L, 3.0, 4.0, 2L),
      (3L, 5.0, 6.0, 2L), (4L, 7.0, 8.0, 2L))

    // heavy tie: five 1.0s swallow buckets 1–3 entirely (cum=5 of 8,
    // bucket ⌈5·4/8⌉=3); buckets 1,2 are absent, never misassigned
    val tied = (Seq.fill(5)(1.0) ++ Seq(2.0, 3.0, 4.0)).toDF("v")
    val ht = Percentiles.equiDepthHistogram(tied, "v", 4)
      .rows.map(r => (r.head, r(1), r(2), r(3))).toSet
    ht shouldBe Set((3L, 1.0, 2.0, 6L), (4L, 3.0, 4.0, 2L))
  }
}
