package graft.ops

import graft.SparkSpec

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  // one key, strictly increasing order column, prices in dollars
  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "ord", "price")

  test("ewma: head-of-series renormalizes over present weights") {
    val out = Indicators.ewma(series(1.0, 2.0), key = "key",
        order = Seq("ord"), value = "price", n = 2)
      .orderBy("ord").rows.map(_(3).asInstanceOf[Float])
    // row0: only w0 present -> 100 cents exactly
    out(0) shouldBe 100.0f
    // row1: (200·1 + 100·0.5) / 1.5 = 166.66667 cents
    out(1) shouldBe (250.0 / 1.5).toFloat
  }

  test("ewma: weights are exact decimals, window slides off old rows") {
    val out = Indicators.ewma(series(1.0, 1.0, 1.0, 9.0), key = "key",
        order = Seq("ord"), value = "price", n = 2)
      .orderBy("ord").rows.map(_(3).asInstanceOf[Float])
    // constant prefix stays exactly at the price
    out(1) shouldBe 100.0f
    out(2) shouldBe 100.0f
    // row3: (900 + 100·0.5)/1.5
    out(3) shouldBe (950.0 / 1.5).toFloat
    an[IllegalArgumentException] should be thrownBy
      Indicators.ewma(series(1.0), "key", Seq("ord"), "price", n = 13)
  }

  test("ewma: additive-precision boundary is exactly n=10 at decay=0.5") {
    // Pins the precision gate deliberately: decay=0.5 (scale 1) gives
    // weight scale n−1, and the running SUM needs 20 + (n−1) + (n−1)
    // digits — 38 at n=10 (the last accepted window), 40 at n=11. A
    // future loosening/tightening of the bound must move this test
    // consciously, not silently.
    noException should be thrownBy
      Indicators.ewma(series(1.0, 2.0), "key", Seq("ord"), "price",
        n = 10, decay = BigDecimal("0.5")).collect()
    an[IllegalArgumentException] should be thrownBy
      Indicators.ewma(series(1.0, 2.0), "key", Seq("ord"), "price",
        n = 11, decay = BigDecimal("0.5"))
  }

  test("bollinger: flat series collapses the band onto the midline") {
    val out = Indicators.bollinger(series(5.0, 5.0, 5.0), key = "key",
        order = Seq("ord"), value = "price", n = 3)
      .orderBy("ord").rows
    // first row: band null (single sample), midline present
    out(0)(3) shouldBe 5.0f
    assert(out(0)(4) == null)
    // flat frame: sd = 0 -> both bands equal the midline
    out(2)(3) shouldBe 5.0f
    out(2)(4) shouldBe 5.0f
    out(2)(5) shouldBe 5.0f
  }

  test("bollinger: hand-computed two-point band") {
    // cents 100, 300: mean 200, stddev_samp = sqrt(((100-200)^2+(300-200)^2)/1)
    // = sqrt(20000) ≈ 141.42136 -> upper = (200 + 2·141.42136)/100
    val out = Indicators.bollinger(series(1.0, 3.0), key = "key",
        order = Seq("ord"), value = "price", n = 2)
      .orderBy("ord").rows
    out(1)(3) shouldBe 2.0f
    out(1)(4).asInstanceOf[Float] shouldBe
      ((200.0 + 2.0 * math.sqrt(20000.0)) / 100.0).toFloat
  }

  test("rsi: all-up is 100, all-down is 0, mixed is the gain share") {
    val up = Indicators.rsi(series(1.0, 2.0, 3.0), "key", Seq("ord"),
      "price", n = 14).orderBy("ord").rows
    assert(up(0)(3) == null) // no move in frame yet
    up(2)(3) shouldBe 100.0f
    val down = Indicators.rsi(series(3.0, 2.0, 1.0), "key", Seq("ord"),
      "price", n = 14).orderBy("ord").rows
    down(2)(3) shouldBe 0.0f
    // +100, -50 cents -> 100·100/150
    val mixed = Indicators.rsi(series(1.0, 2.0, 1.5), "key", Seq("ord"),
      "price", n = 14).orderBy("ord").rows
    mixed(2)(3).asInstanceOf[Float] shouldBe (100.0 * 100.0 / 150.0).toFloat
  }

  test("rsi: the frame forgets moves older than n deltas") {
    // deltas: +100, -100, -100; with n=2 the last frame holds [-100,-100]
    val out = Indicators.rsi(series(1.0, 2.0, 1.0, 0.5), "key", Seq("ord"),
      "price", n = 2).orderBy("ord").rows
    out(3)(3) shouldBe 0.0f
  }

  test("rsiWilder matches a naive Wilder fold on seeded random series") {
    val n = 5
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(40 + seed)
      val rows = (0 until 3).flatMap { k =>
        (0 until 60).map(i =>
          (s"k$k", i.toLong, (rnd.nextInt(100000) + 1) / 100.0))
      }
      // naive per-key fold in plain Scala doubles
      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val cents = rs.sortBy(_._2).map(r => math.round(r._3 * 100).toDouble)
        val deltas = cents.zip(cents.drop(1)).map { case (a, b) => b - a }
        val gains = deltas.map(d => math.max(d, 0.0))
        val losses = deltas.map(d => math.max(-d, 0.0))
        def wilder(xs: Seq[Double]): Seq[Option[Double]] =
          xs.zipWithIndex.scanLeft(Option.empty[Double] -> 0.0) {
            case ((avg, sum), (x, i)) =>
              if (i < n - 1) (None, sum + x)
              else if (i == n - 1) (Some((sum + x) / n), sum + x)
              else (Some((avg.get * (n - 1) + x) / n), sum)
          }.drop(1).map(_._1)
        val (ag, al) = (wilder(gains), wilder(losses))
        val rsis = Option.empty[Float] +: ag.zip(al).map {
          case (Some(g), Some(l)) if g + l != 0 =>
            Some((100.0 * g / (g + l)).toFloat)
          case _ => Option.empty[Float]
        }
        rs.sortBy(_._2).map(_._2).zip(rsis).map { case (ord, r) =>
          (k, ord) -> r.map(_.asInstanceOf[Any]).orNull
        }
      }
      val got = Indicators.rsiWilder(rows.toDF("key", "ord", "price"),
          "key", Seq("ord"), "price", n = n)
        .select("key", "ord", "rsi_wilder").rows
        .map(r => (r(0), r(1)) -> r(2)).toMap
      withClue(s"seed=$seed: ") { got shouldBe expected.toMap }
    }
  }

  test("emaRecursive matches the naive recursion; flat series stays put") {
    val rnd = new scala.util.Random(7)
    val vals = (0 until 40).map(_ => (rnd.nextInt(100000) + 1) / 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "ord", "price")
    val cents = vals.map(v => math.round(v * 100).toDouble)
    val expected = cents.tail.scanLeft(cents.head) {
      (e, x) => 0.125 * x + 0.875 * e
    }.map(_.toFloat)
    Indicators.emaRecursive(df, "key", Seq("ord"), "price", alpha = 0.125)
      .orderBy("ord").select("ema_rec_cents").rows.map(_.head) shouldBe expected
    // constant series: the recursion is a fixed point
    Indicators.emaRecursive(series(2.0, 2.0, 2.0), "key", Seq("ord"), "price")
      .select("ema_rec_cents").rows.map(_.head).toSet shouldBe Set(200.0f)
  }

  test("macd: hand-computed two-point crossover; naive triple fold on a random series") {
    // cents 100, 200 with α_f=1/2, α_s=1/4, α_sig=1/2:
    // fast 100,150; slow 100,125; macd 0,25; signal 0,12.5; hist 0,12.5
    val out = Indicators.macd(series(1.0, 2.0), "key", Seq("ord"), "price",
        nFast = 3, nSlow = 7, nSignal = 3)
      .orderBy("ord").rows.map(r => (r(3), r(4), r(5)))
    out shouldBe Seq((0.0f, 0.0f, 0.0f), (25.0f, 12.5f, 12.5f))
    // naive scan replay on a seeded random series, default 12/26/9
    val rnd = new scala.util.Random(11)
    val vals = (0 until 30).map(_ => (rnd.nextInt(100000) + 1) / 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "ord", "price")
    val cents = vals.map(v => math.round(v * 100).toDouble)
    def emaScan(a: Double, xs: Seq[Double]) =
      xs.tail.scanLeft(xs.head)((e, x) => a * x + (1 - a) * e)
    val m = emaScan(2.0 / 13, cents).zip(emaScan(2.0 / 27, cents))
      .map { case (f, s) => f - s }
    val sig = emaScan(2.0 / 10, m)
    val expected = m.zip(sig).map { case (mm, ss) =>
      (mm.toFloat, ss.toFloat, (mm - ss).toFloat) }
    Indicators.macd(df, "key", Seq("ord"), "price")
      .orderBy("ord").rows.map(r => (r(3), r(4), r(5))) shouldBe expected
  }

  test("macd: all three folds share one exchange and one sort") {
    val plan = Indicators.macd(series(1.0, 2.0, 3.0), "key", Seq("ord"), "price")
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }
}
