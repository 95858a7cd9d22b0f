package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdCohortAnomalySpec extends SparkSpec {
  import spark.implicits._

  // ── Scd.type2 ──────────────────────────────────────────────────────

  // key 1: A,A,B,A — four obs, three versions (A re-opens a NEW version);
  // key 2: single obs; key 3: null attr head then a value
  private val obs = Seq(
    (1L, 10L, 100L, Some("A")), (1L, 20L, 101L, Some("A")),
    (1L, 30L, 102L, Some("B")), (1L, 40L, 103L, Some("A")),
    (2L, 10L, 200L, Some("X")),
    (3L, 10L, 300L, None), (3L, 20L, 301L, Some("C"))
  ).toDF("k", "t", "tie", "attr")

  test("type2: versions open on first obs and on every null-safe change") {
    val out = Scd.type2(obs, "k", "t", "tie", "attr")
      .orderBy("k", "version")
      .rows.map(r => (r(0), r(1), r(2), r(3), r(4), r(5), r(6)))
    out shouldBe Seq(
      (1L, 1L, "A", 10L, 30L, false, 2L),
      (1L, 2L, "B", 30L, 40L, false, 1L),
      (1L, 3L, "A", 40L, null, true, 1L),
      (2L, 1L, "X", 10L, null, true, 1L),
      (3L, 1L, null, 10L, 20L, false, 1L),
      (3L, 2L, "C", 20L, null, true, 1L))
  }

  test("type2: consecutive nulls fuse into one version") {
    val df = Seq((1L, 1L, 1L, None: Option[String]),
      (1L, 2L, 2L, None), (1L, 3L, 3L, Some("v"))).toDF("k", "t", "tie", "attr")
    val out = Scd.type2(df, "k", "t", "tie", "attr")
      .orderBy("version").rows.map(r => (r(1), r(2), r(6)))
    out shouldBe Seq((1L, null, 2L), (2L, "v", 1L))
  }

  test("type2: reserved working columns rejected") {
    val bad = obs.withColumn("version", lit(1))
    an[IllegalArgumentException] should be thrownBy
      Scd.type2(bad, "k", "t", "tie", "attr")
  }

  // ── Cohort.retention ───────────────────────────────────────────────

  test("retention: first-period cohorts, distinct keys per offset cell") {
    // periods of 10 ticks; u1 active p0,p0,p2; u2 active p1; u3 active p0,p1
    val ev = Seq(
      (1L, 0L), (1L, 5L), (1L, 25L),
      (2L, 10L),
      (3L, 9L), (3L, 19L)
    ).toDF("u", "t")
    val out = Cohort.retention(ev, "u", "t", periodLen = 10L)
      .orderBy("cohort_period", "period_offset")
      .rows.map(r => (r(0), r(1), r(2)))
    out shouldBe Seq(
      (0L, 0L, 2L), // u1, u3 in cohort 0 at offset 0
      (0L, 1L, 1L), // u3 returns in p1
      (0L, 2L, 1L), // u1 returns in p2
      (1L, 0L, 1L)) // u2's cohort is p1
  }

  test("retention: duplicate activity in a period counts once") {
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 2L)).toDF("u", "t")
    val out = Cohort.retention(ev, "u", "t", periodLen = 10L).rows
    out shouldBe Seq(Seq(0L, 0L, 1L))
    an[IllegalArgumentException] should be thrownBy
      Cohort.retention(ev, "u", "t", periodLen = 0L)
  }

  test("kaplanMeier: textbook curve — censoring shrinks the risk set, not survival") {
    // durations (t, observed): 1†, 2†, 2c, 3c, 4† over one cohort
    val subj = Seq(("c", 1L, 1L), ("c", 2L, 1L), ("c", 2L, 0L),
      ("c", 3L, 0L), ("c", 4L, 1L)).toDF("co", "d", "obs")
    val out = Cohort.kaplanMeier(subj, "co", "d", "obs")
      .orderBy("t").rows.map(r => (r(1), r(2), r(3), r(4), r(5)))
    out shouldBe Seq(
      (1L, 5L, 1L, 0L, 0.8f),  // 4/5
      (2L, 4L, 1L, 1L, 0.6f),  // × 3/4
      (3L, 2L, 0L, 1L, 0.6f),  // pure censoring: curve flat
      (4L, 1L, 1L, 0L, 0.0f))  // last subject dies
  }

  test("kaplanMeier: all-censored cohort stays at survival 1") {
    val subj = Seq(("c", 3L, 0L), ("c", 5L, 0L)).toDF("co", "d", "obs")
    val out = Cohort.kaplanMeier(subj, "co", "d", "obs")
      .orderBy("t").rows.map(r => (r(1), r(2), r(5)))
    out shouldBe Seq((3L, 2L, 1.0f), (5L, 1L, 1.0f))
  }

  // ── Anomaly.rollingZ ───────────────────────────────────────────────

  test("rollingZ: spike flagged against trailing baseline, warm-up null") {
    // 6 steady points then a spike; window=5, minSamples=3 → rows 0-2
    // unscored, spike z = (100-10)/std(prior) >> 3
    val ev = (1 to 6).map(i => (1L, i.toLong, 10.0 + (i % 2))) :+ (1L, 7L, 100.0)
    val out = Anomaly.rollingZ(ev.toDF("u", "t", "v"), Seq("u"), Seq("t"), "v",
      window = 5, minSamples = 3, threshold = 3.0)
    val byT = out.orderBy("t").rows.map(r => (r(1), r(3), r(4)))
    byT.take(3).map(_._2) shouldBe Seq(null, null, null) // warm-up
    byT.take(6).map(_._3) shouldBe Seq.fill(6)(false)
    val (_, z, flag) = byT.last
    flag shouldBe true
    z.asInstanceOf[Float] should be > 3.0f
  }

  test("rollingZ: zero-variance baseline scores null, not infinity") {
    val ev = (1 to 5).map(i => (1L, i.toLong, 7.0)) :+ (1L, 6L, 9.0)
    val out = Anomaly.rollingZ(ev.toDF("u", "t", "v"), Seq("u"), Seq("t"), "v",
      window = 5, minSamples = 3, threshold = 3.0)
    val last = out.orderBy("t").rows.last
    last(3).asInstanceOf[AnyRef] shouldBe null // z
    last(4) shouldBe false // is_anomaly
    an[IllegalArgumentException] should be thrownBy
      Anomaly.rollingZ(ev.toDF("u", "t", "v"), Seq("u"), Seq("t"), "v",
        window = 2, minSamples = 3)
  }

  test("robustZ: median/MAD resist the outlier that inflates a stddev baseline") {
    // values 1..9 plus a 1000 spike: med = 5.5, MAD = 2.5 →
    // M(1000) = 0.6745·994.5/2.5 ≈ 268 — flagged; the inliers stay
    // unflagged BECAUSE the spike couldn't move the baseline
    val df = ((1 to 9).map(i => ("u", i.toLong, i.toDouble)) :+ ("u", 10L, 1000.0))
      .toDF("k", "id", "v")
    val out = Anomaly.robustZ(df, Seq("k"), "v").orderBy("id")
    out.filter(org.apache.spark.sql.functions.col("is_anomaly"))
      .select("id").rows.map(_.head) shouldBe Seq(10L)
    val m = out.filter(org.apache.spark.sql.functions.col("id") === 10L)
      .select("robust_z").rows.head.head.asInstanceOf[Float]
    m shouldBe (0.6745 * (1000.0 - 5.5) / 2.5).toFloat +- 1e-3f
  }

  test("robustZ: zero MAD scores null; null values pass unflagged") {
    val df = Seq(("u", 1L, Some(5.0)), ("u", 2L, Some(5.0)),
      ("u", 3L, Some(5.0)), ("u", 4L, Some(99.0)), ("u", 5L, None))
      .toDF("k", "id", "v")
    // median 5, deviations (0,0,0,94) → MAD 0 → all scores null
    val out = Anomaly.robustZ(df, Seq("k"), "v")
    out.filter(org.apache.spark.sql.functions.col("is_anomaly")).count() shouldBe 0
    out.select("robust_z").rows.foreach(r => assert(r.head == null))
  }

  test("cusum: closed form equals the textbook recursion, resets after dips") {
    // dollars 1,2,1,3,5 with target $2, no slack → up-devs (cents):
    // -100,0,-100,100,300. Recursion S+: 0,0,0,100,400.
    // down-devs: 100,0,100,-100,-300 → S-: 100,100,200,100,0.
    val ev = Seq(1.0, 2.0, 1.0, 3.0, 5.0).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }.toDF("u", "t", "v")
    val out = Anomaly.cusum(ev, Seq("u"), Seq("t"), "v",
        targetCents = 200L, slackCents = 0L, decisionCents = 300L)
      .orderBy("t").rows.map(r => (r(3), r(4), r(5)))
    out.map(_._1) shouldBe Seq(0L, 0L, 0L, 100L, 400L)
    out.map(_._2) shouldBe Seq(100L, 100L, 200L, 100L, 0L)
    // only the final point crosses the $3 decision, upward
    out.map(_._3) shouldBe Seq(null, null, null, null, "up")
    an[IllegalArgumentException] should be thrownBy
      Anomaly.cusum(ev, Seq("u"), Seq("t"), "v", 200L, slackCents = -1L)
  }

  test("cusum: slack absorbs small wander, null values pass through") {
    // constant $2 with $0.50 slack: both statistics stay at 0
    val flat = (0 until 4).map(i => (1L, i.toLong, 2.0)).toDF("u", "t", "v")
    Anomaly.cusum(flat, Seq("u"), Seq("t"), "v", 200L, slackCents = 50L)
      .orderBy("t").rows.map(r => (r(3), r(4))) shouldBe
      Seq.fill(4)((0L, 0L))
    val withNull = Seq((1L, 0L, Some(1.0)), (1L, 1L, None), (1L, 2L, Some(3.0)))
      .toDF("u", "t", "v")
    val rows = Anomaly.cusum(withNull, Seq("u"), Seq("t"), "v", 200L)
      .orderBy("t").rows
    assert(rows(1)(3) == null) // null value → null statistic
    // the null row contributes nothing: devs -100, +100 → R = 0,
    // S+ = 0 - min(0, -100) = 100 (recursion: 0 → skip → max(0,0+100))
    rows(2)(3) shouldBe 100L
  }

  test("bigramLogProb: add-1 transition probabilities, short docs drop") {
    // corpus bigrams: "a b"=1, "b a"=1, "b b"=1; contexts a=1, b=2;
    // V=3 — the bigram-less doc "solo" still contributes its token to
    // the unigram VOCABULARY, so the smoothing denominator sees it:
    // P(b|a)=(1+1)/(1+3)=1/2, P(a|b)=(1+1)/(2+3)=2/5, P(b|b)=2/5
    val docs = Seq((1L, "a b a"), (2L, "b b"), (3L, "solo"), (4L, "  "))
      .toDF("doc_id", "text")
    val out = Vocab.bigramLogProb(docs).orderBy("doc_id").rows
      .map(r => (r(0), r(1), r(2)))
    def q(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    out.map(t => (t._1, t._2)) shouldBe Seq((1L, 2L), (2L, 1L))
    out(0)._3.asInstanceOf[Float] shouldBe
      ((q(math.log(0.5)) + q(math.log(0.4))).toDouble / 2).toFloat
    out(1)._3.asInstanceOf[Float] shouldBe q(math.log(0.4)).toDouble.toFloat
    // "solo" has one token, "  " none — neither carries a bigram row
    out.map(_._1) should not contain 3L
  }

  // ── Vocab.unigramLogProb ───────────────────────────────────────────

  test("unigramLogProb: mean ln p under the corpus's own unigram model") {
    // corpus: "a a b" + "a c" → counts a=3 b=1 c=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Vocab.unigramLogProb(docs).orderBy("doc_id")
      .rows.map(r => (r(0), r(1), r(2)))
    out.map(t => (t._1, t._2)) shouldBe Seq((1L, 3L), (2L, 2L))
    val exp1 = (2 * math.log(3.0 / 5) + math.log(1.0 / 5)) / 3
    val exp2 = (math.log(3.0 / 5) + math.log(1.0 / 5)) / 2
    out(0)._3.asInstanceOf[Float] shouldBe exp1.toFloat +- 1e-6f
    out(1)._3.asInstanceOf[Float] shouldBe exp2.toFloat +- 1e-6f
  }

  test("unigramLogProb: empty/whitespace docs drop out of the scoring") {
    val docs = Seq((1L, "x"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Vocab.unigramLogProb(docs).orderBy("doc_id").rows
    out.map(_(0)) shouldBe Seq(1L)
    out.head(2).asInstanceOf[Float] shouldBe 0.0f // ln p("x")=ln 1
  }
}
