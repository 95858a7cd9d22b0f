package graft.ops

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // 3 positive docs, 2 negative; labels explicit so the weight math is
  // checkable by hand
  private val labeled = Seq(
    (1L, "good clean prose with words", true),
    (2L, "good clean text with words", true),
    (3L, "good prose text here", true),
    (4L, "spam spam spam buy now", false),
    (5L, "buy spam now now now", false)
  ).toDF("doc_id", "text", "lbl")

  // exact replica of the operator's arithmetic: ln on exact-integer
  // ratios, quantized to 12 places (Spark decimal cast = HALF_UP), then
  // exact decimal subtraction
  private def refWeight(tfp: Long, tfn: Long, npos: Long, nneg: Long,
                        v: Long): BigDecimal = {
    def q(x: Double) = BigDecimal(x).setScale(12, RoundingMode.HALF_UP)
    q(math.log((tfp + 1).toDouble / (npos + v))) -
      q(math.log((tfn + 1).toDouble / (nneg + v)))
  }

  test("logOddsWeights matches the hand reference model") {
    val w = QualityModel.logOddsWeights(labeled, labelCol = "lbl", minDf = 2)
    val got = w.select("token", "n_docs", "tf_pos", "tf_neg", "w").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), BigDecimal(r.getDecimal(4))))).toMap
    // df >= 2 vocab: good(3 docs), clean(2), with(2), words(2), prose(2),
    // text(2), spam(2 docs / 4 occ), buy(2), now(2 docs / 4 occ)
    got.keySet shouldBe Set("good", "clean", "with", "words", "prose",
      "text", "spam", "buy", "now")
    val v = got.size.toLong
    val npos = got.values.map(_._2).sum // class totals over capped vocab
    val nneg = got.values.map(_._3).sum
    npos shouldBe 13L // good×3 clean×2 with×2 words×2 prose×2 text×2
    nneg shouldBe 10L // spam×4 buy×2 now×4
    for ((tok, (_, tfp, tfn, w12)) <- got)
      withClue(s"token=$tok: ") {
        w12 shouldBe refWeight(tfp, tfn, npos, nneg, v)
      }
    // signal direction: class-exclusive tokens sit on opposite sides
    assert(got("good")._4.signum > 0)
    assert(got("spam")._4.signum < 0)
  }

  test("score: exact weight sums, OOV contributes zero, empty docs survive") {
    val w = QualityModel.logOddsWeights(labeled, labelCol = "lbl", minDf = 2)
    val wm = w.select("token", "w").collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    val unseen = Seq(
      (10L, "good clean words"),            // all in-vocab, positive lean
      (11L, "spam buy now spam"),           // negative lean
      (12L, "zzz qqq unseen only"),         // fully OOV → 0
      (13L, "")                             // no tokens at all
    ).toDF("doc_id", "text")
    val got = QualityModel.score(unseen, w).orderBy("doc_id")
      .select("doc_id", "n_tok", "nb_llr", "pred").collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)), r.getInt(3)))
    got(0) shouldBe ((10L, 3L, wm("good") + wm("clean") + wm("words"), 1))
    got(1) shouldBe ((11L, 4L, wm("spam") * 2 + wm("buy") + wm("now"), 0))
    got(2) shouldBe ((12L, 4L, BigDecimal(0), 0))
    got(3) shouldBe ((13L, 0L, BigDecimal(0), 0))
  }

  test("weights and scores are invariant to input partitioning") {
    // the scaladoc claims bit-reproducibility across partitionings — the
    // decimal quantize-then-sum recipe makes reduction order irrelevant;
    // prove it by re-running the whole fit+score on a repartitioned input
    val wA = QualityModel.logOddsWeights(labeled, labelCol = "lbl", minDf = 2)
    val wB = QualityModel.logOddsWeights(labeled.repartition(7),
      labelCol = "lbl", minDf = 2)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("token", "w").collect()
        .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    key(wA) shouldBe key(wB)
    val docs = Seq((10L, "good clean words"), (11L, "spam buy now spam"))
      .toDF("doc_id", "text")
    val sA = QualityModel.score(docs, wA).select("doc_id", "nb_llr").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val sB = QualityModel.score(docs.repartition(5), wB)
      .select("doc_id", "nb_llr").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    sA shouldBe sB
  }

  test("logOddsWeights fails loudly on a null label") {
    val withNull = Seq(
      (1L, "good clean prose", Some(true)),
      (2L, "spam spam spam", Some(false)),
      (3L, "mystery unlabeled words", None)
    ).toDF("doc_id", "text", "lbl")
    val e = intercept[Exception] {
      QualityModel.logOddsWeights(withNull, labelCol = "lbl", minDf = 1)
        .collect()
    }
    assert(e.getMessage.contains("null label") ||
      Option(e.getCause).exists(_.getMessage.contains("null label")),
      s"wrong failure: ${e.getMessage}")
  }

  test("end-to-end with heuristic labels: natural text outscores spam") {
    // labels from the same heuristic the query uses; train docs repeat
    // tokens so minDf=2 keeps them
    val corpus = Seq.tabulate(20) { i =>
      if (i % 2 == 0)
        (i.toLong, "the quick brown fox jumps over the lazy dog and runs far " +
          s"away from trouble number $i")
      else
        (i.toLong, s"buy buy buy now now click click here here $i $i $i")
    }.toDF("doc_id", "text")
    val lab = TextAnalysis.qualityScore(corpus)
      .withColumn("lbl",
        coalesce(col("quality_score").cast("float") >= lit(0.5f), lit(false)))
    val w = QualityModel.logOddsWeights(lab, labelCol = "lbl", minDf = 2)
    val test = Seq(
      (100L, "the quick brown dog runs over the lazy fox"),
      (101L, "buy now click here buy now click here")
    ).toDF("doc_id", "text")
    val s = QualityModel.score(test, w).orderBy("doc_id")
      .select("doc_id", "nb_llr").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(s(100L) > s(101L),
      s"natural ${s(100L)} should beat spam ${s(101L)}")
    assert(s(100L) > 0 && s(101L) < 0)
  }
}
