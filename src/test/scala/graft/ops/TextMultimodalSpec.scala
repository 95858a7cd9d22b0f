package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: chars, tokens, avg token length") {
    val df = Seq((1L, "ab cd efg")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenStats(df)
      .select("n_chars_calc", "n_tokens", "avg_token_len").rows.head
    out(0) shouldBe 9L
    out(1) shouldBe 3L
    out(2).asInstanceOf[Double] shouldBe 7.0 / 3.0 +- 1e-12
  }

  test("qualityScore: bounded in [0,1]; richer text scores higher than repetition") {
    val df = Seq(
      (1L, "the cat and the dog ran to the house in a field as it rained"),
      (2L, "spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.qualityScore(df).orderBy("doc_id")
      .select("quality_score").rows.map(_.head.asInstanceOf[Double])
    all(s) should (be >= 0.0 and be <= 1.0)
    s(0) should be > s(1)
  }

  test("langId: stopword voting picks the right language") {
    val df = Seq(
      (1L, "the cat is in the house and it is big"),
      (2L, "le chat est dans la maison et les oiseaux"),
      (3L, "el gato es de la casa y los pajaros")
    ).toDF("doc_id", "text")
    TextAnalysis.langId(df).orderBy("doc_id").select("lang_pred").rows.map(_.head) shouldBe
      Seq("en", "fr", "es")
  }

  test("fingerprint: formatting-insensitive canonical hash") {
    val df = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "different")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df).orderBy("doc_id")
      .select("fingerprint").rows.map(_.head)
    fp(0) shouldBe fp(1)
    fp(0) should not be fp(2)
  }

  test("multimodal: binary payload round-trips; stub decode is deterministic") {
    val df = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.withBinaryPayload(df)).collect()
    meta.length shouldBe 1
    meta.head.n_bytes shouldBe 6L
    meta.head.format shouldBe "png"       // 6 % 3 == 0
    meta.head.width shouldBe 7L           // 6 % 640 + 1
  }

  test("multimodal sampleFrames: 1 row → strided frame rows") {
    val df = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.withBinaryPayload(df),
      frameSize = 16, stride = 4)
    // 100 bytes → 7 chunks (idx 0..6), stride 4 keeps idx 0 and 4
    frames.select("frame_idx").rows.map(_.head) should contain theSameElementsAs Seq(0L, 4L)
  }
}
