package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 400L).map(i =>
    (i, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")

  test("hashSplit: deterministic, partitions the corpus, roughly 90/5/5") {
    val s1 = Sampling.hashSplit(docs, "doc_id").groupBy("split").count()
      .rows.map(r => r(0) -> r(1)).toMap
    val s2 = Sampling.hashSplit(docs, "doc_id").groupBy("split").count()
      .rows.map(r => r(0) -> r(1)).toMap
    s1 shouldBe s2
    s1.values.map(_.asInstanceOf[Long]).sum shouldBe 400L
    s1("train").asInstanceOf[Long] should be > 300L
  }

  test("upsample: weight 0 drops the domain; caller columns named pos/col survive") {
    val df = Seq((1L, "en", "x"), (2L, "zh", "y")).toDF("doc_id", "lang", "col")
    val up = Sampling.upsample(df, "doc_id", "lang", Map("zh" -> 0.0, "en" -> 2.0))
    up.filter(org.apache.spark.sql.functions.col("lang") === "zh").count() shouldBe 0
    up.columns should contain("col")   // generator aliasing must not eat it
    up.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("col").distinct().rows.map(_.head) shouldBe Seq("x")
  }

  test("quantileBand: null values are excluded from the band and the total") {
    val df = (1L to 100L).map(i => (i, if (i % 10 == 0) None else Some(i)))
      .toDF("id", "v")
    // 90 non-null values 1..100 (minus multiples of 10); trim 10% each end
    val kept = Sampling.quantileBand(df, "v", 0.1, 0.9)
    kept.filter(col("v").isNull).count() shouldBe 0
    val vs = kept.select("v").rows.map(_.head.asInstanceOf[Long])
    // 90 values → below-count thresholds at 9 and 81: 9 smallest and 9
    // largest non-null values drop
    vs.size shouldBe 72
    vs.min should be > 9L
    vs.max should be < 91L
  }

  test("upsample: integer weights replicate exactly; fractional in expectation") {
    // en ×3 (integer: every en doc exactly 3 copies), zh ×0.5
    val up = Sampling.upsample(docs, "doc_id", "lang", Map("en" -> 3.0, "zh" -> 0.5))
    val perDoc = up.groupBy("doc_id", "lang").count()
    perDoc.filter(col("lang") === "en").select("count").distinct()
      .rows.map(_.head) shouldBe Seq(3L)
    // zh: each doc keeps 0 or 1 copies, totalling roughly half
    val zh = up.filter(col("lang") === "zh").count()
    zh should (be >= 60L and be <= 140L)
    // copy_idx enumerates replicas 0..n-1
    up.filter(col("lang") === "en").groupBy("doc_id")
      .agg(min("copy_idx").as("lo"), max("copy_idx").as("hi"))
      .select("lo", "hi").distinct().rows shouldBe Seq(Seq(0L, 2L))
    // deterministic under re-run
    val again = Sampling.upsample(docs, "doc_id", "lang", Map("en" -> 3.0, "zh" -> 0.5))
    again.count() shouldBe up.count()
  }
}
