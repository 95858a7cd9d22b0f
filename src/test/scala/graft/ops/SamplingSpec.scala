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

  test("kFold: deterministic partition into k folds, stable under growth") {
    val f = Sampling.kFold(docs, "doc_id", k = 5)
    val byFold = f.groupBy("fold").count()
      .rows.map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    byFold.keySet shouldBe (0L to 4L).toSet
    byFold.values.sum shouldBe 400L
    byFold.values.foreach(_ should be > 40L) // no starved fold at n=400
    // growth stability: each row's fold is a pure function of its id —
    // adding rows cannot move existing assignments
    val grown = Sampling.kFold(docs.unionByName(
      Seq((9999L, "en")).toDF("doc_id", "lang")), "doc_id", k = 5)
    grown.filter(col("doc_id") <= 400L).rows.map(_.toString).sorted shouldBe
      f.rows.map(_.toString).sorted
    intercept[IllegalArgumentException] { Sampling.kFold(docs, "doc_id", 1) }
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

  test("bpeTrain: hand-computed merges, tie-breaks, greedy overlap, early exhaustion") {
    val corpus = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "aaa"))
      .toDF("doc_id", "text")
    // word freqs: low 3, lower 2, aaa 1. Round by round:
    //  1: (l,o) and (o,w) tie at 5 → lexicographic → (l,o)
    //  2: (lo,w) 5
    //  3: (a,a) 2 — counted WITH overlap (both adjacent positions of
    //     "aaa"), tied with (e,r)/(low,e) → "a" sorts first; the merge
    //     applies greedily without overlap: aaa → [aa, a]
    //  4: (e,r) 2 beats (low,e) lexicographically
    //  5: (low,er) 2
    //  6: (aa,a) 1
    //  7: no pairs left → stops at 6 of the 8 requested merges
    val out = Vocab.bpeTrain(corpus, nMerges = 8, maxWords = 500)
      .orderBy("rank").rows.map(r => (r.head, r(1), r(2), r(3)))
    out shouldBe Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "a", "a", 2L),
      (4L, "e", "r", 2L), (5L, "low", "er", 2L), (6L, "aa", "a", 1L))
    // df-cap: with only the top-2 words in the dictionary, 'aaa' is out
    // and its merges never surface
    val capped = Vocab.bpeTrain(corpus, nMerges = 3, maxWords = 2)
      .select("lhs", "rhs").rows.map(r => (r.head, r(1)))
    capped should contain(("l", "o"))
    capped should not contain (("a", "a"))
  }

  test("bpeApply: learned merges segment the corpus to hand-computed counts") {
    val corpus = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "aaa"))
      .toDF("doc_id", "text")
    // 2 merges — (l,o) then (lo,w): low → [low] (1), lower → [low,e,r]
    // (3), aaa untouched → [a,a,a] (3)
    val two = Vocab.trainMergesWithCounts(corpus, "text", nMerges = 2,
      maxWords = 500).map(m => (m._2, m._3))
    Vocab.bpeApply(corpus, "doc_id", "text", two)
      .orderBy("doc_id").rows.map(r => (r.head, r(1))) shouldBe
      Seq((1L, 3L), (2L, 6L), (3L, 3L))
    // all 6 learnable merges: every vocabulary word collapses to a
    // single token, so counts = whitespace token counts
    val all = Vocab.trainMergesWithCounts(corpus, "text", nMerges = 8,
      maxWords = 500).map(m => (m._2, m._3))
    Vocab.bpeApply(corpus, "doc_id", "text", all)
      .orderBy("doc_id").rows.map(r => (r.head, r(1))) shouldBe
      Seq((1L, 3L), (2L, 2L), (3L, 1L))
  }

  test("tfIdfCosineTopK agrees with a dense brute-force cosine") {
    val docs = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "apple banana cherry"),
      (3L, "dog cat mouse"),
      (4L, "dog cat mouse dog dog"),
      (5L, "apple dog zebra"),
      (6L, "unique solitary tokens only")).toDF("doc_id", "text")
    val out = Vocab.tfIdfCosineTopK(docs, "doc_id", "text", k = 2, maxDf = 100L)
      .rows.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Float], r(3).asInstanceOf[Long]))

    // brute force: w(d,t) = tf * sqrt(N/df) over the same tokenizer
    val toks = Seq(
      1L -> Seq("apple", "banana", "cherry", "apple"),
      2L -> Seq("apple", "banana", "cherry"),
      3L -> Seq("dog", "cat", "mouse"),
      4L -> Seq("dog", "cat", "mouse", "dog", "dog"),
      5L -> Seq("apple", "dog", "zebra"),
      6L -> Seq("unique", "solitary", "tokens", "only"))
    val n = toks.size.toDouble
    val tf = toks.map { case (d, ts) =>
      d -> ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble } }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    def w(d: Long, t: String) = tf(d).getOrElse(t, 0.0) * math.sqrt(n / dfreq(t))
    val terms = dfreq.keys.toSeq
    def cos(a: Long, b: Long): Double = {
      val dot = terms.map(t => w(a, t) * w(b, t)).sum
      val na = math.sqrt(terms.map(t => w(a, t) * w(a, t)).sum)
      val nb = math.sqrt(terms.map(t => w(b, t) * w(b, t)).sum)
      dot / (na * nb)
    }
    // doc1's nearest is doc2 (same term set), then doc5 (shares apple)
    val d1 = out.filter(_._1 == 1L).sortBy(_._4)
    d1.map(_._2) shouldBe Seq(2L, 5L)
    d1.head._3.toDouble shouldBe cos(1L, 2L) +- 1e-6
    d1(1)._3.toDouble shouldBe cos(1L, 5L) +- 1e-6
    // doc6 shares no terms with anything → no rows at all
    out.filter(_._1 == 6L) shouldBe empty
    // ranks are 1-based consecutive per doc
    out.groupBy(_._1).values.foreach { rs =>
      rs.map(_._4).sorted shouldBe (1L to rs.size.toLong)
    }
  }

  test("tfIdfCosineTopK maxDf excludes high-df terms from the space") {
    // "the" appears in all 3 docs; with maxDf=2 it must not contribute
    val docs = Seq(
      (1L, "the red fox"),
      (2L, "the red wolf"),
      (3L, "the blue bird")).toDF("doc_id", "text")
    val out = Vocab.tfIdfCosineTopK(docs, "doc_id", "text", k = 2, maxDf = 2L)
    // docs 1,2 share only "red" now; doc3 shares nothing with anyone
    out.filter(col("doc_a") === 3L).count() shouldBe 0L
    val c12 = out.filter(col("doc_a") === 1L && col("doc_b") === 2L)
      .select("cosine").rows.head.head.asInstanceOf[Float]
    // w(red)² = 3/2; each norm² = 3/2 (red) + 3 (the df=1 term) = 4.5
    // → cosine = 1.5 / 4.5 = 1/3
    c12.toDouble shouldBe (1.0 / 3.0) +- 1e-6
  }

  test("tfIdfCosineTopK returns all matches when k exceeds neighbor count") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "plum fig")).toDF("doc_id", "text")
    val out = Vocab.tfIdfCosineTopK(docs, "doc_id", "text", k = 10, maxDf = 10L)
    out.filter(col("doc_a") === 1L).count() shouldBe 1L   // only doc2 shares a term
    out.filter(col("doc_a") === 3L).count() shouldBe 0L
  }

  test("temperatureSample: α=0.5 flattens toward uniform, budgets floor-truncate") {
    // 320 'en' vs 80 'zh': natural shares 80%/20%; sqrt shares
    // √320/(√320+√80) ≈ 66.7%/33.3% — the minority domain gains
    val d = (1L to 400L).map(i => (i, if (i <= 320) "en" else "zh"))
      .toDF("doc_id", "lang")
    val s = Sampling.temperatureSample(d, "doc_id", "lang", total = 100L)
    val byLang = s.groupBy("lang").count().rows.map(r => r.head -> r(1)).toMap
    byLang("en").asInstanceOf[Long] shouldBe 66L // floor(100·2/3)
    byLang("zh").asInstanceOf[Long] shouldBe 33L // floor(100·1/3)
    // α=1 reproduces natural proportions
    val nat = Sampling.temperatureSample(d, "doc_id", "lang",
      total = 100L, alpha = 1.0)
    nat.groupBy("lang").count().rows.map(r => r.head -> r(1)).toMap
      .apply("en").asInstanceOf[Long] shouldBe 80L
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureSample(d, "doc_id", "lang", total = 100L, alpha = 0.7)
  }

  test("weightedSampleWOR: weight bias, salted ≡ one-window, contiguous ranks") {
    // heavy rows (w=100) vs light (w=1): the sample should be mostly heavy
    val df = (1L to 300L).map(i => (i, if (i % 2 == 0) 100.0 else 1.0))
      .toDF("id", "w")
    val s = Sampling.weightedSampleWithoutReplacement(df, "id", col("w"), n = 50)
    s.count() shouldBe 50L
    s.filter(col("id") % 2 === 0).count() should be > 40L
    // salted two-phase ≡ the unsalted one-window form (the containment
    // proof, exercised): identical sample, identical ranks
    val s1 = Sampling.weightedSampleWithoutReplacement(df, "id", col("w"),
      n = 50, salts = 1)
    s.orderBy("wor_rank").rows shouldBe s1.orderBy("wor_rank").rows
    s.select("wor_rank").rows.map(_.head.asInstanceOf[Long]).sorted shouldBe
      (1L to 50L)
  }

  test("weightedSampleWOR: null / non-positive weights carry no mass; strata are independent") {
    val df = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(5.0)), (3L, "a", None),
      (4L, "a", Some(0.0)), (5L, "a", Some(-2.0)),
      (6L, "b", Some(1.0)), (7L, "b", Some(1.0)), (8L, "b", Some(1.0)))
      .toDF("id", "lang", "w")
    val s = Sampling.weightedSampleWithoutReplacement(df, "id", col("w"),
      n = 2, stratum = Some("lang"))
    // stratum a has only 2 eligible rows (3,4,5 excluded) → both selected
    s.filter(col("lang") === "a").select("id").rows.map(_.head)
      .toSet shouldBe Set(1L, 2L)
    s.filter(col("lang") === "b").count() shouldBe 2L
  }
}
