package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "red fox"),
    (2L, "red red wolf"),
    (3L, "blue bird")).toDF("doc_id", "text")

  test("bm25TopK: hand-computed scores, unmatched docs absent, repeated query terms count once") {
    // N=3, tot_len=7; df(red)=2, df(fox)=1
    // d1 (dl=2): denom = 1 + 1.25*(0.25 + 0.75*2*3/7)      = 2.116071...
    //   score = (ln(1.6) + ln(8/3)) * 2.25/2.116071        = 1.542764...
    // d2 (dl=3, tf(red)=2): denom = 2 + 1.25*(0.25+0.75*9/7) = 3.517857...
    //   score = ln(1.6) * 4.5/3.517857                     = 0.601244...
    val q = Seq((100L, "red fox red")).toDF("query_id", "qtext") // dup 'red'
    val out = Retrieval.bm25TopK(corpus, q, k = 10)
      .orderBy("rank").rows
    out.map(r => (r(1), r(3))) shouldBe Seq((1L, 1L), (2L, 2L)) // d3 absent
    val Seq(s1, s2) = out.map(_(2).asInstanceOf[Float].toDouble)
    val idfRed = math.log(1.6); val idfFox = math.log(8.0 / 3.0)
    s1 shouldBe ((idfRed + idfFox) * 2.25 / (1 + 1.25 * (0.25 + 0.75 * 2 * 3 / 7.0))) +- 1e-6
    s2 shouldBe (idfRed * 4.5 / (2 + 1.25 * (0.25 + 0.75 * 3 * 3 / 7.0))) +- 1e-6
  }

  test("bm25TopK excludeSelf drops the probe doc before ranking") {
    val q = corpus.filter(col("doc_id") === 1L)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val withSelf = Retrieval.bm25TopK(corpus, q, k = 10)
    withSelf.filter(col("rank") === 1).select("doc_id").rows.head.head shouldBe 1L
    val noSelf = Retrieval.bm25TopK(corpus, q, k = 10, excludeSelf = true)
    noSelf.filter(col("doc_id") === 1L).count() shouldBe 0L
    noSelf.filter(col("rank") === 1).select("doc_id").rows.head.head shouldBe 2L
  }

  test("rrfFuse: 1/(60+rank) sums across lists, singles fuse too, ties break by id") {
    val a = Seq((9L, 2L, 1L), (9L, 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((9L, 3L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 10).orderBy("rank").rows
    out.map(r => (r(1), r(3), r(4))) shouldBe Seq((3L, 2L, 1L), (2L, 1L, 2L))
    out.head(2).asInstanceOf[Float].toDouble shouldBe (1.0 / 61 + 1.0 / 62) +- 1e-6
    out(1)(2).asInstanceOf[Float].toDouble shouldBe (1.0 / 61) +- 1e-6
  }

  test("prfExpansion: feedback terms scored tf·idf, query's own terms excluded") {
    val corpus = Seq((1L, "x y z w"), (2L, "z q")).toDF("doc_id", "text")
    val probe = Seq((9L, "x y")).toDF("query_id", "qtext")
    // feedback (k=1) = doc 1; its terms minus {x, y} = {z, w};
    // idf(w) = ln 2 > idf(z) = ln(2/2) = 0 → w ranks first
    val out = Retrieval.prfExpansion(corpus, probe, kDocs = 1, kTerms = 2)
      .orderBy("rank").rows.map(r => (r(1), r(3)))
    out shouldBe Seq(("w", 1L), ("z", 2L))
  }

  test("mmrDiversify: picks relevance first, then diversity over a redundant near-dup") {
    // c2 is a near-copy of c1 (cosine ≈ 1) with almost its relevance;
    // c3 is orthogonal but less relevant. Plain top-2 = {c1, c2};
    // MMR λ=0.5 round 2: score(c2) = 0.5·0.94 − 0.5·~1 < 0,
    // score(c3) = 0.5·0.5 − 0 = 0.25 → {c1, c3}.
    val cand = Seq(
      (9L, 1L, 0.95, Seq(1.0f, 0.0f)),
      (9L, 2L, 0.94, Seq(0.999f, 0.01f)),
      (9L, 3L, 0.50, Seq(0.0f, 1.0f))
    ).toDF("query_id", "doc_id", "rel", "cv")
    val out = Retrieval.mmrDiversify(cand, k = 2).orderBy("mmr_rank")
      .rows.map(r => (r(1), r(3)))
    out shouldBe Seq((1L, 1L), (3L, 2L))
    // k beyond the candidate count just exhausts the list
    Retrieval.mmrDiversify(cand, k = 5).count() shouldBe 3L
    // a zero-norm vector fails loudly, not with an engine-dependent null
    val bad = Seq((9L, 1L, 0.9, Seq(0.0f, 0.0f))).toDF("query_id", "doc_id", "rel", "cv")
    an[Exception] should be thrownBy Retrieval.mmrDiversify(bad, k = 1).count()
  }
}
