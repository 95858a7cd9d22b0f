package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesRecommendSpec extends SparkSpec {
  import spark.implicits._

  private val H = 7L * 86400000000000L // 7-day half-life, nanos

  test("hashingTrick: same token always lands in one signed bucket; cancellation drops the row") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Features.hashingTrick(docs, "doc_id", "text", dim = 64)
      .rows.map(r => (r.head, r(1), r(2)))
    // token determinism: alpha's bucket/sign identical across docs, so
    // doc 2's weight is exactly one third-magnitude of... rather: doc 1
    // holds 2·sign(alpha) in alpha's bucket + 1·sign(beta) in beta's;
    // doc 2 holds 1·sign(alpha) in the SAME bucket; doc 3 vanishes
    val d2row = out.filter(_._1 == 2L)
    d2row.size shouldBe 1
    val (_, alphaBucket, alphaW) = d2row.head
    math.abs(alphaW.asInstanceOf[Long]) shouldBe 1L
    val d1alpha = out.filter(r => r._1 == 1L && r._2 == alphaBucket)
    // beta could collide into alpha's bucket; weight is then 2s_a ± 1
    d1alpha.size shouldBe 1
    out.count(_._1 == 3L) shouldBe 0
    // exact cancellation: two tokens with opposite signs in one bucket
    // (construct by duplicating alpha with itself negated is impossible
    // from data — instead verify the zero-filter via a same-token
    // opposite-sign impossibility: same token can never cancel itself)
    val same = Features.hashingTrick(
      Seq((9L, "alpha alpha")).toDF("doc_id", "text"), "doc_id", "text", 64)
      .rows.head
    math.abs(same(2).asInstanceOf[Long]) shouldBe 2L
  }

  test("decayedCounts: one half-life halves the weight; watermark is the frame's own max ts") {
    val ev = Seq(
      ("u", 0L, Some(4.0)),   // one half-life old → weight 0.5
      ("u", H, Some(10.0))    // at the watermark → weight 1.0
    ).toDF("k", "t", "v")
    val r = Features.decayedCounts(ev, "k", "t", "v", H).rows.head
    (r.head, r(1), r(2)) shouldBe (("u", 2L, H))
    r(3) shouldBe 1.5f                  // 1.0 + 0.5
    r(4) shouldBe 12.0f                 // 10·1.0 + 4·0.5
  }

  test("decayedCounts: null ts drops the row; null value counts but does not sum") {
    val ev = Seq(
      ("u", Some(H), Some(10.0)),
      ("u", Some(H), None),             // counted, not summed
      ("u", None, Some(99.0))           // not an observation
    ).toDF("k", "t", "v")
    val r = Features.decayedCounts(ev, "k", "t", "v", H).rows.head
    (r(1), r(3), r(4)) shouldBe ((2L, 2.0f, 10.0f))
  }

  test("targetEncodeLoo: excludes self; null target takes the group mean; singleton yields NULL") {
    val ev = Seq(
      (1L, "x", Some(1.0)), (2L, "x", Some(2.0)), (3L, "x", Some(3.0)),
      (4L, "x", None),       // contributed nothing → plain mean 2.0
      (5L, "y", Some(7.0))   // nothing left once excluded → NULL
    ).toDF("id", "k", "v")
    // the using-key join surfaces columns as (k, id, v, te)
    val out = Features.targetEncodeLoo(ev, "k", "v")
      .rows.map(r => r(1) -> r(3)).toMap
    out(1L) shouldBe 2.5f // (2+3)/2
    out(2L) shouldBe 2.0f
    out(3L) shouldBe 1.5f
    out(4L) shouldBe 2.0f // 6/3
    assert(out(5L) == null)
  }

  test("itemSims: cosine over binary user vectors, hand-checked") {
    // a in 3 users, b in 2, c in 1; co-touch (a,b)=2, (a,c)=1
    val ub = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "c")).toDF("u", "i")
    val out = Recommend.itemSims(ub, "u", "i", minUsers = 1L,
        minPairUsers = 1L)
      .orderBy("item_a", "item_b")
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4),
        r(5).asInstanceOf[Double]))
    out.map(t => (t._1, t._2, t._3, t._4, t._5)) shouldBe Seq(
      ("a", "b", 3L, 2L, 2L), ("a", "c", 3L, 1L, 1L))
    out.head._6 shouldBe (2.0 / math.sqrt(6.0) +- 1e-12)
    out(1)._6 shouldBe (1.0 / math.sqrt(3.0) +- 1e-12)
  }

  test("recommendTopN: unseen items ranked by summed similarity; seen items never recommended") {
    val ub = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "c")).toDF("u", "i")
    val out = Recommend.recommendTopN(ub, "u", "i", n = 2,
        minUsers = 1L, minPairUsers = 1L)
      .orderBy("u", "rank")
      .rows.map(r => (r.head, r(1), r(2).asInstanceOf[Float], r(3), r(4)))
    // u1/u2 own {a,b} → only c is recommendable (via a, sim 1/√3);
    // u3 owns {a,c} → only b (via a, sim 2/√6). Never a seen item.
    out shouldBe Seq(
      (1L, "c", (1.0 / math.sqrt(3.0)).toFloat, 1L, 1L),
      (2L, "c", (1.0 / math.sqrt(3.0)).toFloat, 1L, 1L),
      (3L, "b", (2.0 / math.sqrt(6.0)).toFloat, 1L, 1L))
  }

  test("recommendTopN: maxSimilarPerItem truncates weakest edges; truncationDropped accounts for them") {
    // u1{a,b} u2{a,b} u3{a,c} → n_a=3 n_b=2 n_c=1; pairs (a,b) n_ab=2
    // cos 2/√6 and (a,c) n_ab=1 cos 1/√3. Directional edges: a→b .816,
    // a→c .577, b→a .816, c→a .577. At M=1 item a keeps only a→b — the
    // a→c edge (u1/u2's only path to c) is cut, while u3's reco of b
    // rides the surviving a→b.
    val ub = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "c")).toDF("u", "i")
    val full = Recommend.recommendTopN(ub, "u", "i", n = 2,
        minUsers = 1L, minPairUsers = 1L)
      .orderBy("u", "rank").rows.map(r => (r.head, r(1)))
    val trunc = Recommend.recommendTopN(ub, "u", "i", n = 2,
        minUsers = 1L, minPairUsers = 1L, maxSimilarPerItem = Some(1))
      .orderBy("u", "rank").rows.map(r => (r.head, r(1)))
    full shouldBe Seq((1L, "c"), (2L, "c"), (3L, "b"))
    trunc shouldBe Seq((3L, "b"))
    // the observer sees exactly the dropped edge: a→c (cosine 1/√3);
    // b and c each have one edge — nothing to drop
    val sims = Recommend.itemSims(ub, "u", "i", 1L, 1L)
    val dropped = Recommend.truncationDropped(sims, 1)
      .rows.map(r => (r.head, r(2), r(3).toString.toDouble))
    dropped.size shouldBe 1
    dropped.head._1 shouldBe "a"
    dropped.head._2 shouldBe 1L
    dropped.head._3 shouldBe (1.0 / math.sqrt(3.0)) +- 1e-9
    // M large enough → identical to full, observer empty
    Recommend.recommendTopN(ub, "u", "i", n = 2, minUsers = 1L,
        minPairUsers = 1L, maxSimilarPerItem = Some(10))
      .orderBy("u", "rank").rows.map(r => (r.head, r(1))) shouldBe full
    Recommend.truncationDropped(sims, 10).count() shouldBe 0L
  }

  test("presenceAndSims + scoreTopN: the shared-prelude fold is " +
    "row-identical to recommendTopN on both the full and truncated paths") {
    val ub = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "c")).toDF("u", "i")
    val (pres, sims) = Recommend.presenceAndSims(ub, "u", "i",
      minUsers = 1L, minPairUsers = 1L)
    for (m <- Seq(None, Some(1), Some(10))) {
      val folded = Recommend.scoreTopN(pres, sims, "u", "i", n = 2,
        maxSimilarPerItem = m).orderBy("u", "rank").rows.map(_.toString)
      val direct = Recommend.recommendTopN(ub, "u", "i", n = 2,
        minUsers = 1L, minPairUsers = 1L, maxSimilarPerItem = m)
        .orderBy("u", "rank").rows.map(_.toString)
      folded shouldBe direct
    }
  }

  test("cohenKappa: hand-computed chance-corrected agreement; single-label case yields NULL") {
    val conf = Seq(("A", "A", 20L), ("A", "B", 5L), ("B", "A", 10L),
      ("B", "B", 15L)).toDF("gold", "pred", "n")
    // N=50, agree=35 → p_o=0.7; marginals 25/25 and 30/20 → p_e=0.5;
    // κ = (0.7−0.5)/(1−0.5) = 0.4
    val r = Similarity.cohenKappa(conf).rows.head
    (r.head, r(1), r(2), r(3)) shouldBe ((50L, 35L, 0.7f, 0.4f))
    val degenerate = Seq(("A", "A", 5L)).toDF("gold", "pred", "n")
    assert(Similarity.cohenKappa(degenerate).rows.head(3) == null)
  }

  test("centroidLabelConfusion: separable clusters land on the diagonal") {
    val vs = Seq(
      (1L, Seq(1.0f, 0.0f), "A"), (2L, Seq(1.0f, 0.1f), "A"),
      (3L, Seq(0.0f, 1.0f), "B"), (4L, Seq(0.1f, 1.0f), "B"),
      (5L, Seq(0.9f, 0.05f), "A")
    ).toDF("vec_id", "embedding", "label")
    val conf = Similarity.centroidLabelConfusion(vs, "vec_id",
        "embedding", "label")
      .orderBy("gold", "pred").rows.map(r => (r.head, r(1), r(2)))
    conf shouldBe Seq(("A", "A", 3L), ("B", "B", 2L))
    val k = Similarity.cohenKappa(
      Similarity.centroidLabelConfusion(vs, "vec_id", "embedding",
        "label")).rows.head
    (k(2), k(3)) shouldBe ((1.0f, 1.0f))
  }

  test("ebShrinkRates: shrinks toward the prior mean in proportion to n; " +
    "degenerate prior yields NULL posteriors") {
    // rates over minTrials keys: 0.2, 0.4, 0.2, 0.4 → m = 0.3,
    // v = 0.01; m(1−m)/v − 1 = 20 → α = 6, β = 14 (prior mean 0.3)
    val rows =
      Seq.fill(2)(("k1", 1)) ++ Seq.fill(8)(("k1", 0)) ++   // 2/10
      Seq.fill(4)(("k2", 1)) ++ Seq.fill(6)(("k2", 0)) ++   // 4/10
      Seq.fill(20)(("k3", 1)) ++ Seq.fill(80)(("k3", 0)) ++ // 20/100
      Seq.fill(40)(("k4", 1)) ++ Seq.fill(60)(("k4", 0)) ++ // 40/100
      Seq(("tiny", 1))                                      // 1/1, below minTrials
    val df = rows.toDF("k", "s")
    val out = Features.ebShrinkRates(df, "k", col("s") === 1, minTrials = 5)
      .orderBy(col("k"))
      .rows.map(r => r.head -> (r(3).asInstanceOf[Float],
        r(4).asInstanceOf[Float], r(6).asInstanceOf[Float])).toMap
    val (_, alpha, s1) = out("k1")
    alpha shouldBe 6.0f +- 1e-4f
    // k1: (2+6)/(10+20) = 0.2667; k3 same raw rate, more evidence →
    // stays closer to 0.2
    s1 shouldBe ((2.0 + 6.0) / 30.0).toFloat +- 1e-5f
    val (_, _, s3) = out("k3")
    s3 shouldBe ((20.0 + 6.0) / 120.0).toFloat +- 1e-5f
    math.abs(s3 - 0.2f) should be < math.abs(s1 - 0.2f)
    // the below-threshold key still gets shrunk (hard, n = 1)
    val (_, _, sTiny) = out("tiny")
    sTiny shouldBe ((1.0 + 6.0) / 21.0).toFloat +- 1e-5f
    // identical rates → zero variance → degenerate prior → NULL
    val flat = (Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("a", 0)) ++
      Seq.fill(5)(("b", 1)) ++ Seq.fill(5)(("b", 0))).toDF("k", "s")
    val deg = Features.ebShrinkRates(flat, "k", col("s") === 1)
      .select("alpha", "rate_shrunk").rows
    all(deg.map(_.head == null)) shouldBe true
    all(deg.map(_(1) == null)) shouldBe true
  }

  test("wilsonCi: hand-computed interval; never leaves [0,1] at the edges") {
    val df = (Seq.fill(8)(("g", "A", 1)) ++ Seq.fill(2)(("g", "A", 0)) ++
      Seq.fill(10)(("g", "B", 1))).toDF("grp", "variant", "s")
    val out = Experiment.wilsonCi(df, "grp", "variant", col("s") === 1)
      .orderBy(col("variant")).rows
    val a = out(0)
    // p̂ = 0.8, n = 10, z = 1.96: center = (0.8 + 0.19208)/1.38416,
    // half = 1.96·√(0.016 + 0.009604)/1.38416
    val zz = 1.96 * 1.96
    val center = (0.8 + zz / 20.0) / (1.0 + zz / 10.0)
    val half = 1.96 * math.sqrt(0.8 * 0.2 / 10.0 + zz / 400.0) / (1.0 + zz / 10.0)
    a(4).asInstanceOf[Float].toDouble shouldBe 0.8 +- 1e-6
    a(5).asInstanceOf[Float].toDouble shouldBe (center - half) +- 1e-6
    a(6).asInstanceOf[Float].toDouble shouldBe (center + half) +- 1e-6
    // p̂ = 1 arm: Wald would give [1, 1]; Wilson stays strictly inside
    val b = out(1)
    b(4) shouldBe 1.0f
    b(5).asInstanceOf[Float] should be < 1.0f
    b(5).asInstanceOf[Float] should be > 0.0f
    b(6).asInstanceOf[Float] should be <= 1.0f
  }

  test("wilsonCi: NULL success carries no evidence — excluded from n, " +
    "not silently counted as failure") {
    val df = (Seq.fill(8)(("g", "A", Some(1))) ++
      Seq.fill(2)(("g", "A", Some(0))) ++
      Seq.fill(5)(("g", "A", None))).toDF("grp", "variant", "s")
    val r = Experiment.wilsonCi(df, "grp", "variant",
      when(col("s").isNotNull, col("s") === 1)).rows.head
    r(2) shouldBe 10L // n excludes the 5 NULL rows
    r(3) shouldBe 8L
    r(4) shouldBe 0.8f
  }
}
