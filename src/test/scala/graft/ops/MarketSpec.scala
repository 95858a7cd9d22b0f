package graft.ops

import graft.SparkSpec

class MarketSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    // 4 baskets: {a,b}, {a,b,c}, {a,c}, {b} — with a repeat row that
    // the presence-distinct must fold
    (1L, "a"), (1L, "b"), (1L, "b"),
    (2L, "a"), (2L, "b"), (2L, "c"),
    (3L, "a"), (3L, "c"),
    (4L, "b")
  ).toDF("basket", "item")

  test("pairRules: counts, support, confidence and lift by hand") {
    val out = Market.pairRules(baskets, "basket", "item",
        minSupport = 1L, minPairSupport = 1L)
      .orderBy("item_a", "item_b")
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4), r(5), r(6), r(7), r(8)))
    // n_a=3 (a in 1,2,3), n_b=3, n_c=2, n_baskets=4
    out shouldBe Seq(
      ("a", "b", 3L, 3L, 2L, 0.5f, 2f / 3f, 2f / 3f, (2.0 * 4 / 9).toFloat),
      ("a", "c", 3L, 2L, 2L, 0.5f, 2f / 3f, 1.0f, (2.0 * 4 / 6).toFloat),
      ("b", "c", 3L, 2L, 1L, 0.25f, 1f / 3f, 0.5f, (1.0 * 4 / 6).toFloat))
  }

  test("pairRules: Apriori support prune removes rare items before pairing") {
    // c appears in 2 baskets; minSupport=3 removes it, so only (a, b)
    // survives — and pair support prune can then remove that too
    val out = Market.pairRules(baskets, "basket", "item",
        minSupport = 3L, minPairSupport = 1L)
      .rows.map(r => (r.head, r(1), r(4)))
    out shouldBe Seq(("a", "b", 2L))
    Market.pairRules(baskets, "basket", "item",
      minSupport = 3L, minPairSupport = 3L).count() shouldBe 0L
  }

  test("pairRules: mega-basket cap excludes the basket from pairing; observer reports it") {
    val mega = (Seq.tabulate(5)(i => (9L, s"i$i")) ++
      Seq((1L, "i0"), (1L, "i1"), (2L, "i0"), (2L, "i1"))).toDF("basket", "item")
    // cap 4 < the mega-basket's 5 frequent items → only baskets 1,2 pair
    val out = Market.pairRules(mega, "basket", "item",
        minSupport = 1L, minPairSupport = 1L, maxBasketItems = 4)
      .rows.map(r => (r.head, r(1), r(4)))
    out shouldBe Seq(("i0", "i1", 2L))
    val dropped = Market.oversizeBaskets(mega, "basket", "item",
        minSupport = 1L, maxBasketItems = 4)
      .rows.map(r => (r.head, r(1)))
    dropped shouldBe Seq((9L, 5L))
    // denominators stay measured on the FULL input: n_i0 counts basket 9
    val full = Market.pairRules(mega, "basket", "item",
        minSupport = 1L, minPairSupport = 1L, maxBasketItems = 4)
      .rows.map(r => (r.head, r(2))).toMap
    full("i0") shouldBe 3L
  }

  test("tripleRules: hand-computed triple with its three confidences and lift") {
    // x in 5 baskets, y in 4, z in 4, w in 1 (pruned at minSupport 2);
    // pairs xy/xz/yz each in 3 baskets; {x,y,z} together in baskets 1,2
    // → support 2/6, each conf({·,·}→·) = 2/3, lift = 2·36/(5·4·4) = 0.9
    val b = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "y"),
      (4L, "x"), (4L, "z"),
      (5L, "y"), (5L, "z"),
      (6L, "x"), (6L, "w")).toDF("basket", "item")
    val out = Market.tripleRules(b, "basket", "item",
        minSupport = 2L, minPairSupport = 2L, minTripleSupport = 2L)
      .rows.map(_.toSeq)
    out.size shouldBe 1
    val r = out.head
    (r.head, r(1), r(2)) shouldBe (("x", "y", "z"))
    (r(3), r(4), r(5), r(6)) shouldBe ((3L, 3L, 3L, 2L))
    r(7) shouldBe (2.0 / 6.0).toFloat // support
    Seq(r(8), r(9), r(10)).foreach(_ shouldBe (2.0 / 3.0).toFloat)
    r(11) shouldBe 0.9f // lift
    // a triple below minTripleSupport drops even when its pairs survive
    Market.tripleRules(b, "basket", "item",
      minSupport = 2L, minPairSupport = 2L, minTripleSupport = 3L)
      .count() shouldBe 0L
    // monotonicity precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      Market.tripleRules(b, "basket", "item",
        minSupport = 2L, minPairSupport = 3L, minTripleSupport = 2L)
    }.getMessage should include("monotonicity")
  }
}
