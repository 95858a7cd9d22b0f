package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 8) =
    Graph.pageRank(edges.toDF("src", "dst"), iters = iters)
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Double])
      .toMap

  test("two-node cycle is the fixed point: both ranks stay 1/2, mass conserved") {
    val pr = ranks(Seq((1L, 2L), (2L, 1L)))
    pr(1L) shouldBe 0.5 +- 1e-12
    pr(2L) shouldBe 0.5 +- 1e-12
  }

  test("dangling node: mass redistributes, one hand-computed iteration") {
    // a→b, b dangling; after 1 iter: dm = 0.5,
    // pr(a) = 0.15/2 + 0.85·(0 + 0.25)   = 0.2875
    // pr(b) = 0.15/2 + 0.85·(0.5 + 0.25) = 0.7125
    val pr = ranks(Seq((1L, 2L)), iters = 1)
    pr(1L) shouldBe 0.2875 +- 1e-9
    pr(2L) shouldBe 0.7125 +- 1e-9
    (pr(1L) + pr(2L)) shouldBe 1.0 +- 1e-9 // no mass leak
  }

  test("star centrality ordering; duplicate edges collapse") {
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L))
    val pr = ranks(star)
    // 1 receives the hub's ENTIRE out-mass each round, the hub only
    // collects the (small-rank) spokes — so 1 > hub > leaf spokes
    pr(1L) should be > pr(9L)
    pr(9L) should be > pr(2L)
    pr(2L) shouldBe pr(3L) +- 1e-12
    ranks(star ++ star) shouldBe pr // multigraph input, same result
    pr.values.sum shouldBe 1.0 +- 1e-9
  }
}
