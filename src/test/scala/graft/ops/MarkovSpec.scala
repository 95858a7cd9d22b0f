package graft.ops

import graft.SparkSpec

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  test("stationary: converges to the analytic fixed point of a 2-state chain") {
    // P = [[0,1],[.5,.5]] → π = (1/3, 2/3); second eigenvalue −0.5, so
    // 8 power rounds land within ~0.5^8 of the fixed point
    val tr = Seq(("a", "b", 10L), ("b", "a", 5L), ("b", "b", 5L))
      .toDF("cur", "nxt", "n")
    val out = Markov.stationary(tr, "cur", "nxt", "n", iters = 8)
      .orderBy("state").rows.map(r => (r.head, r(1).asInstanceOf[Float]))
    out.map(_._1) shouldBe Seq("a", "b")
    out(0)._2.toDouble shouldBe (1.0 / 3.0 +- 0.01)
    out(1)._2.toDouble shouldBe (2.0 / 3.0 +- 0.01)
    out.map(_._2.toDouble).sum shouldBe (1.0 +- 1e-6)
  }

  test("stationary: a doubly-stochastic chain is uniform after round 1") {
    // symmetric 2-cycle: uniform is exactly stationary from the start
    val tr = Seq(("x", "y", 7L), ("y", "x", 7L)).toDF("cur", "nxt", "n")
    Markov.stationary(tr, "cur", "nxt", "n", iters = 3)
      .rows.map(_(1)).toSet shouldBe Set(0.5f)
  }

  test("stationary: sink states fail loudly instead of leaking mass") {
    val tr = Seq(("a", "b", 1L)).toDF("cur", "nxt", "n") // b never current
    an[IllegalArgumentException] should be thrownBy
      Markov.stationary(tr, "cur", "nxt", "n")
  }
}
