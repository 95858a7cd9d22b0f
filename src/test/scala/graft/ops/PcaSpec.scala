package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // rank-1 data along a = (0.6, 0.8): rows k·a for k ∈ {-2,-1,1,2}
  private val rank1 = Seq(-2f, -1f, 1f, 2f)
    .map(k => (k.toLong, Array(0.6f * k, 0.8f * k)))
    .toDF("vec_id", "embedding")

  test("covariance: hand-computed cells of rank-1 data (cov = var(k)·aaᵀ, var = 10/3)") {
    val cells = Pca.covariance(rank1, "embedding")
      .orderBy("i", "j").rows.map(r =>
        ((r(0).asInstanceOf[Int], r(1).asInstanceOf[Int]),
          r(2).asInstanceOf[Double])).toMap
    val v = 10.0 / 3.0
    cells((0, 0)) shouldBe (v * 0.36) +- 1e-6
    cells((0, 1)) shouldBe (v * 0.48) +- 1e-6
    cells((1, 1)) shouldBe (v * 0.64) +- 1e-6
    cells.keySet shouldBe Set((0, 0), (0, 1), (1, 1)) // upper triangle only
  }

  test("topComponent converges to the dominant axis; projection recovers the coefficient") {
    // dominant axis a = (0.6, 0.8), minor axis b = (0.8, -0.6) at 1/10
    // the spread: λ2/λ1 = 0.01, so 6 iterations close the gap to ~1e-12
    val data = (for {
      k <- Seq(-2f, -1f, 1f, 2f); j <- Seq(-0.2f, 0.2f)
    } yield (k, j)).zipWithIndex.map { case ((k, j), idx) =>
      (idx.toLong, Array(0.6f * k + 0.8f * j, 0.8f * k - 0.6f * j))
    }.toDF("vec_id", "embedding")
    val comp = Pca.topComponent(Pca.covariance(data, "embedding"),
      dim = 2, iters = 6)
    val vmap = comp.rows.map(r =>
      r(0).asInstanceOf[Int] -> r(1).asInstanceOf[Double]).toMap
    // sign is deterministic (start e₁, a₁ > 0 → converges to +a)
    vmap(0) shouldBe 0.6 +- 1e-6
    vmap(1) shouldBe 0.8 +- 1e-6
    val proj = Pca.project(data, "vec_id", "embedding", comp)
    val byId = proj.rows.map(r =>
      r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Double]).toMap
    // row idx 0 is (k=-2, j=-0.2): pc1 = k (the minor axis is ⊥ a)
    byId(0L) shouldBe -2.0 +- 1e-5
    byId(7L) shouldBe 2.0 +- 1e-5
  }

  test("null vectors are excluded from covariance and projection") {
    val withNull = rank1.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    Pca.covariance(withNull, "embedding").count() shouldBe 3L
    val comp = Pca.topComponent(Pca.covariance(withNull, "embedding"),
      dim = 2, iters = 3)
    Pca.project(withNull, "vec_id", "embedding", comp)
      .filter(col("vec_id") === 99L).count() shouldBe 0L
  }
}
