package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — covariance, a power-iteration
  * eigensolver, and projection — engineered so even the EIGENSOLVER is
  * engine-replayable (the DuckDB oracle reruns the same iterations and
  * matches bit-for-bit after the float downcast).
  *
  * Scale shape: the covariance pass is the only corpus-sized work — a
  * per-row d(d+1)/2 product expansion with map-side partial aggregation,
  * so the shuffle carries d² cells per partition, never the corpus. The
  * iteration then runs on the d×d cell frame (tiny), and the projection
  * is one broadcast join back onto the corpus. d is bounded by the
  * d(d+1)/2-per-row expansion — embedding dims (64–4096) are fine.
  *
  * Exactness: every sum quantizes its double terms to DECIMAL(30,12)
  * first (order-independent, cross-engine identical — the repo's
  * ln-quantization pattern); the remaining scalar ops are +,−,×,÷,sqrt,
  * all IEEE-exact. Power iteration from the deterministic start e₁ with
  * a FIXED iteration count: both engines run the identical arithmetic,
  * so the oracle equality holds regardless of how converged the vector
  * is at that budget (convergence quality is pinned separately by spec
  * against a known matrix).
  */
object Pca {

  private val d30 = (c: Column) => c.cast("decimal(30,12)")

  /** Upper-triangle sample covariance cells (i, j, cov) of the vector
    * column, 0-based indices, i ≤ j:
    * cov = (S_ij − (S_i·S_j)/n) / (n−1) over quantized product sums.
    * Rows with a null vector are excluded; ragged vectors fail the
    * pairing arithmetic loudly rather than silently truncating. */
  def covariance(df: DataFrame, vec: String): DataFrame = {
    val v = df.filter(col(vec).isNotNull)
      .select(transform(col(vec), x => x.cast("double")).as("e"))
    val pairs = v.select(posexplode(flatten(
      transform(col("e"), (xi, i) =>
        transform(slice(col("e"), i + lit(1), size(col("e")) - i), (xj, jj) =>
          struct(i.as("i"), (i + jj).as("j"), (xi * xj).as("p"),
            xi.as("xi"), xj.as("xj")))))).as(Seq("__pos", "c")))
      .select(col("c.i"), col("c.j"), col("c.p"), col("c.xi"), col("c.xj"))
    val sums = pairs.groupBy(col("i"), col("j"))
      .agg(sum(d30(col("p"))).cast("double").as("s_ij"),
        sum(d30(col("xi"))).cast("double").as("s_i"),
        sum(d30(col("xj"))).cast("double").as("s_j"),
        count(lit(1)).as("n"))
    sums.select(col("i"), col("j"),
      ((col("s_ij") - (col("s_i") * col("s_j")) / col("n")) /
        (col("n") - lit(1))).as("cov"))
  }

  /** Dominant eigenvector of the covariance as a (i, val) frame via
    * `iters` power iterations from e₁ — each iteration one mat-vec
    * (join + quantized-sum) over the d² cell frame plus an L2
    * normalization, localCheckpointed so the plan stays flat. */
  def topComponent(cov: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = cov.sparkSession
    import spark.implicits._
    // mirror the upper triangle so the mat-vec sees the full matrix
    val full = cov.unionByName(
      cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov"))).localCheckpoint()
    val v0 = (0 until dim).map(i => (i, if (i == 0) 1.0 else 0.0))
      .toDF("i", "val")
    (1 to iters).foldLeft(v0) { (vk, _) =>
      val mv = full.join(vk.select(col("i").as("j"), col("val")), "j")
        .groupBy(col("i"))
        .agg(sum(d30(col("cov") * col("val"))).cast("double").as("mv"))
      val norm = mv.agg(
        sqrt(sum(d30(col("mv") * col("mv"))).cast("double")).as("nrm"))
      mv.crossJoin(broadcast(norm))
        .select(col("i"), (col("mv") / col("nrm")).as("val"))
        .localCheckpoint()
    }
  }

  /** Project every vector onto a component frame (i, val): one
    * broadcast join of the d-row component onto the exploded corpus,
    * quantized-sum back per id. */
  def project(df: DataFrame, id: String, vec: String,
              component: DataFrame): DataFrame =
    df.filter(col(vec).isNotNull)
      .select(col(id), posexplode(col(vec)).as(Seq("i", "x")))
      .join(broadcast(component), "i")
      .groupBy(col(id))
      .agg(sum(d30(col("x").cast("double") * col("val"))).cast("double")
        .as("pc1"))
}
