package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Pca

/** One-off diagnostic main: times the three stages of the PCA tier
  * (covariance pass, eigensolver collect+iterations, projection)
  * separately — the bisection tool behind the round-9 covariance
  * optimization (struct-field trim, per-dimension sums, pico-integer
  * quantization: 13 s → 3 s at sf0.1). Kept for reproducibility of
  * BENCH_NOTES findings, like [[StageTime]].
  */
object PcaTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("pca-time")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pca] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    (1 to 2).foreach { _ =>
      val cov = Pca.covariance(emb, "embedding")
      t("cov.count")(cov.count())
      val comp = t("topComponent(collect+iters)")(Pca.topComponent(cov, 64, 6))
      t("project.count")(Pca.project(emb, "vec_id", "embedding", comp).count())
    }
    spark.stop()
  }
}
