package graft.ops

import graft.SparkSpec

/** Pins the round-18 wave-2 rebalance sites: operators whose
  * compute-dense pre-shuffle stage consumes a raw scan must route that
  * stage through [[Skew.spread]], so a one-split corpus (the LofTime
  * finding: 780 KB of embeddings = ONE file split = the whole n² cosine
  * product in ONE task) parallelizes to the cluster width. The pin is
  * structural — a RoundRobinPartitioning exchange in the pre-execution
  * plan of each operator over a deliberately single-split parquet scan —
  * because the result rows are partitioning-invariant by the repo's
  * standing exactness contracts (verified separately by each operator's
  * own spec + the DuckDB oracles).
  */
class SpreadSitesSpec extends SparkSpec {
  import spark.implicits._

  private def oneSplitParquet(write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_site")
      .toString
    write(dir)
    dir
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("queryProductJoin broadcast branch spreads a one-split candidate " +
      "scan when the query side is fat, and leaves it alone when thin") {
    val dir = oneSplitParquet { d =>
      (0L until Similarity.SpreadMinQueries + 8).map(i =>
          (i, Array.fill(4)(i.toDouble + 1)))
        .toDF("vec_id", "embedding").coalesce(1).write.mode("overwrite").parquet(d)
    }
    val emb = spark.read.parquet(dir)
    // fat query side (all-pairs, the LOF/audit shape): rebalanced
    val fat = planOf(Similarity.bruteForceTopK(
      emb, emb, id = "vec_id", vec = "embedding", k = 3))
    assert(fat.contains("RoundRobinPartitioning"),
      s"expected the candidate side rebalanced, plan:\n$fat")
    // thin query side (probe top-k): per-candidate work is |Q| kernel
    // evals — too little to repay the exchange, measured at sf0.1
    val thin = planOf(Similarity.bruteForceTopK(
      emb.filter($"vec_id" < 4), emb, id = "vec_id", vec = "embedding", k = 3))
    assert(!thin.contains("RoundRobinPartitioning"),
      s"expected NO rebalance under ${Similarity.SpreadMinQueries} queries, plan:\n$thin")
  }

  test("Pca.covariance spreads a one-split vector scan") {
    val dir = oneSplitParquet { d =>
      (0L until 64L).map(i => (i, Array.fill(4)(i.toDouble)))
        .toDF("vec_id", "embedding").coalesce(1).write.mode("overwrite").parquet(d)
    }
    val plan = planOf(Pca.covariance(spark.read.parquet(dir), "embedding"))
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected the cell-explode input rebalanced, plan:\n$plan")
  }

  test("bootstrapMeanDiffCi spreads a one-split events scan") {
    val dir = oneSplitParquet { d =>
      (0L until 128L).map(i =>
          (i, "m", if (i % 2 == 0) "A" else "B", (i % 7).toDouble))
        .toDF("id", "metric", "variant", "value")
        .coalesce(1).write.mode("overwrite").parquet(d)
    }
    val plan = planOf(Experiment.bootstrapMeanDiffCi(
      spark.read.parquet(dir), group = "metric", variant = "variant",
      value = "value", id = "id", replicas = 8))
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected the replica-explode input rebalanced, plan:\n$plan")
  }
}
