package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge frames. Companion to the
  * connected-components family in [[Dedup]] (duplicateClusters /
  * duplicateClustersStar); here the fixed-iteration-count algorithms
  * whose arithmetic can be replayed by the DuckDB oracle the same way
  * the [[Pca]] eigensolver is.
  *
  * Scale shape: each PageRank iteration is one (rank ⋈ edges) shuffle
  * on src plus one inflow aggregation on dst — the standard Pregel
  * contraction expressed as joins, no driver-side adjacency. The node
  * frame and out-degrees compute once; iterations localCheckpoint so
  * the plan never deepens.
  */
object Graph {

  private val d30 = (c: Column) => c.cast("decimal(30,12)")

  /** PageRank with damping over a directed edge list. Exact replay
    * contract (the [[Pca]] pattern): rank₀ = 1/n; per iteration
    * rank'(v) = (1−d)/n + d·(Σ_{u→v} q(rank(u)/outdeg(u)) + dm/n)
    * where q quantizes each contribution to DECIMAL(30,12) (sums become
    * order-independent and engine-identical) and dm is the quantized
    * rank mass of dangling nodes (no out-edges), redistributed
    * uniformly — drop it and the ranks leak mass every round. Duplicate
    * edges collapse (a multigraph would double-count contributions);
    * every remaining op is IEEE-exact division/multiply/add. */
  def pageRank(edges: DataFrame, src: String = "src", dst: String = "dst",
               damping: Double = 0.85, iters: Int = 8,
               shufflePartitions: Option[Int] = None): DataFrame = {
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"need at least one iteration, got $iters")
    // iteration frames are |nodes|/|edges|-sized and materialize HERE
    // (localCheckpoint is eager), so the caller can size reducers to
    // the graph instead of paying iters × session-default scheduling
    // overhead; the session setting is restored before returning. A
    // real deployment sizes this to edge volume.
    val spark = edges.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    shufflePartitions.foreach(p => spark.conf.set(key, p.toString))
    try pageRankImpl(edges, src, dst, damping, iters)
    finally spark.conf.set(key, prev)
  }

  private def pageRankImpl(edges: DataFrame, src: String, dst: String,
                           damping: Double, iters: Int): DataFrame = {
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    // left join: dangling nodes (in-edges only) carry a null outdeg
    val nd = nodes.join(outdeg, Seq("id"), "left").localCheckpoint()
    val n = nd.count()
    val r0 = nd.withColumn("pr", lit(1.0) / lit(n))
    val rFinal = (1 to iters).foldLeft(r0) { (rk, _) =>
      val dm = rk.filter(col("outdeg").isNull)
        .agg(coalesce(sum(d30(col("pr"))), lit(0).cast("decimal(30,12)"))
          .cast("double").as("dm"))
      val contrib = rk.filter(col("outdeg").isNotNull)
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
      val inflow = contrib.groupBy(col("id"))
        .agg(sum(d30(col("c"))).cast("double").as("inflow"))
      nd.join(inflow, Seq("id"), "left").crossJoin(broadcast(dm))
        .select(col("id"), col("outdeg"),
          (lit(1 - damping) / lit(n) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + col("dm") / lit(n))).as("pr"))
        .localCheckpoint()
    }
    rFinal.select(col("id"), col("pr"))
  }
}
