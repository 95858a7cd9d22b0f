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

  /** Per-node triangle counts over an undirected graph given as a
    * (possibly directed, possibly multi-) edge list. Output: (id,
    * n_triangles) for nodes in ≥1 triangle.
    *
    * The scale-critical trick is DEGREE ORIENTATION (the node-iterator
    * bound): collapse to unique undirected edges, then orient every
    * edge from its lower-(degree, id) endpoint to the higher. The
    * oriented out-degree is O(√m), so the wedge join (e1.t = e2.f)
    * generates Σ outdeg² = O(m^1.5) candidates worst-case — the
    * textbook bound — instead of Σ deg² which a hub node makes
    * quadratic. Closing wedges is one more join against the oriented
    * edge set; each triangle materializes exactly once (its
    * orientation is a unique DAG path a→b→c plus the chord a→c).
    * Plan: three shuffles on node keys, no window, no driver state. */
  def triangles(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val und = edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .distinct()
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // total order (deg, id) makes the orientation a DAG
    val o = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("f"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"))
      // referenced three times (both wedge sides + the closing chord):
      // materialize once instead of leaning on runtime exchange reuse
      .localCheckpoint()
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.t") === col("e2.f"))
      .select(col("e1.f").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
      .join(o.as("e3"), col("a") === col("e3.f") && col("c") === col("e3.t"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Minimum hop distance from a seed set, bounded at `k` hops — BFS
    * as k rounds of frontier expansion. Output: (id, hops) for every
    * node within k directed hops of a seed (seeds themselves at 0).
    *
    * Each round shuffles only the FRONTIER (nodes first reached last
    * round) against the edge list and anti-joins the visited set —
    * never all paths (the recursive-CTE oracle dedups per level for
    * the same reason). Frames localCheckpoint per round so the plan
    * stays k-independent; visited is bounded by |nodes|. */
  def kHopMinHops(edges: DataFrame, seeds: DataFrame, src: String = "src",
                  dst: String = "dst", k: Int = 3): DataFrame = {
    require(k >= 1, s"need at least one hop, got $k")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val s0 = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint()
    val (visited, _) = (1 to k).foldLeft((s0, s0)) { case ((vis, frontier), i) =>
      val next = frontier.join(e, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(vis, Seq("id"), "left_anti")
        .withColumn("hops", lit(i)).localCheckpoint()
      (vis.union(next).localCheckpoint(), next)
    }
    visited
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
