package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Graph

/** Scale decades for the graph tier over SYNTHETIC graphs.
  *
  * ScaleSmoke's replicated-documents lake cannot scale the co-occurrence
  * graph (replication multiplies shingle dfs out of the 2–4 rare band, so
  * the graph shrinks with copies). This tool instead generates hash-
  * random directed graphs with a true edge-count axis — n nodes, d
  * out-edges per node, endpoints from xxhash64 (deterministic, seeded) —
  * and times triangles / kHop / pageRank at ×1/×10/×30 edges.
  *
  * Expectation to pin in BENCH_NOTES: triangle wall grows near-linearly
  * in edges at fixed degree (wedge count = Σ outdeg² stays ∝ m when d is
  * constant); BFS and PageRank are linear-in-edges per round by
  * construction.
  *
  * Usage: runMain graft.tools.GraphTime [baseNodes] [degree] [multsCsv]
  */
object GraphTime {
  def main(args: Array[String]): Unit = {
    val baseNodes = args.lift(0).map(_.toInt).getOrElse(20000)
    val degree = args.lift(1).map(_.toInt).getOrElse(8)
    val mults = args.lift(2).map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(1, 10, 30))
    val spark = GraftSession.local("graph-time")
    spark.sparkContext.setLogLevel("ERROR")

    def edges(nodes: Int) = spark.range(0, nodes.toLong * degree)
      .select((col("id") % nodes).as("src"),
        pmod(xxhash64(col("id"), lit("gt-dst")), lit(nodes.toLong)).as("dst"))

    def time3(keep: Set[Int])(fn: () => Long): (String, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); rows = fn()
        val sec = (System.nanoTime() - t0) / 1e9
        // the graph ops localCheckpoint their iteration frames and the
        // caller cannot unpersist them — left alone, three timed runs ×
        // three decades accumulate GBs of checkpointed blocks and the
        // later measurements time eviction churn, not the operator.
        // Drop everything except the shared edge frames between runs.
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(r => keep.contains(r.id)).foreach(_.unpersist(blocking = true))
        sec
      }.sorted
      def r2(v: Double) = math.round(v * 100) / 100.0
      (s"[${r2(ts(1))},${r2(ts(0))},${r2(ts(2))}]", rows) // [median,min,max]
    }

    mults.foreach { mult =>
      val n = baseNodes * mult
      val e = edges(n).localCheckpoint()
      val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val (tTri, rTri) = time3(keep)(() => Graph.triangles(e).count())
      val seeds = spark.range(0, 16).select(col("id"))
      val (tHop, rHop) = time3(keep)(() => Graph.kHopMinHops(e, seeds, k = 3).count())
      val (tPr, rPr) = time3(keep)(() =>
        Graph.pageRank(e, iters = 4, shufflePartitions = Some(32)).count())
      println(s"""{"metric":"graph_decade","mult":$mult,"nodes":$n,""" +
        s""""edges":${n.toLong * degree},"triangles_sec":$tTri,""" +
        s""""triangle_nodes":$rTri,"khop_sec":$tHop,"khop_reached":$rHop,""" +
        s""""pagerank_sec":$tPr,"pagerank_nodes":$rPr}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true)) // drop this decade's edges too
    }
    spark.stop()
  }
}
