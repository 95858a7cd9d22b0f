package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.{Dedup, TextAnalysis}

/** One-off diagnostic main: interleaved A/B/C of the co-occurrence edge
  * derivation ([[graft.queries.TextQueries.coocEdges]]) — the round-19
  * candidate. The shingle frame `sh` (tokenize + 3-shingle explode +
  * distinct) feeds THREE consumers (the rare-gram groupBy and both sides
  * of the rt self-join), and each scan re-runs the whole explode chain
  * from the documents scan. Variants:
  *
  *  A  status quo — sh lazy, rt lazy (the r18 shape)
  *  B  sh localCheckpointed (explode chain runs once; rare + self-join
  *     read the cut)
  *  C  sh AND rt checkpointed (the self-join reads a rare-filtered cut
  *     twice instead of re-joining sh with rare per side)
  *
  * Reps interleave A,B,C in ONE JVM so JIT warmth, page cache and box
  * state cancel (the RecTime lesson). Row counts asserted identical.
  *
  * Usage: runMain graft.tools.EdgeTime [sfDir] [reps]
  */
object EdgeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("edge-time")
    spark.sparkContext.setLogLevel("ERROR")

    def shRaw(): DataFrame =
      graft.ops.Skew.spread(Tables.documents(spark, sfDir))
        .select(col("doc_id"),
          explode(Dedup.shingles(TextAnalysis.tokens(col("text")), 3)).as("gram"))
        .distinct()

    def closeFrom(sh: DataFrame, cutRt: Boolean): DataFrame = {
      val rare = sh.groupBy(col("gram")).agg(count(lit(1)).as("c"))
        .filter(col("c").between(2, 4)).select(col("gram"))
      val rt0 = sh.join(rare, "gram")
      val rt = if (cutRt) rt0.localCheckpoint() else rt0
      rt.as("a").join(rt.as("b"), "gram")
        .filter(col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A(lazy)" -> (() => closeFrom(shRaw(), cutRt = false)),
      "B(sh cut)" -> (() => closeFrom(shRaw().localCheckpoint(), cutRt = false)),
      "C(sh+rt cut)" -> (() => closeFrom(shRaw().localCheckpoint(), cutRt = true)))

    // warm scan/codegen paths once, untimed
    noop(variants.head._2())

    val times = variants.map(_ => collection.mutable.ArrayBuffer[Double]())
    var rowsRef = -1L
    (1 to reps).foreach { i =>
      variants.zipWithIndex.foreach { case ((tag, mk), vi) =>
        val t0 = System.nanoTime()
        val df = mk()
        noop(df)
        times(vi) += (System.nanoTime() - t0) / 1e9
        val rows = df.count() // cheap: post-noop the cut frames are warm
        if (rowsRef < 0) rowsRef = rows
        require(rows == rowsRef, s"row drift $tag: $rows vs $rowsRef")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        println(f"[edge] rep$i $tag ${times(vi).last}%.3f s rows=$rows")
      }
    }
    def stats(xs: Seq[Double]) =
      f"med=${xs.sorted.apply(xs.size / 2)}%.3f min=${xs.min}%.3f"
    variants.zipWithIndex.foreach { case ((tag, _), vi) =>
      println(s"[edge] $tag ${stats(times(vi).toSeq)}")
    }

    // phase 2 — the graph_edges_append shape: the edge frame is consumed
    // TWICE (base filter + delta filter). A2 = re-derive per consumer
    // (from the sh cut), B2 = cut the tiny final edge frame once
    val (a2, b2) = (collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double]())
    (1 to reps).foreach { i =>
      var t0 = System.nanoTime()
      val allA = closeFrom(shRaw().localCheckpoint(), cutRt = false)
      noop(allA.filter(col("src") <= 450 && col("dst") <= 450))
      noop(allA.filter(col("src") > 450 || col("dst") > 450))
      a2 += (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      t0 = System.nanoTime()
      val allB = closeFrom(shRaw().localCheckpoint(), cutRt = false)
        .localCheckpoint()
      noop(allB.filter(col("src") <= 450 && col("dst") <= 450))
      noop(allB.filter(col("src") > 450 || col("dst") > 450))
      b2 += (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      println(f"[edge] append rep$i A2(rederive)=${a2.last}%.3f " +
        f"B2(edge cut)=${b2.last}%.3f")
    }
    println(s"[edge] append A2 ${stats(a2.toSeq)}  B2 ${stats(b2.toSeq)}")
    spark.stop()
  }
}
