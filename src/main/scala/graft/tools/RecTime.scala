package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}
import graft.ops.{Market, Recommend}

/** One-off diagnostic main: interleaved A/B of the CF prelude — the
  * round-18 wave-2 candidate. Variant A (the r17 shape) checkpoints the
  * presence frame and then feeds it back through [[Recommend.itemSims]],
  * whose [[Market.frequentPresence]] re-runs distinct+localCheckpoint on
  * a frame that is already the materialized distinct — one identity
  * shuffle plus one job barrier. Variant B ([[Recommend.presenceAndSims]]
  * after the fold) consumes the checkpointed presence as-is via
  * frequentPresenceOn. Reps alternate A,B,A,B in ONE JVM so JIT warmth,
  * page cache and box state cancel — the two solo bench runs this
  * replaced disagreed by more than the effect size on code-identical
  * queries.
  *
  * Usage: runMain graft.tools.RecTime [sfDir] [reps]
  */
object RecTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("rec-time")
    spark.sparkContext.setLogLevel("ERROR")
    // warm the scan/codegen paths once (untimed)
    SparkEntry.queries("rec_item_sims")(spark, sfDir).count()

    // the custBrand frame the rec_* queries score — same derivation as
    // the query registry (AnalyticsQueries.custBrand)
    def custBrand() =
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey").as("user_id"), col("p_brand").as("brand"))

    def variantA(m: Option[Int]): Long = {
      val pres = Market.presence(custBrand(), "user_id", "brand").localCheckpoint()
      val sims = Recommend.itemSims(pres, "__basket", "__item", 50L, 20L, 10000)
        .localCheckpoint()
      Recommend.scoreTopN(pres, sims, "user_id", "brand", n = 3,
        maxSimilarPerItem = m).count()
    }
    def variantB(m: Option[Int]): Long = {
      val (pres, sims) = Recommend.presenceAndSims(custBrand(), "user_id",
        "brand", 50L, 20L)
      Recommend.scoreTopN(pres, sims, "user_id", "brand", n = 3,
        maxSimilarPerItem = m).count()
    }
    def drop(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    Seq(None -> "full", Some(10) -> "trunc").foreach { case (m, tag) =>
      val (as, bs) = (collection.mutable.ArrayBuffer[Double](),
        collection.mutable.ArrayBuffer[Double]())
      (1 to reps).foreach { i =>
        var t0 = System.nanoTime(); val ra = variantA(m)
        as += (System.nanoTime() - t0) / 1e9; drop()
        t0 = System.nanoTime(); val rb = variantB(m)
        bs += (System.nanoTime() - t0) / 1e9; drop()
        require(ra == rb, s"row-count drift A=$ra B=$rb")
        println(f"[rec] $tag rep$i A=${as.last}%.3f B=${bs.last}%.3f rows=$ra")
      }
      def stats(xs: Seq[Double]) =
        f"med=${xs.sorted.apply(xs.size / 2)}%.3f min=${xs.min}%.3f"
      println(s"[rec] $tag A(old re-distinct) ${stats(as.toSeq)}  " +
        s"B(folded) ${stats(bs.toSeq)}")
    }
    spark.stop()
  }
}
