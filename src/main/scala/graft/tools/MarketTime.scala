package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.{Market, Recommend}

/** One-off diagnostic behind the r18 Apriori fold: times the three
  * Market/Recommend chain queries with 5 repetitions and reports
  * median AND min — the min is the engine reading on a box whose
  * disk/cpu contention inflates single runs ±2× (the r17 bench_min
  * lesson). Compare across commits at the min. */
object MarketTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("market-time")
    spark.sparkContext.setLogLevel("ERROR")
    def baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("brand"))
    def custBrand = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("user_id"), col("p_brand").as("brand"))
    def timed(tag: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val sorted = ts.map(_._1).sorted
      println(f"[market] $tag rows=${ts.head._2} med=${sorted(2)}%.3fs " +
        f"min=${sorted.head}%.3fs max=${sorted.last}%.3fs")
    }
    timed("pairRules") {
      Market.pairRules(baskets, "basket", "brand", 50L, 5L).count()
    }
    timed("tripleRules") {
      Market.tripleRules(baskets, "basket", "brand", 50L, 5L, 5L).count()
    }
    timed("itemSims") {
      Recommend.itemSims(custBrand, "user_id", "brand", 50L, 20L).count()
    }
    spark.stop()
  }
}
