package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.{FuzzyJoin, Skew}

/** One-off diagnostic: isolates the cost components of er_fuzzy_pairs
  * at sf0.1 — pair generation alone, levenshtein alone, salted vs not,
  * AQE coalescing on/off. Behind BENCH_NOTES round-6 findings. */
object FuzzyTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("fuzzy-time")
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[fuzzy] $tag run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val cust = Tables.customer(spark, sfDir)
    val blocked = cust.select(col("c_custkey").as("id"), col("c_name").as("s"),
      substring(col("c_name"), 10, 6).as("blk"))
    val a = blocked.select(col("blk"), col("id").as("id_a"), col("s").as("sa"))
    val b = blocked.select(col("blk"), col("id").as("id_b"), col("s").as("sb"))

    timed("pairgen_only") {
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b")).count()
    }
    timed("pairgen_lev") {
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .withColumn("d", levenshtein(col("sa"), col("sb"), 1))
        .filter(col("d") >= 0).count()
    }
    timed("pairgen_lev_salted") {
      Skew.saltedJoin(a, b, Seq("blk"), "id_a", 32)
        .filter(col("id_a") < col("id_b"))
        .withColumn("d", levenshtein(col("sa"), col("sb"), 1))
        .filter(col("d") >= 0).count()
    }
    timed("full_operator") {
      FuzzyJoin.blockedLevenshtein(cust, "c_custkey", "c_name",
        substring(col("c_name"), 10, 6), maxDist = 1, salts = 32).count()
    }
    spark.stop()
  }
}
