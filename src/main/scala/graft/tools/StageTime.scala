package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Dedup

/** One-off diagnostic main: times the three stages of
  * [[Dedup.dedupIncremental]] (exact-hash anti-join, banded LSH
  * candidate join, verify+anti-join) separately at a given sfDir,
  * N repetitions each — the bisection tool behind the round-6
  * dedup_incremental bench investigation. Not part of the query
  * surface; kept for reproducibility of BENCH_NOTES findings.
  */
object StageTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("stage-time")
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(f: => Long): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $tag run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val docs = Tables.documents(spark, sfDir)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)

    // stage 1: exact content-hash anti-join (plus the localCheckpoint)
    timed("exact_antijoin") {
      val histHashes = hist.select(md5(col("text")).as("__h")).distinct()
      fresh.withColumn("__h", md5(col("text")))
        .join(histHashes, Seq("__h"), "left_anti").drop("__h")
        .localCheckpoint().count()
    }
    // stage 2: banded signatures both sides + bucket join (portable md5)
    timed("banded_join") {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", portable = true)
        .count() // same double-banding cost shape, self-join form
    }
    // stage 3: the full operator (stages 1+2+verify+final anti-join)
    timed("full_operator") {
      Dedup.dedupIncremental(fresh, hist, id = "doc_id", text = "text",
        threshold = 0.8, portable = true).count()
    }
    spark.stop()
  }
}
