package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** One-off diagnostic main: |Q| sweep for the
  * [[graft.ops.Similarity.SpreadMinQueries]] crossover. Round 18
  * measured the broadcast-product rebalance at two points only (|Q| ≤ 16
  * loses 0.3–0.7 s, |Q| = 2000 wins ~4 s) and set the gate at 256
  * between them; this sweeps the regime boundary so the knee is pinned
  * by data, not interpolation.
  *
  * For each |Q| it times the broadcast product join + cosine + top-k
  * close both WITH and WITHOUT the pre-product rebalance (the join body
  * replicated inline from queryProductJoin's broadcast branch — a
  * diagnostic copy, kept in sync by eye with Similarity.scala), reps
  * interleaved S,U,S,U in one JVM, noop sink per the guide §1.4.
  *
  * Usage: runMain graft.tools.KneeTime [sfDir] [reps] [qCsv]
  */
object KneeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val qs = args.lift(2).map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(16, 32, 64, 96, 128, 192, 256, 512, 2000))
    val spark = GraftSession.local("knee-time")
    spark.sparkContext.setLogLevel("ERROR")

    def emb() = Tables.embeddings(spark, sfDir)

    def topK(scored: DataFrame, k: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
    }

    def run(nQ: Int, spreadOn: Boolean): Long = {
      val q = emb().filter(col("vec_id") < nQ)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c0 = emb()
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val c = if (spreadOn) graft.ops.Skew.spread(c0) else c0
      val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          graft.functions.GraftFunctions.cosineSim(col("qv"), col("cv")))
      val out = topK(scored, 8)
      out.write.format("noop").mode("overwrite").save()
      nQ.toLong
    }

    run(qs.head, spreadOn = true) // warm untimed

    qs.foreach { nQ =>
      val (ss, us) = (collection.mutable.ArrayBuffer[Double](),
        collection.mutable.ArrayBuffer[Double]())
      (1 to reps).foreach { _ =>
        var t0 = System.nanoTime(); run(nQ, spreadOn = true)
        ss += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); run(nQ, spreadOn = false)
        us += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[knee] nQ=$nQ%5d spread=${med(ss.toSeq)}%.3f " +
        f"unspread=${med(us.toSeq)}%.3f " +
        f"delta=${med(us.toSeq) - med(ss.toSeq)}%+.3f (pos = spread wins)")
    }
    spark.stop()
  }
}
