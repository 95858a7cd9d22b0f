package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** One-off diagnostic main: bisects [[Similarity.lofOutliers]] — the
  * round-18 min-composite's most expensive query (emb_lof_outliers,
  * 6.80 s at sf0.1) — into its three serial legs: the broadcast-cap
  * probe (`limit(n+1).count()`), the n² scoring + per-point kNN window
  * + localCheckpoint barrier, and the reach/lrd/ratio tail
  * ([[Similarity.lofFromKnn]]'s joins over the k·n checkpointed frame).
  * Same role as [[StageTime]]/[[PcaTime]]: attribute the seconds before
  * touching the operator. The inline score/window probes reproduce the
  * PRE-fix (un-spread) shape deliberately — they are the measurement
  * that motivated the [[graft.ops.Skew.spread]] in queryProductJoin's
  * broadcast branch; `full_operator` times whatever the operator
  * currently does. Not part of the query surface.
  *
  * Usage: runMain graft.tools.LofTime [sfDir] [reps]
  */
object LofTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("lof-time")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lof] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    (1 to reps).foreach { i =>
      println(s"[lof] --- rep $i ---")
      // leg 1: the probe job queryProductJoin runs before choosing
      // broadcast vs blocked (bounded limit-count, never a full count)
      t("probe(limit.count)") {
        emb.select(col("vec_id")).limit(100001).count()
      }
      // leg 2: n² cosine scoring + kNN window + checkpoint — rebuilt
      // from the operator's own pieces so the timing isolates the
      // barrier the full operator pays before its tail
      val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      // sub-bisection: raw n² scoring without the window, then the
      // window without the checkpoint — attributes the ~4 s leg
      // noop sink, NOT count: count() lets the optimizer prune the
      // cosine column and times an empty product (guide §1.4)
      t("score_only.noop") {
        val q2 = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c2 = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        c2.join(broadcast(q2), col("query_id") =!= col("neighbor_id"))
          .withColumn("dist", lit(1.0) - Similarity.cosine(col("qv"), col("cv")))
          .select(col("query_id").as("p"), col("neighbor_id").as("o"), col("dist"))
          .write.format("noop").mode("overwrite").save()
      }
      t("score+window.count") {
        val q2 = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c2 = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        val scored2 = c2.join(broadcast(q2), col("query_id") =!= col("neighbor_id"))
          .withColumn("dist", lit(1.0) - Similarity.cosine(col("qv"), col("cv")))
          .select(col("query_id").as("p"), col("neighbor_id").as("o"), col("dist"))
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p")).orderBy(col("dist"), col("o"))
        scored2.withColumn("rn", row_number().over(w2))
          .filter(col("rn") <= 10).count()
      }
      val ranked = t("score+knn+checkpoint") {
        val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
          .withColumn("dist", lit(1.0) - Similarity.cosine(col("qv"), col("cv")))
          .select(col("query_id").as("p"), col("neighbor_id").as("o"), col("dist"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p")).orderBy(col("dist"), col("o"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .localCheckpoint()
      }
      // leg 3: the reach/lrd/ratio tail over the checkpointed kNN frame
      t("lof_tail.count") {
        Similarity.lofFromKnn(ranked, "vec_id", 10).count()
      }
      // full operator for the composite reference
      t("full_operator.count") {
        Similarity.lofOutliers(emb, "vec_id", "embedding", 10).count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
