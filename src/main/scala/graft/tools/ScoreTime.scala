package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Recommend

/** One-off diagnostic main: stage bisection of the CF scoring leg — the
  * round-19 fold's three most expensive queries (rec_topn_recall,
  * rec_user_topn, rec_user_topn_truncated) all end in
  * [[Recommend.scoreTopN]]. Times, noop-sunk per guide §1.4:
  *
  *   prelude    presenceAndSims (presence distinct + Apriori sims build,
  *              both localCheckpointed — the two job barriers)
  *   cand       candidate join only (pres ⋈ directional sims)
  *   cand+anti  … + seen-set anti-join
  *   cand+agg   … + decimal score aggregation
  *   full       … + per-user ranking window (the query shape)
  *
  * The scoring stages run from the SAME materialized prelude, so their
  * deltas are the stages' own cost. Usage:
  *   runMain graft.tools.ScoreTime [sfDir] [reps]
  */
object ScoreTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("score-time")
    spark.sparkContext.setLogLevel("ERROR")

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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def drop(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    def directional(sims: DataFrame): DataFrame =
      sims.select(col("item_a").as("__i"), col("item_b").as("__j"),
          col("cosine"))
        .unionByName(sims.select(col("item_b").as("__i"),
          col("item_a").as("__j"), col("cosine")))

    // warm untimed
    noop(Recommend.recommendTopN(custBrand(), "user_id", "brand", n = 3,
      minUsers = 50L, minPairUsers = 20L))
    drop()

    // focused A/C interleave on ONE materialized prelude: A = scoreTopN
    // as shipped, C = shuffle-hash-hinted anti-join, alternating so JVM
    // warmth and box state cancel (the RecTime discipline)
    if (args.lift(2).contains("ac")) {
      val (pres, sims) = Recommend.presenceAndSims(custBrand(), "user_id",
        "brand", 50L, 20L)
      val dir = directional(sims)
      def variantC(): Unit = {
        val sc = pres.join(dir, col("__item") === col("__i"))
          .join(pres.select(col("__basket"), col("__item").as("__j"))
              .hint("shuffle_hash"),
            Seq("__basket", "__j"), "left_anti")
          .groupBy(col("__basket"), col("__j"))
          .agg(sum(col("cosine").cast("decimal(20,12)")).as("__score"),
            count(lit(1)).as("n_paths"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__basket"))
          .orderBy(col("__score").desc, col("__j"))
        noop(sc.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3))
      }
      val (as, cs) = (collection.mutable.ArrayBuffer[Double](),
        collection.mutable.ArrayBuffer[Double]())
      (1 to reps).foreach { i =>
        var t0 = System.nanoTime()
        noop(Recommend.scoreTopN(pres, sims, "user_id", "brand", n = 3))
        as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); variantC()
        cs += (System.nanoTime() - t0) / 1e9
        println(f"[score] ac rep$i A=${as.last}%.3f C=${cs.last}%.3f")
      }
      def stats(xs: Seq[Double]) =
        f"med=${xs.sorted.apply(xs.size / 2)}%.3f min=${xs.min}%.3f"
      println(s"[score] A(smj anti) ${stats(as.toSeq)}  " +
        s"C(shj anti) ${stats(cs.toSeq)}")
      spark.stop(); return
    }

    (1 to reps).foreach { i =>
      var t0 = System.nanoTime()
      val (pres, sims) = Recommend.presenceAndSims(custBrand(), "user_id",
        "brand", 50L, 20L)
      val tPrelude = (System.nanoTime() - t0) / 1e9

      val dir = directional(sims)
      val cand = pres.join(dir, col("__item") === col("__i"))
      t0 = System.nanoTime(); noop(cand)
      val tCand = (System.nanoTime() - t0) / 1e9

      val anti = cand.join(pres.select(col("__basket"),
          col("__item").as("__j")), Seq("__basket", "__j"), "left_anti")
      t0 = System.nanoTime(); noop(anti)
      val tAnti = (System.nanoTime() - t0) / 1e9

      val agg = anti.groupBy(col("__basket"), col("__j"))
        .agg(sum(col("cosine").cast("decimal(20,12)")).as("__score"),
          count(lit(1)).as("n_paths"))
      t0 = System.nanoTime(); noop(agg)
      val tAgg = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      noop(Recommend.scoreTopN(pres, sims, "user_id", "brand", n = 3))
      val tFull = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      noop(Recommend.scoreTopN(pres, sims, "user_id", "brand", n = 3,
        maxSimilarPerItem = Some(10)))
      val tTrunc = (System.nanoTime() - t0) / 1e9

      // B (measured SLOWER 8.6–9.8 s vs ~4, kept for the record): agg
      // first, anti after. C: the current order but the anti-join builds
      // a hash table on the small seen-set side instead of sort-merging
      // — skips the sort of the candidate expansion (the 7M-row side)
      val aggFirst = pres.join(dir, col("__item") === col("__i"))
        .join(pres.select(col("__basket"), col("__item").as("__j"))
            .hint("shuffle_hash"),
          Seq("__basket", "__j"), "left_anti")
        .groupBy(col("__basket"), col("__j"))
        .agg(sum(col("cosine").cast("decimal(20,12)")).as("__score"),
          count(lit(1)).as("n_paths"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__basket"))
        .orderBy(col("__score").desc, col("__j"))
      val fullB = aggFirst.withColumn("rank",
          row_number().over(wB).cast("long"))
        .filter(col("rank") <= 3)
      t0 = System.nanoTime(); noop(fullB)
      val tFullB = (System.nanoTime() - t0) / 1e9

      if (i == 1) {
        val a = Recommend.scoreTopN(pres, sims, "user_id", "brand", n = 3)
        val drift = a.unionByName(fullB
            .select(col("__basket").as("user_id"), col("__j").as("brand"),
              col("__score").cast("double").cast("float").as("score"),
              col("n_paths"), col("rank")))
          .groupBy(col("user_id"), col("brand"), col("score"),
            col("n_paths"), col("rank"))
          .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
        require(drift == 0, s"agg-first variant drifted: $drift rows differ")
        println(s"[score] variant equivalence: identical rows (drift=0)")
      }

      drop()
      println(f"[score] rep$i prelude=$tPrelude%.3f cand=$tCand%.3f " +
        f"cand+anti=$tAnti%.3f cand+agg=$tAgg%.3f full=$tFull%.3f " +
        f"trunc=$tTrunc%.3f fullC(shuffleHashAnti)=$tFullB%.3f")
    }
    spark.stop()
  }
}
