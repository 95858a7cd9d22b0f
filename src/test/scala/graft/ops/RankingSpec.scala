package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def randomFrame(n: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    // duplicate-heavy values so the custkey-style tie-break is load-bearing
    (0 until n).map(i => (i.toLong, rng.nextInt(7).toLong))
      .toDF("id", "v")
      .repartition(4)
  }

  test("withGlobalRank matches the single-partition window row_number exactly") {
    val df = randomFrame(137, seed = 11)
    val expected = df
      .withColumn("global_rank",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .rows.map(_.toString).sorted
    val got = Ranking.withGlobalRank(df, Seq(col("v"), col("id")))
      .rows.map(_.toString).sorted
    got shouldBe expected
  }

  test("withGlobalNtile matches SQL ntile(k) for even, remainder and n<k sizes") {
    for ((n, k) <- Seq((100, 5), (137, 5), (7, 5), (3, 5), (1, 5), (9, 4))) {
      val df = randomFrame(n, seed = n + k)
      val expected = df
        .withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .rows.map(_.toString).sorted
      val got = Ranking.withGlobalNtile(df, Seq(col("v"), col("id")), k, "b")
        .rows.map(_.toString).sorted
      withClue(s"n=$n k=$k: ") { got shouldBe expected }
    }
  }

  test("plan carries no unpartitioned Window — nothing funnels the frame into one task") {
    val out = Ranking.withGlobalNtile(randomFrame(137, seed = 3),
      Seq(col("v"), col("id")), 5, "b")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // an UNPARTITIONED window spec prints its FIRST argument as an
    // ordered column (`x#1L ASC …`); a partitioned one leads with bare
    // partition columns. Assert every windowspecdefinition leads with a
    // partition column.
    val unpartitioned = raw"windowspecdefinition\([^,()]+ (ASC|DESC)".r
    withClue(plan.take(3000)) {
      unpartitioned.findFirstIn(plan) shouldBe None
      // sanity that the regex CAN fire: a genuinely global window must match
      val funneled = randomFrame(5, seed = 9)
        .withColumn("r", row_number().over(Window.orderBy(col("v"), col("id"))))
      funneled.collect()
      unpartitioned.findFirstIn(
        funneled.queryExecution.executedPlan.toString) should not be None
    }
  }

  test("empty input yields empty output, no failure") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    Ranking.withGlobalRank(empty, Seq(col("v"), col("id"))).count() shouldBe 0
    Ranking.withGlobalNtile(empty, Seq(col("v"), col("id")), 5, "b")
      .count() shouldBe 0
    Ranking.withGlobalPercentiles(empty, Seq("v")).count() shouldBe 0
  }

  test("withGlobalPercentiles matches SQL percent_rank/cume_dist incl. ties") {
    val df = randomFrame(137, seed = 23) // 7 distinct values → heavy ties
    val w = Window.orderBy(col("v"))
    val expected = df
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .rows.map(_.toString).sorted
    val got = Ranking.withGlobalPercentiles(df, Seq("v"))
      .select(col("id"), col("v"), col("pct_rank"), col("cume_dist"))
      .rows.map(_.toString).sorted
    got shouldBe expected
    // single row: percent_rank 0 (the n=1 guard), cume_dist 1
    val one = Ranking.withGlobalPercentiles(
      Seq((1L, 5L)).toDF("id", "v"), Seq("v")).rows.head
    one(2) shouldBe 0.0
    one(3) shouldBe 1.0
  }

  test("withGlobalRankTies matches SQL rank/dense_rank incl. ties") {
    val df = randomFrame(137, seed = 37) // 7 distinct values → heavy ties
    val w = Window.orderBy(col("v"))
    val expected = df
      .withColumn("rank_ties", rank().over(w).cast("long"))
      .withColumn("dense_rank", dense_rank().over(w).cast("long"))
      .rows.map(_.toString).sorted
    val got = Ranking.withGlobalRankTies(df, Seq("v"))
      .select(col("id"), col("v"), col("rank_ties"), col("dense_rank"))
      .rows.map(_.toString).sorted
    got shouldBe expected
    // plan pin: no unpartitioned window anywhere
    val out = Ranking.withGlobalRankTies(df, Seq("v"))
    out.collect()
    val unpartitioned = raw"windowspecdefinition\([^,()]+ (ASC|DESC)".r
    withClue(out.queryExecution.executedPlan.toString.take(3000)) {
      unpartitioned.findFirstIn(
        out.queryExecution.executedPlan.toString) shouldBe None
    }
  }

  test("withGlobalPercentiles plan carries no unpartitioned Window") {
    val out = Ranking.withGlobalPercentiles(randomFrame(137, seed = 29), Seq("v"))
    out.collect()
    val unpartitioned = raw"windowspecdefinition\([^,()]+ (ASC|DESC)".r
    withClue(out.queryExecution.executedPlan.toString.take(3000)) {
      unpartitioned.findFirstIn(
        out.queryExecution.executedPlan.toString) shouldBe None
    }
  }

  test("withGlobalNtiles: one base checkpoint, scores identical to sequential calls") {
    val df = randomFrame(100, seed = 31)
      .withColumn("v2", (col("id") * 7L) % 13L)
    val multi = Ranking.withGlobalNtiles(df, Seq("id"),
        Seq((Seq("v", "id"), 5, "q1"), (Seq("v2", "id"), 4, "q2")))
      .rows.map(_.toString).sorted
    val seq2 = Ranking.withGlobalNtile(
        Ranking.withGlobalNtile(df, Seq(col("v"), col("id")), 5, "q1"),
        Seq(col("v2"), col("id")), 4, "q2")
      .rows.map(_.toString).sorted
    multi shouldBe seq2
  }

  test("working-column clashes fail loudly") {
    val df = Seq((1L, 2L)).toDF("id", "__pid")
    intercept[IllegalArgumentException] {
      Ranking.withGlobalRank(df, Seq(col("id")))
    }.getMessage should include("__pid")
  }
}
