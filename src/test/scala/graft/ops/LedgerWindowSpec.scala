package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The round-15 closure of the distinct-ledger unpartitioned-Window
  * class: [[Ranking.withRunningTotals]] is the shared distributed
  * prefix sum, and every op that used to run a single-task
  * `Window.orderBy` over its collapsed "distinct-value" frame
  * (ksDrift, peakConcurrency, quantileBand, equiDepthHistogram,
  * weightedMedian) now rides it. Correctness is pinned against the
  * plain window forms; the plan pins assert no unpartitioned
  * windowspecdefinition survives anywhere in the executed plans (the
  * RankingSpec regex — an unpartitioned spec prints its FIRST argument
  * as an ordered column). */
class LedgerWindowSpec extends SparkSpec {
  import spark.implicits._

  private val unpartitioned = raw"windowspecdefinition\([^,()]+ (ASC|DESC)".r

  private def assertNoGlobalWindow(df: DataFrame): Unit = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan.take(3000)) {
      unpartitioned.findFirstIn(plan) shouldBe None
    }
  }

  test("withRunningTotals matches window prefix sums, unkeyed multi-column") {
    val rng = new scala.util.Random(5)
    val df = (0 until 200)
      .map(_ => (rng.nextInt(37).toLong, rng.nextInt(5).toLong + 1,
        rng.nextInt(3).toLong))
      .toDF("t", "a", "b")
      .groupBy("t").agg(sum("a").as("a"), sum("b").as("b"))
      .repartition(4)
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("s1", sum(col("a")).over(w))
      .withColumn("s2", sum(col("b")).over(w))
      .rows.map(_.toString).sorted
    val got = Ranking.withRunningTotals(df, Seq.empty, Seq(col("t")),
        Seq("a" -> "s1", "b" -> "s2"))
      .rows.map(_.toString).sorted
    got shouldBe expected
  }

  test("withRunningTotals keyed matches per-key window prefix sums incl. null keys") {
    val rng = new scala.util.Random(7)
    val raw = (0 until 300).map { _ =>
      val k = rng.nextInt(4) match { case 0 => null; case n => s"k$n" }
      (k, rng.nextInt(50).toLong, 1L)
    }.toDF("k", "v", "c")
    val df = raw.groupBy("k", "v").agg(sum("c").as("c")).repartition(4)
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("c")).over(w))
      .rows.map(_.toString).sorted
    val got = Ranking.withRunningTotals(df, Seq("k"), Seq(col("v")),
        Seq("c" -> "cum"))
      .rows.map(_.toString).sorted
    got shouldBe expected
  }

  test("withRunningTotals empty input yields empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("t", "c")
    Ranking.withRunningTotals(empty, Seq.empty, Seq(col("t")),
      Seq("c" -> "cum")).count() shouldBe 0
    Ranking.withRunningTotals(empty.withColumn("k", lit("x")), Seq("k"),
      Seq(col("t")), Seq("c" -> "cum")).count() shouldBe 0
  }

  test("withRunningTotals rejects clashes and missing inputs loudly") {
    val df = Seq((1L, 2L)).toDF("t", "c")
    intercept[IllegalArgumentException] {
      Ranking.withRunningTotals(df, Seq.empty, Seq(col("t")),
        Seq("missing" -> "cum"))
    }.getMessage should include("missing")
    intercept[IllegalArgumentException] {
      Ranking.withRunningTotals(df, Seq.empty, Seq(col("t")),
        Seq("c" -> "s", "c" -> "s"))
    }.getMessage should include("duplicate")
    intercept[IllegalArgumentException] {
      Ranking.withRunningTotals(df.withColumn("__pl0", lit(1L)), Seq.empty,
        Seq(col("t")), Seq("c" -> "cum"))
    }.getMessage should include("__pl")
  }

  test("the five distinct-ledger ops carry no unpartitioned Window") {
    val docs = (1 to 200).map(i => (i.toLong, (i * 37 % 97).toLong))
      .toDF("id", "n")
    assertNoGlobalWindow(Sampling.quantileBand(docs, "n", 0.1, 0.9))
    assertNoGlobalWindow(Percentiles.equiDepthHistogram(docs, "n", 8))
    assertNoGlobalWindow(Percentiles.weightedMedian(
      docs.withColumn("g", col("id") % 3), Seq("g"), "n", "id"))
    val base = (1 to 150).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
    val cur = (1 to 150).map(i => (i.toLong, (i % 17).toLong)).toDF("id", "v")
    assertNoGlobalWindow(Quality.ksDrift(base, cur, "v"))
    assertNoGlobalWindow(Quality.cvmDrift(base, cur, "v"))
    val iv = (1 to 100).map(i => (i.toLong * 3, i.toLong * 3 + 7)).toDF("s", "e")
    assertNoGlobalWindow(Intervals.peakConcurrency(iv, "s", "e", 10L))
  }

  test("nearestRank and packByBudget ride the ledger — no global window, keyed or not") {
    val docs = (1 to 200).map(i => (i.toLong, (i * 37 % 97).toLong,
        if (i % 3 == 0) "a" else "b"))
      .toDF("id", "n", "g")
    assertNoGlobalWindow(Percentiles.nearestRank(docs, Seq("g"), "n",
      Seq(0.5, 0.9)))
    assertNoGlobalWindow(Percentiles.nearestRank(docs, Seq.empty, "n",
      Seq(0.5)))
    assertNoGlobalWindow(Packing.packByBudget(docs, "id", "n", 100L))
    assertNoGlobalWindow(Packing.packByBudget(docs, "id", "n", 100L,
      group = Seq("g")))
  }

  test("unkeyed nearestRank matches the single-window nearest-rank definition") {
    val rng = new scala.util.Random(13)
    val df = (0 until 137).map(i => (i.toLong, rng.nextInt(25).toLong))
      .toDF("id", "n")
    val w = Window.orderBy(col("n"))
    val expected = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(lit(0))))
      .withColumn("p", explode(array(lit(0.25), lit(0.5), lit(0.99))))
      .filter(col("__rn") === ceil(col("p") * col("__n")))
      .select(col("p"), col("n").as("pct_value"))
      .rows.map(_.toString).sorted
    val got = Percentiles.nearestRank(df, Seq.empty, "n",
        Seq(0.25, 0.5, 0.99))
      .rows.map(_.toString).sorted
    got shouldBe expected
  }

  test("packByBudget global path matches the window form") {
    val rng = new scala.util.Random(17)
    val df = (0 until 150).map(i => (i.toLong, rng.nextInt(40).toLong + 1))
      .toDF("id", "tok")
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("cum_before") / 100L))
      .rows.map(_.toString).sorted
    val got = Packing.packByBudget(df, "id", "tok", 100L)
      .rows.map(_.toString).sorted
    got shouldBe expected
  }

  test("withGlobalNtiles rejects out-name collisions outside the narrow projection") {
    val df = Seq((1L, 2L, 3L)).toDF("id", "v", "extra")
    intercept[IllegalArgumentException] {
      Ranking.withGlobalNtiles(df, Seq("id"), Seq((Seq("v", "id"), 4, "extra")))
    }.getMessage should include("extra")
    intercept[IllegalArgumentException] {
      Ranking.withGlobalNtiles(df, Seq("id"),
        Seq((Seq("v", "id"), 4, "q"), (Seq("v", "id"), 5, "q")))
    }.getMessage should include("duplicate")
  }
}
