package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KllSpec extends SparkSpec {
  import spark.implicits._

  // uniform multiset: value i at rank i, so rank error reads directly
  // as value error
  private val uniform = (1 to 10000).map(_.toDouble).toDF("v")

  private def exactQ(df: org.apache.spark.sql.DataFrame,
                     ps: Seq[Double]): Map[Double, Double] =
    Percentiles.nearestRank(df, Nil, "v", ps).rows
      .map(r => r(0).asInstanceOf[Double] ->
        r(1).asInstanceOf[Double]).toMap

  test("build: exact below k (step 1 keeps every rank); quantile picks " +
    "equal the nearest-rank values; nulls carry no evidence") {
    val small = (1 to 100).map(_.toDouble).toDF("v")
    val sk = Kll.build(small, "v", k = 256)
    sk.count() shouldBe 100L
    sk.agg(sum("kll_weight")).rows.head.head shouldBe 100L
    val ps = Seq(0.25, 0.5, 0.99)
    val qs = Kll.quantiles(sk, ps, 256).rows
      .map(r => r(0).asInstanceOf[Double] -> r(1).asInstanceOf[Double]).toMap
    val ex = exactQ(small, ps)
    ps.foreach(p => qs(p) shouldBe ex(p))
    // nulls excluded
    Kll.build(small.unionByName(Seq(Option.empty[Double]).toDF("v")),
      "v", 256).agg(sum("kll_weight")).rows.head.head shouldBe 100L
  }

  test("build: <= k rows and quantiles within the documented " +
    "2*step + 1 rank band on a 10000-value uniform multiset") {
    val k = 256
    val step = (10000 + k - 1) / k // 40
    val sk = Kll.build(uniform, "v", k)
    sk.count() should be <= k.toLong
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val qs = Kll.quantiles(sk, ps, k).rows
      .map(r => r(0).asInstanceOf[Double] -> r(1).asInstanceOf[Double]).toMap
    val ex = exactQ(uniform, ps)
    ps.foreach { p =>
      math.abs(qs(p) - ex(p)) should be <= (2 * step + 1).toDouble
    }
  }

  test("build: deterministic — the same multiset compacts to the " +
    "identical sketch, rows and weights") {
    val a = Kll.build(uniform, "v", 64).orderBy("kll_value").rows
    val b = Kll.build(uniform, "v", 64).orderBy("kll_value").rows
    a.map(_.toString) shouldBe b.map(_.toString)
  }

  test("merge: per-slice sketches combine within the additive error " +
    "band; shape contract rejects oversized and mis-schema'd frames") {
    val k = 256
    val lo = uniform.filter(col("v") <= 5000)
    val hi = uniform.filter(col("v") > 5000)
    val merged = Kll.merge(k, Kll.build(lo, "v", k), Kll.build(hi, "v", k))
    merged.count() should be <= k.toLong
    // err(build_half) < 2*20 ranks each, final compaction < 2*40 + 1
    val band = (2 * 20 + 2 * 20 + 2 * 40 + 1).toDouble
    val ps = Seq(0.5, 0.9)
    val qs = Kll.quantiles(merged, ps, k).rows
      .map(r => r(0).asInstanceOf[Double] -> r(1).asInstanceOf[Double]).toMap
    val ex = exactQ(uniform, ps)
    ps.foreach(p => math.abs(qs(p) - ex(p)) should be <= band)
    // a k=1024 sketch does not fit a declared k=64 merge
    intercept[IllegalArgumentException] {
      Kll.merge(64, Kll.build(uniform, "v", 1024))
    }.getMessage should include("more than k=64")
    intercept[IllegalArgumentException] {
      Kll.merge(64, uniform)
    }.getMessage should include("kll_value")
    // quantiles carries the same probe
    intercept[IllegalArgumentException] {
      Kll.quantiles(Kll.build(uniform, "v", 1024), Seq(0.5), 64)
    }.getMessage should include("more than k=64")
    intercept[IllegalArgumentException] {
      Kll.quantiles(Kll.build(uniform, "v", 64), Seq(1.5), 64)
    }
    // the k-range contract fires FIRST (merge's ordering): an
    // out-of-range k gets the k error, not a misleading row-probe one
    intercept[IllegalArgumentException] {
      Kll.quantiles(Kll.build(uniform, "v", 64), Seq(0.5), 8)
    }.getMessage should include("k must be in [16,65536]")
  }

  test("buildByGroup + quantilesByGroup: per-group sketches, exact " +
    "below k per group, banded above; compactByGroup is the multiway " +
    "merge") {
    val k = 64
    // group a: 50 values (exact); group b: 2000 values (sketched)
    val df = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 2000).map(i => ("b", i.toDouble))).toDF("g", "v")
    val sk = Kll.buildByGroup(df, Seq("g"), "v", k)
    sk.filter(col("g") === "a").count() shouldBe 50L
    sk.filter(col("g") === "b").count() should be <= k.toLong
    val qs = Kll.quantilesByGroup(sk, Seq("g"), Seq(0.5), k).rows
      .map(r => r(0).toString -> r(2).asInstanceOf[Double]).toMap
    qs("a") shouldBe 25.0 // exact group: the nearest-rank value itself
    val stepB = (2000 + k - 1) / k // 32
    math.abs(qs("b") - 1000.0) should be <= (2 * stepB + 1).toDouble
    // multiway merge: per-slice partials unioned into one ledger
    val slices = (0 until 4).map(i =>
      Kll.buildByGroup(df.filter(pmod(col("v").cast("long"), lit(4)) === i),
        Seq("g"), "v", k))
    val merged = Kll.compactByGroup(
      slices.reduce(_ unionByName _), Seq("g"), k)
    merged.groupBy("g").count().rows
      .foreach(r => r(1).asInstanceOf[Long] should be <= k.toLong)
    val mq = Kll.quantilesByGroup(merged, Seq("g"), Seq(0.5), k).rows
      .map(r => r(0).toString -> r(2).asInstanceOf[Double]).toMap
    // slices ~500 values each: err < 4 slices · 2·ceil(500/64) + 2·32
    math.abs(mq("b") - 1000.0) should be <= (4 * 2 * 8 + 2 * 32 + 1).toDouble
  }

  test("compactByGroup: a malformed partial (null/zero/negative " +
    "weight) fails loudly, never a silently corrupted cumulative") {
    for (w <- Seq(Some(0L), Some(-3L), Option.empty[Long])) {
      val bad = Seq((1.0, Some(5L)), (2.0, w))
        .toDF("kll_value", "kll_weight")
      intercept[Exception] {
        Kll.compactByGroup(bad, Nil, 64).rows
      }.getMessage should include("kll_weight must be a positive")
    }
  }

  test("merge tree of depth 4: error stays inside the documented " +
    "additive band (err_out < sum of err_in + 2*step_out per merge)") {
    val k = 256
    val big = (1 to 16384).map(_.toDouble).toDF("v")
    // 16 equal slices of 1024 values -> pairwise binary merge tree,
    // 4 merge levels deep — the deepest path the contract prices
    val leaves = (0 until 16).map { i =>
      Kll.build(big.filter(pmod(col("v").cast("long") - 1, lit(16)) === i),
        "v", k)
    }
    def treeMerge(level: Seq[org.apache.spark.sql.DataFrame])
        : org.apache.spark.sql.DataFrame =
      if (level.size == 1) level.head
      else treeMerge(level.grouped(2).map(p => Kll.merge(k, p: _*)).toSeq)
    val root = treeMerge(leaves)
    root.count() should be <= k.toLong
    // exact recursive bound: builds err < 2*ceil(1024/256) = 8 each;
    // merge levels add 2*step_out at weights 2048/4096/8192/16384
    // (steps 8/16/32/64): E = 2E_in + 2*step_out per level -> root
    // bound 640 ranks (+1 pick slack). Uniform multiset: rank == value.
    val band = 641.0
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val qs = Kll.quantiles(root, ps, k).rows
      .map(r => r(0).asInstanceOf[Double] -> r(1).asInstanceOf[Double]).toMap
    val ex = exactQ(big, ps)
    val errs = ps.map(p => math.abs(qs(p) - ex(p)))
    errs.foreach(_ should be <= band)
    // measured constant stays far inside the bound (scaladoc cites
    // this spec): the systematic sample keeps the tree honest
    errs.max should be <= (2 * 64 + 1).toDouble * 3
  }

  test("quantilesByGroup keyed: the groups-sized sketch frame is " +
    "never hint-broadcast — the triangular close partitions by group") {
    // many groups: the segmented-quantiles shape where a broadcast of
    // the keyed sketch frame would bottleneck on the driver at scale.
    // Auto-broadcast off so the pin proves NO HINT forces a broadcast
    // (a hinted join broadcasts regardless of threshold); at runtime
    // AQE remains free to broadcast a genuinely small frame.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = (1 to 20000).map(i => (s"g${i % 500}", (i / 500).toDouble))
        .toDF("g", "v")
      val sk = Kll.buildByGroup(df, Seq("g"), "v", k = 16)
      val q = Kll.quantilesByGroup(sk, Seq("g"), Seq(0.5), k = 16)
      q.count() shouldBe 500L
      val plan = q.queryExecution.executedPlan.toString
      plan should not include "BroadcastHashJoin"
      plan should not include "BroadcastNestedLoopJoin"
      // and the pick stays inside the band: per group 40 values
      // (0..39 one each), W=40, k=16 -> step=3 -> within 2*3+1 ranks
      // of the exact median 19
      val v = q.filter(col("g") === "g7").rows.head(2).asInstanceOf[Double]
      math.abs(v - 19.0) should be <= 7.0
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("merge == build on the union when nothing recompacts away: " +
    "weights add exactly on the shared value ledger") {
    // two slices small enough that every path stays exact
    val a = (1 to 50).map(_.toDouble).toDF("v")
    val b = (26 to 75).map(_.toDouble).toDF("v") // overlap 26..50
    val merged = Kll.merge(256, Kll.build(a, "v", 256),
      Kll.build(b, "v", 256))
    val direct = Kll.build(a.unionByName(b), "v", 256)
    merged.orderBy("kll_value").rows.map(_.toString) shouldBe
      direct.orderBy("kll_value").rows.map(_.toString)
  }
}
