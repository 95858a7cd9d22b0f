package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PercentilesCdcSpec extends SparkSpec {
  import spark.implicits._

  // ── Percentiles.nearestRank ────────────────────────────────────────

  test("nearestRank: value at ceil(p·n), nulls excluded, p=1 is the max") {
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)),
      ("a", Some(40.0)), ("a", None), ("b", Some(5.0))).toDF("g", "v")
    val out = Percentiles.nearestRank(df, Seq("g"), "v", Seq(0.5, 1.0))
      .orderBy("g", "p").rows.map(r => (r(0), r(1), r(2)))
    // group a: n=4 → p=.5 rank 2 (20.0), p=1 rank 4 (40.0); b: n=1 → 5.0
    out shouldBe Seq(
      ("a", 0.5, 20.0), ("a", 1.0, 40.0),
      ("b", 0.5, 5.0), ("b", 1.0, 5.0))
  }

  test("nearestRank: out-of-range p and reserved columns rejected") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      Percentiles.nearestRank(df, Seq("g"), "v", Seq(0.0))
    an[IllegalArgumentException] should be thrownBy
      Percentiles.nearestRank(df, Seq("g"), "v", Seq(1.1))
    an[IllegalArgumentException] should be thrownBy
      Percentiles.nearestRank(df.withColumn("p", lit(1)), Seq("g"), "v", Seq(0.5))
  }

  // ── Cdc.apply ──────────────────────────────────────────────────────

  private val base = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("k", "bal")

  test("winsorize: clips to observed bounds, passes nulls and unbounded groups") {
    // group a: 1..10 → p(0.2)=rank 2 → 2.0, p(0.8)=rank 8 → 8.0
    val a = (1 to 10).map(i => ("a", Some(i.toDouble)))
    val df = (a :+ (("a", None)) :+ (("b", None))).toDF("g", "v")
    val out = Percentiles.winsorize(df, Seq("g"), "v", pLo = 0.2, pHi = 0.8)
      .orderBy("g", "v").rows.map(r => (r(0), r(1), r(2)))
    // a-nulls stay null; extremes clip onto values that EXIST in the data
    out.filter(_._1 == "a").map(_._3) shouldBe
      Seq(null, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 8.0, 8.0)
    // group b has no observations → no bounds → pass-through null
    out.filter(_._1 == "b").map(_._3) shouldBe Seq(null)
    an[IllegalArgumentException] should be thrownBy
      Percentiles.winsorize(df, Seq("g"), "v", pLo = 0.5, pHi = 0.5)
  }

  test("winsorize: over-threshold bounds frame joins WITHOUT a broadcast hint, rows identical") {
    val df = (1 to 10).flatMap(g => (1 to 5).map(i => (s"g$g", i.toDouble)))
      .toDF("g", "v")
    def rws(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("g", "v").rows.map(_.toString)
    val hinted = Percentiles.winsorize(df, Seq("g"), "v", pLo = 0.2, pHi = 0.8)
    val guarded = Percentiles.winsorize(df, Seq("g"), "v", pLo = 0.2, pHi = 0.8,
      maxBroadcastGroups = 1) // 10 groups ≫ 1
    rws(guarded) shouldBe rws(hinted)
    rws(guarded) should not be empty
    // the scale contract: past the probe threshold the logical plan
    // carries NO broadcast hint — AQE may still broadcast a measured-
    // tiny side, but nothing FORCES a driver-sized build at millions
    // of groups (per-user winsorization)
    val optimized = guarded.queryExecution.optimizedPlan.toString
    withClue(optimized.take(2000)) {
      optimized should not include "strategy=broadcast"
    }
    // and the below-threshold path still pins the hint (tiny-by-probe)
    hinted.queryExecution.optimizedPlan.toString should include("strategy=broadcast")
  }

  test("snapshotDiff: added/removed/changed classified, unchanged silent") {
    val before = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, Double.NaN))
      .toDF("k", "v").withColumn("v",
        when(col("k") === 4L, lit(null).cast("double")).otherwise(col("v")))
    val after = Seq((1L, 10.0), (2L, 99.0), (4L, 40.0), (5L, 50.0))
      .toDF("k", "v")
    val out = Reconcile.snapshotDiff(before, after, Seq("k"), Seq("v"))
      .orderBy("k").rows.map(r => (r(0), r(3), r(1), r(2)))
    out shouldBe Seq(
      (2L, "changed", 20.0, 99.0),
      (3L, "removed", 30.0, null),
      (4L, "changed", null, 40.0), // null → value IS a change (null-safe)
      (5L, "added", null, 50.0))
    // key 1 (unchanged) emits nothing; reserved-column clash rejected
    an[IllegalArgumentException] should be thrownBy
      Reconcile.snapshotDiff(before.withColumnRenamed("v", "change"),
        after, Seq("k"), Seq("v"))
    an[IllegalArgumentException] should be thrownBy
      Reconcile.snapshotDiff(before, after, Seq("k"), Seq.empty)
    // a duplicated key is not a snapshot: loud runtime failure, never
    // contradictory changed-and-unchanged twin rows
    val dup = Seq((7L, 10.0), (7L, 20.0)).toDF("k", "v")
    an[Exception] should be thrownBy
      Reconcile.snapshotDiff(dup, after, Seq("k"), Seq("v")).collect()
  }

  test("bucketChecksums: clean copies match everywhere; a changed/dropped row flips only its bucket") {
    import org.apache.spark.sql.functions.col
    val a = (1L to 40L).map(i => (i, s"s$i", i * 100)).toDF("id", "s", "cents")
    val clean = Reconcile.bucketChecksums(a, a, "id", Seq("id", "s", "cents"),
      buckets = 8)
    clean.count() shouldBe 8
    clean.filter(!col("bucket_match")).count() shouldBe 0
    // corrupt one value and drop one row: exactly their buckets flag
    val b = a.filter(col("id") =!= 7L)
      .withColumn("cents", org.apache.spark.sql.functions
        .when(col("id") === 13L, col("cents") + 1).otherwise(col("cents")))
    val diff = Reconcile.bucketChecksums(a, b, "id", Seq("id", "s", "cents"),
      buckets = 8)
    val bad = diff.filter(!col("bucket_match"))
    bad.count() should (be >= 1L and be <= 2L) // ids 7 and 13 may share a bucket
    // counts localize the drop: the dropped row's bucket shows n_a = n_b + 1
    diff.rows.map(r => r(1).asInstanceOf[Long] - r(2).asInstanceOf[Long]).sum shouldBe 1L
  }

  test("coalesce: overlaps and touches merge, gaps split, adjacentGap bridges") {
    val iv = Seq(
      ("a", 1L, 5L), ("a", 3L, 8L),   // overlap → one island [1,8]
      ("a", 8L, 10L),                 // touching (closed): still merges
      ("a", 12L, 14L),                // gap of 1 past 10 → new island
      ("b", 2L, 2L)                   // other key, point interval
    ).toDF("k", "s", "e")
    val out = Intervals.coalesce(iv, Seq("k"), "s", "e")
      .orderBy("k", "start").rows.map(r => (r(0), r(1), r(2), r(3)))
    out shouldBe Seq(("a", 1L, 10L, 3L), ("a", 12L, 14L, 1L), ("b", 2L, 2L, 1L))
    // adjacentGap = 2 bridges the 12-vs-10 gap into one island
    Intervals.coalesce(iv.filter(col("k") === "a"), Seq("k"), "s", "e",
        adjacentGap = 2L)
      .orderBy("start").rows.map(r => (r(1), r(2), r(3))) shouldBe
      Seq((1L, 14L, 4L))
    // inverted interval fails loudly at run time, never a silent island
    an[Exception] should be thrownBy
      Intervals.coalesce(Seq(("a", 5L, 1L)).toDF("k", "s", "e"),
        Seq("k"), "s", "e").collect()
    an[IllegalArgumentException] should be thrownBy
      Intervals.coalesce(iv, Seq.empty, "s", "e")
  }

  test("apply: last change wins; U replaces, D removes, inserts appear") {
    val changes = Seq(
      (1L, 1L, 1L, "U", 110.0), (1L, 2L, 2L, "U", 120.0), // key 1 → 120
      (2L, 1L, 3L, "U", 210.0), (2L, 2L, 4L, "D", 0.0),   // key 2 → deleted
      (4L, 1L, 5L, "U", 400.0)                            // new key inserted
    ).toDF("k", "seq", "tie", "op", "bal")
    val out = Cdc.apply(base, changes, "k", "seq", "tie", "op")
      .orderBy("k").rows.map(r => (r(0), r(1)))
    out shouldBe Seq((1L, 120.0), (3L, 300.0), (4L, 400.0))
  }

  test("apply: seq ties break by tie column, descending") {
    val changes = Seq(
      (1L, 5L, 1L, "U", 111.0), (1L, 5L, 2L, "U", 222.0) // tie=2 wins
    ).toDF("k", "seq", "tie", "op", "bal")
    val out = Cdc.apply(base, changes, "k", "seq", "tie", "op")
      .filter(col("k") === 1L).rows
    out shouldBe Seq(Seq(1L, 222.0))
  }

  test("apply: a malformed op fails loudly even when a later change shadows it") {
    val winning = Seq((1L, 1L, 1L, "X", 0.0)).toDF("k", "seq", "tie", "op", "bal")
    an[Exception] should be thrownBy
      Cdc.apply(base, winning, "k", "seq", "tie", "op").collect()
    // the corrupt op is NOT the per-key winner — validation must still see it
    val shadowed = Seq((1L, 1L, 1L, "X", 0.0), (1L, 2L, 2L, "U", 120.0))
      .toDF("k", "seq", "tie", "op", "bal")
    an[Exception] should be thrownBy
      Cdc.apply(base, shadowed, "k", "seq", "tie", "op").collect()
  }

  test("apply: schema mismatches rejected before any job runs") {
    val noBal = Seq((1L, 1L, 1L, "U")).toDF("k", "seq", "tie", "op")
    an[IllegalArgumentException] should be thrownBy
      Cdc.apply(base, noBal, "k", "seq", "tie", "op")
  }

  test("weightedMedian: lower median at half mass, zero/null weights excluded") {
    // g1: values 1(w3), 2(w1), 9(w2) — total 6, half 3 → cum(1)=3 ⇒ 2·3 ≥ 6 → median 1
    // g2: values 5(w1), 7(w1) — even split → lower median 5
    // g3: only zero/null weights → no output row
    val df = Seq(
      ("g1", 1.0, Some(3L)), ("g1", 2.0, Some(1L)), ("g1", 9.0, Some(2L)),
      ("g2", 5.0, Some(1L)), ("g2", 7.0, Some(1L)),
      ("g3", 4.0, Some(0L)), ("g3", 6.0, None)
    ).toDF("g", "v", "w")
    val out = Percentiles.weightedMedian(df, Seq("g"), "v", "w")
      .rows.map(r => r.head -> ((r(1), r(2)))).toMap
    out shouldBe Map("g1" -> ((1.0, 6L)), "g2" -> ((5.0, 2L)))
  }

  test("weightedMedian: duplicate values merge their weights first") {
    // 10(w1), 10(w1), 20(w1): merged 10(w2) → cum 2·2 ≥ 3 → 10
    val df = Seq(("g", 10.0, 1L), ("g", 10.0, 1L), ("g", 20.0, 1L))
      .toDF("g", "v", "w")
    Percentiles.weightedMedian(df, Seq("g"), "v", "w")
      .rows.head(1) shouldBe 10.0
  }

  test("weightedNearestRank: equals nearestRank on the expanded rows; " +
    "p=0.5 agrees with weightedMedian; zero/null weights excluded") {
    val df = Seq(
      ("g1", 1.0, Some(3L)), ("g1", 2.0, Some(1L)), ("g1", 9.0, Some(2L)),
      ("g2", 5.0, Some(1L)), ("g2", 7.0, Some(1L)),
      ("g3", 4.0, Some(0L)), ("g3", 6.0, None)
    ).toDF("g", "v", "w")
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val out = Percentiles.weightedNearestRank(df, Seq("g"), "v", "w", ps)
      .rows.map(r => (r(0).toString, r(1).asInstanceOf[Double]) ->
        r(2).asInstanceOf[Double]).toMap
    // expand each row weight-many times and compare against nearestRank
    val expanded = Seq.fill(3)(("g1", 1.0)) ++ Seq(("g1", 2.0)) ++
      Seq.fill(2)(("g1", 9.0)) ++ Seq(("g2", 5.0), ("g2", 7.0))
    val exact = Percentiles.nearestRank(expanded.toDF("g", "v"),
        Seq("g"), "v", ps)
      .rows.map(r => (r(0).toString, r(1).asInstanceOf[Double]) ->
        r(2).asInstanceOf[Double]).toMap
    out shouldBe exact
    out(("g1", 0.5)) shouldBe 1.0 // the weightedMedian reading
    out.keys.count(_._1 == "g3") shouldBe 0
    intercept[IllegalArgumentException] {
      Percentiles.weightedNearestRank(df, Seq("g"), "v", "w", Seq(0.0))
    }
  }

  test("weightedNearestRank: negative or fractional weights fail " +
    "loudly — never a silent drop or an engine-specific truncation") {
    val neg = Seq(("g", 1.0, 2L), ("g", 2.0, -1L)).toDF("g", "v", "w")
    intercept[Exception] {
      Percentiles.weightedNearestRank(neg, Seq("g"), "v", "w", Seq(0.5)).rows
    }.getMessage should include("weight must be a non-negative integer")
    val frac = Seq(("g", 1.0, 2.0), ("g", 2.0, 2.7)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Percentiles.weightedNearestRank(frac, Seq("g"), "v", "w", Seq(0.5)).rows
    }
    e.getMessage should include("weight must be a non-negative integer")
    e.getMessage should include("2.7")
  }

  test("medianAbsoluteDeviation: equals the two-pass nearestRank form " +
    "on grouped, tied, null-laden, and null-key input") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)), ("a", Some(9.0)),
      ("a", None), ("b", Some(5.0)), ("b", Some(7.0)),
      (null.asInstanceOf[String], Some(3.0)),
      (null.asInstanceOf[String], Some(4.0))).toDF("g", "v")
    // the shipped two-pass reference shape
    val med = Percentiles.nearestRank(df, Seq("g"), "v", Seq(0.5))
      .select(col("g"), col("pct_value").as("med"))
    val dev = df.join(med, df("g") <=> med("g"))
      .select(df("g"), abs(col("v") - col("med")).as("dev"))
    val expected = Percentiles.nearestRank(dev, Seq("g"), "dev", Seq(0.5))
      .join(med, Seq("g")).select(col("g"), col("med"),
        col("pct_value").as("mad"))
      .rows.map(r => (r(0), r(1), r(2))).sortBy(_._1 == null)
    val got = Percentiles.medianAbsoluteDeviation(df, Seq("g"), "v")
      .rows.map(r => (r(0), r(1), r(2))).sortBy(_._1 == null)
    // null-key group falls out of expected's plain equi-join re-join,
    // so compare on the shared groups plus check null-key directly
    got.filter(_._1 != null).sortBy(_._1.toString) shouldBe
      expected.filter(_._1 != null).sortBy(_._1.toString)
    // null-key group: values 3,4 → med = rank ⌈1⌉ of 2 = 3.0;
    // deviations 0,1 → mad = rank 1 of (0,1) = 0.0
    got.find(_._1 == null).get shouldBe ((null, 3.0, 0.0))
    // hand-check group a: values 1,2,2,9 → med = rank ⌈2⌉ of 4 = 2.0;
    // deviations 1,0,0,7 → mad = rank 2 of 4 sorted (0,0,1,7) = 0.0
    got.find(_._1 == "a").get shouldBe (("a", 2.0, 0.0))
  }

  test("medianAbsoluteDeviation: unkeyed (global) median/MAD") {
    val df = Seq(1.0, 3.0, 5.0, 100.0).toDF("v")
    // med = rank 2 of 4 = 3.0; devs 2,0,2,97 → mad = rank 2 of
    // (0,2,2,97) = 2.0
    val r = Percentiles.medianAbsoluteDeviation(df, Seq.empty, "v").rows.head
    r(0) shouldBe 3.0
    r(1) shouldBe 2.0
  }

  test("benfordAudit: digits from the cents string; shares sum to 1; non-positive excluded") {
    val df = Seq(1.0, 1.5, 19.99, 2.0, 30.0, 0.0, -5.0, 9000.0)
      .toDF("v") // cents: 100,150,1999,200,3000,(0 out),(neg out),900000
    val out = Quality.benfordAudit(df, "v")
      .rows.map(r => r.head.asInstanceOf[Int] -> r(1).asInstanceOf[Long]).toMap
    out shouldBe Map(1 -> 3L, 2 -> 1L, 3 -> 1L, 9 -> 1L)
    val shares = Quality.benfordAudit(df, "v")
      .rows.map(_(2).asInstanceOf[Float]).sum
    shares shouldBe 1.0f +- 1e-6f
  }
}
