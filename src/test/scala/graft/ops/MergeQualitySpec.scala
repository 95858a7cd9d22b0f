package graft.ops

import org.apache.spark.sql.types._

import graft.SparkSpec

class MergeQualitySpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq(("A", 1, "old1"), ("A", 2, "old2"), ("B", 1, "old3"))
    .toDF("k", "t", "payload")
  private val incoming = Seq(("A", 2, "new2"), ("A", 2, "new2dup"), ("C", 1, "new4"))
    .toDF("k", "t", "payload")

  test("watermarks + incrementalFilter: unknown keys pass, stale rows drop") {
    val wm = Merge.watermarks(existing, "k", "t")
    val out = Merge.incrementalFilter(
      Seq(("A", 1, "stale"), ("A", 3, "fresh"), ("C", 1, "newkey")).toDF("k", "t", "payload"),
      wm, "k", "t").orderBy("k").select("payload").rows.map(_.head)
    out shouldBe Seq("fresh", "newkey")
  }

  test("upsert: incoming replaces colliding keys; deterministic dedup survivor") {
    val out = Merge.upsert(existing, incoming, Seq("k", "t"), tiebreak = "payload")
      .orderBy("k", "t").rows
    out shouldBe Seq(
      Seq("A", 1, "old1"), Seq("A", 2, "new2dup"),   // max payload survives
      Seq("B", 1, "old3"), Seq("C", 1, "new4"))
  }

  test("upsert is idempotent: applying the same batch twice changes nothing") {
    val once = Merge.upsert(existing, incoming, Seq("k", "t"), "payload")
    val twice = Merge.upsert(once, incoming, Seq("k", "t"), "payload")
    twice.orderBy("k", "t").rows shouldBe once.orderBy("k", "t").rows
  }

  test("joinViewDelta: V ∪ ΔV equals the full recompute, including the ΔA⋈ΔB corner") {
    // key 3 exists ONLY as new-order × new-customer — the pair a naive
    // ΔA⋈B_old ∪ A_old⋈ΔB misses entirely
    val aOld = Seq((1, "o1"), (2, "o2")).toDF("k", "a")
    val aDelta = Seq((1, "o3"), (3, "o4")).toDF("k", "a")
    val bOld = Seq((1, "c1")).toDF("k", "b")
    val bDelta = Seq((2, "c2"), (3, "c3")).toDF("k", "b")
    val vOld = aOld.join(bOld, Seq("k"))
    val maintained = vOld.unionByName(
        Merge.joinViewDelta(aOld, aDelta, bOld, bDelta, Seq("k")))
      .orderBy("k", "a", "b").rows
    val recompute = aOld.unionByName(aDelta)
      .join(bOld.unionByName(bDelta), Seq("k"))
      .orderBy("k", "a", "b").rows
    maintained shouldBe recompute
    recompute.map(_.head) shouldBe Seq(1, 1, 2, 3) // the ΔΔ pair is in
  }

  test("profile: exact per-column counts in long form") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), None),
      (3L, None, Some(2.0))
    ).toDF("id", "s", "v")
    val out = Quality.profile(df, Seq("s", "v")).orderBy("col_name").rows
      .map(r => (r(0), r(1), r(2), r(3)))
    // count(DISTINCT) excludes nulls in both engines
    out shouldBe Seq(("s", 3L, 1L, 1L), ("v", 3L, 1L, 2L))
    an[IllegalArgumentException] should be thrownBy
      Quality.profile(df, Seq("nope"))
    an[IllegalArgumentException] should be thrownBy
      Quality.profile(df, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Quality.profile(df, Seq("v", "v"))
  }

  test("quality gate: structural violations reported before scan") {
    val df = Seq((1, "x")).toDF("a", "b")
    val expected = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType),
      StructField("missing", DoubleType)))
    val Left(vs) = Quality.check(df, expected, Seq("a")): @unchecked
    vs.map(_.getClass.getSimpleName).toSet shouldBe Set("MissingColumn", "TypeMismatch")
  }

  test("quality gate: null critical column → Left, clean frame → Right") {
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val bad = Seq((null.asInstanceOf[Integer], "x"), (Integer.valueOf(1), "y"))
      .toDF("a", "b")
    Quality.check(bad, schema, Seq("a")).isLeft shouldBe true
    val good = Seq((Integer.valueOf(1), "y")).toDF("a", "b")
    Quality.check(good, schema, Seq("a")).isRight shouldBe true
  }

  test("mergeAggregates: insert, passthrough, combine — and null algebra") {
    import org.apache.spark.sql.functions.col
    // mv: groups g1 (count 2, sum 10, max 5), g2 (count 1, sum null, max null)
    val mv = Seq(("g1", 2L, Some(10L), Some(5L)), ("g2", 1L, None, None))
      .toDF("g", "n", "s", "mx")
    // delta: g1 combines, g3 inserts; g2 absent → passthrough
    val delta = Seq(("g1", 1L, Some(7L), Some(9L)), ("g3", 4L, Some(1L), Some(2L)))
      .toDF("g", "n", "s", "mx")
    val out = Merge.mergeAggregates(mv, delta, Seq("g"),
      Map("n" -> "count", "s" -> "sum", "mx" -> "max"))
    out.orderBy(col("g")).rows shouldBe Seq(
      Seq("g1", 3L, 17L, 9L),
      Seq("g2", 1L, null, null),   // null sum/max survive passthrough
      Seq("g3", 4L, 1L, 2L))
  }

  test("mergeAggregates matches the full recompute; avg is rejected") {
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    val rows = (1L to 100L).map(i => (s"g${i % 7}", i)).toDF("g", "v")
    val (base, delta) = (rows.filter(col("v") <= 60), rows.filter(col("v") > 60))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
    val maintained = Merge.mergeAggregates(agg(base), agg(delta), Seq("g"),
      Map("n" -> "count", "s" -> "sum", "mx" -> "max"))
    maintained.orderBy("g").rows shouldBe agg(rows).orderBy("g").rows
    val e = intercept[IllegalArgumentException] {
      Merge.mergeAggregates(agg(base), agg(delta), Seq("g"),
        Map("n" -> "count", "s" -> "avg", "mx" -> "max"))
    }
    e.getMessage should include("non-distributive")
  }

  test("expectations: row rules, null-as-violation, uniqueness, referential integrity") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(10.0), Some(100L)),
      (2L, Some(-5.0), Some(200L)),   // range violation
      (3L, None, Some(100L)),         // null value → violation of the range rule
      (3L, Some(20.0), Some(999L)),   // dup id + dangling fk
      (4L, Some(30.0), None)          // null fk → NOT a ref violation
    ).toDF("id", "v", "fk")
    val dim = Seq(100L, 200L).toDF("pk")
    val out = Quality.expectations(df,
        rowRules = Seq("v_non_negative" -> (col("v") < 0)),
        uniqueKeys = Seq("id_unique" -> Seq("id")),
        refIntegrity = Seq(("fk_in_dim", dim, "fk", "pk")))
      .orderBy("rule")
      .rows.map(r => (r.head, r(1), r(2)))
    out shouldBe Seq(
      ("fk_in_dim", 1L, false),
      ("id_unique", 1L, false),
      ("v_non_negative", 2L, false))
  }

  test("expectations: clean table passes every rule; duplicate rule names rejected") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val out = Quality.expectations(df,
        rowRules = Seq("v_pos" -> (col("v") <= 0)),
        uniqueKeys = Seq("id_unique" -> Seq("id")))
      .rows.map(r => r(2))
    out shouldBe Seq(true, true)
    an[IllegalArgumentException] should be thrownBy
      Quality.expectations(df, rowRules = Seq(
        "r" -> (col("v") <= 0), "r" -> (col("v") > 1e9)))
  }

  test("ksDrift: hand-computed ECDF gap; identical snapshots → 0") {
    import org.apache.spark.sql.functions.col
    val base = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    // union {1..6}: F1 = .25,.5,.75,1,1,1; F2 = 0,0,.25,.5,.75,1 → max gap .5
    val out = Quality.ksDrift(base, cur, "v").rows.head
    out.head.asInstanceOf[Float] shouldBe 0.5f +- 1e-7f
    out(1) shouldBe 4L
    out(2) shouldBe 4L
    Quality.ksDrift(base, base, "v").rows.head.head
      .asInstanceOf[Float] shouldBe 0.0f
    // nulls carry no mass on either side
    val withNull = Seq(Some(1.0), None).toDF("v")
    Quality.ksDrift(withNull, withNull, "v").rows.head(1) shouldBe 1L
  }

  test("cvmDrift: hand-computed squared-gap sum; identical snapshots → 0") {
    val base = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    // gaps over {1..6}: .25,.5,.5,.5,.25,0, each value carries 1 pooled
    // observation except v∈{3,4} (2 each) → Σ(c1+c2)·gap² =
    // .0625+.25+2·.25+2·.25+.0625+0 = 1.375; T = 16/64 · 1.375 = .34375
    val out = Quality.cvmDrift(base, cur, "v").rows.head
    out.head.asInstanceOf[Float] shouldBe 0.34375f +- 1e-6f
    out(1) shouldBe 4L
    out(2) shouldBe 4L
    Quality.cvmDrift(base, base, "v").rows.head.head
      .asInstanceOf[Float] shouldBe 0.0f
  }

  test("psiDrift: identical mixtures → 0; one-sided bucket contributes finitely") {
    import org.apache.spark.sql.functions.col
    val base = Seq("en", "en", "de", "fr").toDF("lang")
    val same = Quality.psiDrift(base, base, "lang")
      .rows.map(r => r(3).asInstanceOf[Float])
    all(same) shouldBe 0.0f // p == q exactly per bucket
    // "zh" appears ONLY in current: add-1 smoothing keeps its ln finite,
    // and the drifted mixture totals strictly above zero
    val cur = Seq("en", "zh", "zh", "zh").toDF("lang")
    val out = Quality.psiDrift(base, cur, "lang")
      .orderBy(col("lang"))
      .rows.map(r => (r.head, r(1), r(2), r(3).asInstanceOf[Float], r(4).asInstanceOf[Float]))
    out.map(t => (t._1, t._2, t._3)) shouldBe Seq(
      ("de", 1L, 0L), ("en", 2L, 1L), ("fr", 1L, 0L), ("zh", 0L, 3L))
    all(out.map(_._4.isNaN)) shouldBe false
    out.map(_._5).distinct.size shouldBe 1 // total repeats on every row
    out.head._5 should be > 0.25f // classic "shifted" threshold
    // hand-check one term: B = 4 buckets, "zh": p = 1/8, q = 4/8
    val zh = out.find(_._1 == "zh").get._4
    zh shouldBe (((1.0 / 8) - (4.0 / 8)) * math.log((1.0 / 8) / (4.0 / 8))).toFloat +- 1e-7f
    // nulls carry no mass
    val withNull = Seq(Some("en"), None, Some("de")).toDF("lang")
    Quality.psiDrift(withNull, withNull, "lang").rows.length shouldBe 2
  }

  test("jsdDrift: identical mixtures → 0; bounded by ln 2; hand-computed bucket") {
    import org.apache.spark.sql.functions.col
    val base = Seq("en", "en", "de", "fr").toDF("lang")
    val same = Quality.jsdDrift(base, base, "lang")
      .rows.map(r => r(3).asInstanceOf[Float])
    all(same) shouldBe 0.0f // p == q per bucket → both KL halves vanish
    val cur = Seq("zh", "zh", "zh", "zh").toDF("lang")
    val out = Quality.jsdDrift(base, cur, "lang").orderBy(col("lang"))
      .rows.map(r => (r.head, r(3).asInstanceOf[Float], r(4).asInstanceOf[Float]))
    // hand-computed "zh" contribution with add-1 over 4 union buckets:
    // p = 1/8, q = 5/8 → ½(p·ln(2p/(p+q)) + q·ln(2q/(p+q)))
    val p = 1.0 / 8; val q = 5.0 / 8
    val zh = (0.5 * (p * math.log(2 * p / (p + q)) +
      q * math.log(2 * q / (p + q)))).toFloat
    out.find(_._1 == "zh").get._2 shouldBe zh +- 1e-7f
    // a TOTAL mixture replacement saturates near (never past) ln 2
    val total = out.head._3
    total should be > 0.0f
    total should be <= math.log(2.0).toFloat + 1e-6f
    out.map(_._3).distinct.size shouldBe 1
  }

  test("groupEntropy: uniform mixture hits ln(B); single-source group is 0; nulls drop") {
    val df = Seq(
      ("en", Some("web")), ("en", Some("книги")), // uniform over 2 → ln 2
      ("de", Some("web")), ("de", Some("web")),   // one bucket → 0
      ("fr", Some("web")), ("fr", None)           // null bucket excluded
    ).toDF("lang", "source")
    val out = Quality.groupEntropy(df, "lang", "source")
      .rows.map(r => r.head -> (r(1).asInstanceOf[Float], r(2), r(3))).toMap
    out("en")._1 shouldBe math.log(2.0).toFloat +- 1e-7f
    out("en")._2 shouldBe 2L
    out("de") shouldBe ((0.0f, 1L, 2L))
    out("fr") shouldBe ((0.0f, 1L, 1L)) // the null row never counted
  }

  test("referentialOrphans: counts children pointing at missing parents; null keys excluded") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(7L), None).toDF("pk")
    val parent = Seq(1L, 2L, 3L).toDF("id")
    val out = Quality.referentialOrphans(child, "pk", parent, "id", "c->p")
      .rows.head
    out shouldBe Seq("c->p", 4L, 1L)
  }
}
