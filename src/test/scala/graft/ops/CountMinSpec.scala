package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val stream = Seq(
    "a", "a", "a", "a", "b", "b", "b", "c", "c", "d").toDF("tok")

  test("build: every depth row conserves total mass; weighted == replayed counts") {
    val cms = CountMin.build(stream, "tok", depth = 4, width = 16)
    val perRow = cms.groupBy("cms_row").agg(sum("cnt").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    perRow.keySet shouldBe Set(0, 1, 2, 3)
    perRow.values.foreach(_ shouldBe 10L)
    // weighted build over the pre-aggregated histogram lands on the
    // IDENTICAL sketch (sum of 1s == sum of counts per cell)
    val hist = stream.groupBy("tok").agg(count(lit(1)).as("n"))
    val cmsW = CountMin.build(hist, "tok", depth = 4, width = 16,
      weight = Some("n"))
    cms.rows.map(_.toString).sorted shouldBe cmsW.rows.map(_.toString).sorted
  }

  test("estimate: one-sided (>= exact), and 0 for keys with an untouched cell") {
    val cms = CountMin.build(stream, "tok", depth = 4, width = 16)
    val exact = Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L)
    val cand = (exact.keySet + "never_seen_key").toSeq.sorted.toDF("tok")
    val est = CountMin.estimate(cms, cand, "tok", depth = 4, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      withClue(s"$k: ") { est(k) should be >= n }
    }
    // 10 items across 4x16 cells: an absent key is overwhelmingly
    // likely to hit at least one empty cell in one of its 4 rows — but
    // the hard invariant is only one-sidedness at 0
    est("never_seen_key") should be >= 0L
  }

  test("deterministic: rebuilding yields the identical sketch") {
    val a = CountMin.build(stream, "tok", 4, 16).rows.map(_.toString).sorted
    val b = CountMin.build(stream, "tok", 4, 16).rows.map(_.toString).sorted
    a shouldBe b
  }

  test("merge: partition sketches sum to the monolithic sketch cell-for-cell") {
    val left = stream.filter(col("tok") < "c")
    val right = stream.filter(col("tok") >= "c")
    val merged = CountMin.merge(4, 16,
      CountMin.build(left, "tok", 4, 16), CountMin.build(right, "tok", 4, 16))
    val mono = CountMin.build(stream, "tok", 4, 16)
    merged.rows.map(_.toString).sorted shouldBe mono.rows.map(_.toString).sorted
    intercept[IllegalArgumentException] { CountMin.merge(4, 16) }
  }

  test("merge/innerProduct: a sketch of a different declared shape " +
    "fails loudly instead of summing unrelated cells") {
    val w16 = CountMin.build(stream, "tok", depth = 4, width = 16)
    val w8 = CountMin.build(stream, "tok", depth = 4, width = 8)
    // width-16 buckets reach 15; declared width 8 caps them at 7
    intercept[Exception] {
      CountMin.merge(4, 8, w16, w8).collect()
    }.getMessage should include("does not fit depth=4 width=8")
    intercept[Exception] {
      CountMin.innerProduct(w16, w8, 4, 8).collect()
    }.getMessage should include("does not fit depth=4 width=8")
    // and a frame that isn't a cell frame is rejected at plan-build time
    intercept[IllegalArgumentException] {
      CountMin.merge(4, 16, stream)
    }.getMessage should include("cms_row")
  }

  test("innerProduct: exact F2 with a collision-free width; one-sided when narrow") {
    // frequencies 4,3,2,1 → F2 = 16+9+4+1 = 30; width 1024 over 4 keys
    // makes a same-row collision overwhelmingly unlikely
    val wide = CountMin.build(stream, "tok", 4, 1024)
    CountMin.innerProduct(wide, wide, 4, 1024)
      .collect()(0).getLong(0) shouldBe 30L
    // width 2 forces collisions: the estimate can only move UP
    val narrow = CountMin.build(stream, "tok", 4, 2)
    CountMin.innerProduct(narrow, narrow, 4, 2)
      .collect()(0).getLong(0) should be >= 30L
    // cross product vs a disjoint stream: no shared key → some row may
    // still collide, but the bound stays ≥ the true 0
    val other = CountMin.build(Seq("x", "y").toDF("tok"), "tok", 4, 1024)
    CountMin.innerProduct(wide, other, 4, 1024)
      .collect()(0).getLong(0) should be >= 0L
  }

  test("null keys excluded; bad shapes and column clashes rejected") {
    val withNull = Seq(Some("a"), None, Some("b")).toDF("tok")
    CountMin.build(withNull, "tok", 2, 8)
      .agg(sum("cnt")).collect()(0).getLong(0) shouldBe 4L // 2 keys x 2 rows
    intercept[IllegalArgumentException] {
      CountMin.build(stream, "tok", 0, 8)
    }
    intercept[IllegalArgumentException] {
      CountMin.estimate(CountMin.build(stream, "tok", 2, 8),
        stream.withColumn("cnt", lit(1L)), "tok", 2, 8)
    }.getMessage should include("cnt")
  }
}
