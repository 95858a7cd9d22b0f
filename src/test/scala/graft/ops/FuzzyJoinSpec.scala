package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // block = first char; "smith"/"smyth" (dist 1) share block 's',
  // "smith"/"adams" never compared (different blocks),
  // "smith"/"smote" share 's' but dist 3 > maxDist
  private val people = Seq(
    (1L, "smith"), (2L, "smyth"), (3L, "smote"), (4L, "adams")
  ).toDF("pid", "name")

  test("blockedLevenshtein: block-local pairs within the edit budget") {
    val out = FuzzyJoin.blockedLevenshtein(people, "pid", "name",
        block = substring(col("name"), 1, 1), maxDist = 1)
      .orderBy("id_a", "id_b").rows.map(r => (r(0), r(1), r(2)))
    out shouldBe Seq((1L, 2L, 1L))
  }

  test("blockedLevenshtein: identical strings pair at distance 0") {
    val dup = Seq((1L, "same"), (2L, "same")).toDF("pid", "name")
    val out = FuzzyJoin.blockedLevenshtein(dup, "pid", "name",
      block = substring(col("name"), 1, 1), maxDist = 0).rows
    out shouldBe Seq(Seq(1L, 2L, 0L))
  }

  test("blockedLevenshtein: oversize blocks are dropped, not exploded") {
    val flood = (1L to 10L).map(i => (i, s"name$i")).toDF("pid", "name")
    val out = FuzzyJoin.blockedLevenshtein(flood, "pid", "name",
      block = lit("all"), maxDist = 5, maxBlock = 5)
    out.rows shouldBe Seq() // single 10-member block > cap → no pairs
    an[IllegalArgumentException] should be thrownBy
      FuzzyJoin.blockedLevenshtein(flood, "pid", "name", lit("x"), -1)
  }

  test("droppedBlocks surfaces exactly what the cap excludes") {
    // 10-member 'all' block trips maxBlock=5; the 4-member name blocks
    // of `people` never do
    val flood = (1L to 10L).map(i => (i, s"name$i")).toDF("pid", "name")
    FuzzyJoin.droppedBlocks(flood, lit("all"), maxBlock = 5)
      .rows.map(r => (r(0), r(1))) shouldBe Seq(("all", 10L))
    FuzzyJoin.droppedBlocks(people,
      substring(col("name"), 1, 1), maxBlock = 5).rows shouldBe Seq()
  }
}
