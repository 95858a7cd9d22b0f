package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (1 to 200).map(i => s"k$i").toDF("k")

  test("build: hand-computed registers for a known key") {
    // replicate the hash chain in the JVM and check one register
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hll:k1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val expectedReg = h % 256
    val v = h >> 8
    val expectedRank =
      if (v == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(v))
    val sk = Hll.build(Seq("k1").toDF("k"), "k", b = 8).collect()
    sk.length shouldBe 1
    sk(0).getLong(0) shouldBe expectedReg
    sk(0).getInt(1) shouldBe expectedRank
  }

  test("estimate: within 25% of truth on 200 distinct keys, and " +
    "duplicate-insensitive (cardinality, not frequency)") {
    val est = Hll.estimate(Hll.build(keys, "k", b = 8), b = 8)
      .collect()(0).getFloat(0)
    est.toDouble shouldBe 200.0 +- 50.0
    // duplicating every key 7x cannot move a distinct-count sketch
    val dup = keys.crossJoin((1 to 7).toDF("r")).select("k")
    Hll.estimate(Hll.build(dup, "k", b = 8), b = 8)
      .collect()(0).getFloat(0) shouldBe est
  }

  test("merge: partition sketches combine to the monolithic sketch " +
    "register-for-register, and estimate to the same value") {
    val left = keys.filter(col("k") < "k5")
    val right = keys.filter(col("k") >= "k5")
    val merged = Hll.merge(Hll.build(left, "k", 8), Hll.build(right, "k", 8))
    val mono = Hll.build(keys, "k", 8)
    merged.rows.map(_.toString).sorted shouldBe
      mono.rows.map(_.toString).sorted
    Hll.estimate(merged, 8).collect()(0).getFloat(0) shouldBe
      Hll.estimate(mono, 8).collect()(0).getFloat(0)
  }

  test("estimateByGroup: per-group estimates equal per-slice global estimates") {
    val tagged = keys.withColumn("g",
      when(col("k") < "k5", "a").otherwise("b"))
    val sk = tagged.select(col("g"),
        Hll.registerOf(col("k"), 8).as("hll_register"),
        Hll.rankOf(col("k"), 8).as("hll_rank"))
      .groupBy("g", "hll_register").agg(max("hll_rank").as("hll_rank"))
    val grouped = Hll.estimateByGroup(sk, 8, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getFloat(1)).toMap
    def solo(pred: org.apache.spark.sql.Column) =
      Hll.estimate(Hll.build(keys.filter(pred), "k", 8), 8)
        .collect()(0).getFloat(0)
    grouped("a") shouldBe solo(col("k") < "k5")
    grouped("b") shouldBe solo(col("k") >= "k5")
  }

  test("empty input estimates 0 via the linear-counting branch") {
    val row = Hll.estimate(
      Hll.build(keys.filter(lit(false)), "k", b = 8), b = 8).collect()(0)
    row.getFloat(0) shouldBe 0.0f
    row.getLong(2) shouldBe 256L
    row.getBoolean(3) shouldBe true
  }

  test("null keys carry no evidence; bad b rejected; deterministic") {
    val withNull = Seq(Some("a"), None).toDF("k")
    Hll.build(withNull, "k", 8).count() shouldBe 1L
    intercept[IllegalArgumentException] { Hll.build(keys, "k", 3) }
    intercept[IllegalArgumentException] { Hll.build(keys, "k", 17) }
    val a = Hll.build(keys, "k", 8).rows.map(_.toString).sorted
    val b = Hll.build(keys, "k", 8).rows.map(_.toString).sorted
    a shouldBe b
  }
}
