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
    val merged = Hll.merge(8, Hll.build(left, "k", 8), Hll.build(right, "k", 8))
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

  test("merge: a sketch built with a different b fails loudly, " +
    "never estimates garbage") {
    // b=8 registers reach 255; declared b=6 caps them at 63 → the
    // row-wise shape guard raises on action instead of silently
    // max-merging registers from incompatible layouts
    val wide = Hll.build(keys, "k", b = 8)
    val narrow = Hll.build(keys, "k", b = 6)
    val ex = intercept[Exception] {
      Hll.merge(6, wide, narrow).collect()
    }
    ex.getMessage should include("does not fit b=6")
    // and a frame that isn't a register frame at all is rejected at
    // plan-build time
    intercept[IllegalArgumentException] {
      Hll.merge(8, keys)
    }.getMessage should include("hll_register")
  }

  test("estimateByGroup: un-reduced input (sketch appended twice) " +
    "estimates identically to the reduced sketch") {
    val sk = Hll.build(keys, "k", b = 8)
    val doubled = sk.unionByName(sk) // a re-run lake append
    Hll.estimate(doubled, 8).collect()(0).getFloat(0) shouldBe
      Hll.estimate(sk, 8).collect()(0).getFloat(0)
  }

  test("small-m bias constants: alpha_16/32/64 below the m >= 128 " +
    "formula regime") {
    Hll.alphaFor(16L) shouldBe 0.673
    Hll.alphaFor(32L) shouldBe 0.697
    Hll.alphaFor(64L) shouldBe 0.709
    Hll.alphaFor(128L) shouldBe 0.7213 / (1.0 + 1.079 / 128.0) +- 1e-15
    // and the b=6 estimate actually rides the constant: replay the
    // raw formula against the engine's registers
    val smallKeys = (1 to 500).map(i => s"s$i").toDF("k")
    val sk = Hll.build(smallKeys, "k", b = 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rmax = sk.values.max
    val zobs = sk.values.map(r => 1L << (rmax - r)).sum
    val znum = zobs + (64 - sk.size) * (1L << rmax)
    val raw = 0.709 * 64.0 * 64.0 * math.pow(2.0, rmax) / znum.toDouble
    val expected =
      if (raw <= 2.5 * 64.0 && sk.size < 64)
        64.0 * math.log(64.0 / (64 - sk.size)) else raw
    Hll.estimate(Hll.build(smallKeys, "k", b = 6), b = 6)
      .collect()(0).getFloat(0) shouldBe expected.toFloat
  }

  test("documented error band: the b=8 estimate lands within 3 sigma " +
    "(3 * 1.04 / sqrt(256) = 19.5%) of a known cardinality") {
    val n = 10000
    val big = (1 to n).map(i => s"band$i").toDF("k")
    val est = Hll.estimate(Hll.build(big, "k", b = 8), b = 8)
      .collect()(0).getFloat(0).toDouble
    math.abs(est - n) / n should be < (3.0 * 1.04 / math.sqrt(256.0))
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
