package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinWithBloom ≡ plain left-semi join; probe cuts the big side first") {
    val big = (1L to 5000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(7L, 42L, 999L, 4321L, 4321L).toDF("sk") // dup keys too
    val out = RuntimeFilter.semiJoinWithBloom(big, small, "k", "sk")
    val plain = big.join(small, col("k") === col("sk"), "left_semi")
    out.orderBy("k").rows shouldBe plain.orderBy("k").rows
    // the sketch alone (before the exact join) must already reject the
    // overwhelming majority of the 5000 non-matching rows at fpp=1%
    val bytes = RuntimeFilter.bloomFor(small, "sk")
    val survivors = big.filter(RuntimeFilter.mightContain(col("k"), bytes)).count()
    survivors should be >= 4L      // no false negatives, ever
    survivors should be < 200L     // ~1% fp on 5k rows, generous bound
  }

  test("string keys probe through UTF-8; null keys are rejected; SQL surface works") {
    val big = Seq(Some("alpha"), Some("beta"), Some("gamma"), None).toDF("s")
    val small = Seq("beta", "delta").toDF("s2")
    val bytes = RuntimeFilter.bloomFor(small, "s2")
    val kept = big.filter(RuntimeFilter.mightContain(col("s"), bytes))
      .rows.map(_.head)
    kept should contain("beta")
    kept should not contain (null) // null-rejecting probe
    // registered SQL function evaluates the same probe (hex binary literal)
    GraftFunctions.register(spark)
    big.createOrReplaceTempView("bloom_probe_t")
    val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
    val viaSql = spark.sql(
      s"SELECT s FROM bloom_probe_t WHERE might_contain_bloom(s, X'$hex')")
      .rows.map(_.head)
    viaSql.toSet shouldBe kept.toSet
  }

  test("malformed filter bytes fail analysis loudly") {
    val df = Seq(1L).toDF("k")
    val e = intercept[Exception] {
      df.filter(GraftFunctions.mightContainBloom(col("k"), Array[Byte](1, 2, 3)))
        .collect()
    }
    e.getMessage.toLowerCase should include("might_contain_bloom")
  }
}
