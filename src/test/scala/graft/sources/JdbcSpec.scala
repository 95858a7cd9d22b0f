package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime integration test of the JDBC serving layer against embedded
  * Derby (`jdbc:derby:memory:...` — in-JVM, the derby jars ship with
  * Spark). Exercises the same Spark JDBC read/write codepath a Postgres
  * warehouse would use; only the dialect differs.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft;create=true"
  private val p = Jdbc.derbyProps()

  test("append + readTable round-trip (reference: incremental metric load)") {
    val df = Seq((1L, "AAPL", 101.5), (2L, "MSFT", 99.0))
      .toDF("id", "ticker", "price")
    Jdbc.append(df, url, "metrics_rt", p)
    Jdbc.append(Seq((3L, "GOOG", 55.5)).toDF("id", "ticker", "price"),
      url, "metrics_rt", p)

    val back = Jdbc.readTable(spark, url, "metrics_rt", p)
    back.count() shouldBe 3
    back.orderBy("id").select("ticker").rows.map(_.head) shouldBe
      Seq("AAPL", "MSFT", "GOOG")
  }

  test("replace is a full refresh (reference: sp500 seed reload)") {
    Jdbc.append(Seq((1L, "old")).toDF("id", "v"), url, "seed_rt", p)
    Jdbc.replace(Seq((10L, "new_a"), (11L, "new_b")).toDF("id", "v"),
      url, "seed_rt", p)
    val back = Jdbc.readTable(spark, url, "seed_rt", p)
    back.count() shouldBe 2
    back.orderBy("id").select("v").rows.map(_.head) shouldBe Seq("new_a", "new_b")
  }

  test("watermark pushes MAX into the database and returns the scalar") {
    val df = Seq((1L, 10L), (2L, 42L), (3L, 7L)).toDF("id", "version")
    Jdbc.replace(df, url, "wm_rt", p)
    val wm = Jdbc.watermark(spark, url, "wm_rt", "version", p)
    wm.columns.map(_.toLowerCase).toSeq shouldBe Seq("latest_version")
    wm.rows.head.head shouldBe 42L
  }

  test("readQuery pushes an arbitrary aggregate down") {
    Jdbc.replace(Seq((1L, 2.0), (2L, 3.0)).toDF("id", "x"), url, "q_rt", p)
    // caller-authored SQL quotes identifiers the way Spark's DDL created
    // them (case-preserved)
    val r = Jdbc.readQuery(spark, url,
      """SELECT COUNT(*) AS "n", SUM("x") AS "total" FROM q_rt""", p)
    r.rows.head shouldBe Seq(2L, 5.0)
  }

  test("quoteIdent rejects injection-shaped identifiers") {
    Jdbc.quoteIdent("stock_metrics") shouldBe "\"stock_metrics\""
    Jdbc.quoteIdent("analytics.stock_metrics") shouldBe "\"analytics\".\"stock_metrics\""
    an[IllegalArgumentException] should be thrownBy
      Jdbc.quoteIdent("metrics; DROP TABLE users")
    an[IllegalArgumentException] should be thrownBy Jdbc.quoteIdent("a-b")
    an[IllegalArgumentException] should be thrownBy Jdbc.quoteIdent("")
  }
}
