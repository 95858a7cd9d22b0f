package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC serving-layer I/O (reference: Postgres warehouse).
  *
  * Maps the reference's four JDBC patterns (scripts/load_stock_metrics.py:89,
  * scripts/load_sp500.py:51, scripts/transform.py:39-44,
  * scripts/ingest_hourly.py:48-53) onto Spark's JDBC source. Watermark
  * reads push the aggregate into the database via a pushdown subquery —
  * only the scalar/grouped result crosses the wire, exactly like the
  * reference's `SELECT MAX(date)`.
  *
  * Untested in-container (no database available; zero egress) — the API
  * shape is the deliverable; the same logic is exercised against parquet
  * serving tables in the pipeline tests.
  */
object Jdbc {

  def props(user: String, password: String, driver: String = "org.postgresql.Driver"): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", driver)
    p
  }

  /** Full-table analytical read (reference: scripts/app.py:34-44). */
  def readTable(spark: SparkSession, url: String, table: String, p: Properties): DataFrame =
    spark.read.jdbc(url, table, p)

  /** Pushdown query read — the database computes, Spark receives
    * (reference watermark reads: scripts/ingest_hourly.py:48-53). */
  def readQuery(spark: SparkSession, url: String, sql: String, p: Properties): DataFrame =
    spark.read.jdbc(url, s"($sql) AS pushed", p)

  /** Global high-watermark: MAX(ord) pushed down to the database. */
  def watermark(spark: SparkSession, url: String, table: String, ord: String,
                p: Properties): DataFrame =
    readQuery(spark, url, s"SELECT MAX($ord) AS latest_$ord FROM $table", p)

  /** Incremental append (reference: load_stock_metrics.py:89). */
  def append(df: DataFrame, url: String, table: String, p: Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, p)

  /** Full refresh (reference: load_sp500.py:51 `if_table_exists='replace'`). */
  def replace(df: DataFrame, url: String, table: String, p: Properties): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, p)
}
