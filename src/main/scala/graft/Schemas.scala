package graft

import org.apache.spark.sql.types._

/** Canonical schemas for the engine.
  *
  * Stock-domain schemas mirror the reference's asserted schema
  * (reference: scripts/transform.py:82-87, scripts/ingest_backfill_sp500.py:29-32),
  * re-expressed as Spark StructTypes. The reference stores `date` as a
  * midnight-valued datetime; we keep TimestampType for fidelity with the
  * oracle comparisons and the reference's DQ gate.
  */
object Schemas {

  /** Raw-zone OHLCV bar (reference: scripts/transform.py:82-87). */
  val stockBarsRaw: StructType = StructType(Seq(
    StructField("date", TimestampType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("ticker", StringType, nullable = false),
    StructField("ingest_ts", TimestampType),
    StructField("adj_close", DoubleType)
  ))

  /** Enriched-zone metrics = raw minus adj_close plus derived columns
    * (reference: scripts/transform.py:67-76, scripts/load_stock_metrics.py:82). */
  val stockMetrics: StructType = StructType(
    stockBarsRaw.fields.filterNot(_.name == "adj_close") ++ Seq(
      StructField("daily_return", DoubleType),
      StructField("rolling_vol_30d", DoubleType)
    ))

  /** Dimension table (reference: scripts/ingest_backfill_sp500.py:29-32). */
  val sp500Companies: StructType = StructType(Seq(
    StructField("ticker_symbol", StringType, nullable = false),
    StructField("security_name", StringType),
    StructField("gics_sector", StringType),
    StructField("gics_sub_industry", StringType)
  ))

  /** Warehouse watermark (reference: scripts/load_stock_metrics.py:40-49). */
  val latestDates: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("latest_date", TimestampType)
  ))

  /** Driver events table in the engine's NORMALIZED form: `ts` is
    * nanos-since-epoch LongType regardless of the on-disk flavor
    * (INT64 TIMESTAMP_NANOS or microsecond timestamp — see
    * [[graft.Tables.normalizeEventTs]]). */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Driver documents table (LLM-pipeline extension inputs). */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** Driver embeddings table. */
  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))
}
