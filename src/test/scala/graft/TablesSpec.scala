package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events `ts` normalization shim ([[Tables.normalizeEventTs]]) is
  * the single point every events query relies on since the lake's
  * on-disk flavor changed (INT64 nanos through r7, microsecond
  * timestamp from r8). Pin both flavors to the same nanos-Long
  * contract so a future schema generation fails here, loudly, instead
  * of as 40 analysis errors. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val nanos = 1704067200123456000L // 2024-01-01 00:00:00.123456 UTC

  test("normalizeEventTs: µs-timestamp and nanos-Long lakes read identically") {
    val dir = Files.createTempDirectory("evts").toString
    // the r8+ flavor: a TIMESTAMP_NTZ column at microsecond precision
    Seq(Tuple2(1L, java.time.LocalDateTime.parse("2024-01-01T00:00:00.123456")))
      .toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val readBack = Tables.events(spark, dir)
    readBack.schema("ts").dataType shouldBe LongType
    val row = readBack.select("ts", "ts_utc").rows.head
    row.head shouldBe nanos
    row(1).toString shouldBe "2024-01-01 00:00:00.123456"

    // the ≤ r7 flavor (and every test-built frame): LongType passes
    // through untouched, bit-for-bit
    val legacy = Seq((1L, nanos)).toDF("event_id", "ts")
    Tables.normalizeEventTs(legacy).select("ts").rows.head.head shouldBe nanos
  }

  test("normalizeEventTs: NTZ interpretation is pinned to UTC, not box-local time") {
    // the session's UTC zone makes naive-timestamp → instant the same
    // mapping DuckDB's epoch_ns uses; a drifted session would shift
    // every derived nano — assert the session invariant the shim
    // depends on
    spark.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
  }
}
