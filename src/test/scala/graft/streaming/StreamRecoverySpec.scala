package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Checkpoint RESTART/RECOVERY — the one Structured Streaming production
  * behavior a long-lived pipeline leans on hardest: a stream stops (crash,
  * deploy, scale event), restarts from its checkpoint dir, and must (a)
  * not re-emit what it already committed, (b) pick up exactly the data
  * that arrived while it was down, and (c) carry its STATE — open
  * windows, watermark — across the gap, not just its source offsets.
  *
  * Each test is a stop/start pair of `Trigger.AvailableNow` runs over a
  * growing file-source directory: run 1 drains file A to completion and
  * stops (a clean shutdown — a mid-batch kill recovers through the same
  * offset/commit log, it just replays the uncommitted batch), file B
  * lands while the stream is "down", run 2 restarts from the same
  * checkpoint. Assertions read the sink, which is the contract the
  * downstream consumer sees.
  */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("restart from checkpoint: committed rows stay, down-time arrivals land exactly once") {
    val dir = Files.createTempDirectory("recov_sink").toString
    val src = s"$dir/src"; val sink = s"$dir/lake"; val ckpt = s"$dir/ckpt"
    Files.createDirectory(Paths.get(src))
    val schema = Seq((ts("2024-01-01 10:00:00"), "click", 1.0))
      .toDF("ts_utc", "event_type", "value").schema

    // run 1: file A only
    Seq((ts("2024-01-01 10:00:00"), "click", 1.0),
        (ts("2024-01-02 11:00:00"), "view", 2.0))
      .toDF("ts_utc", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    val stream1 = EventStreams.fromParquetDir(spark, src, schema)
      .withColumn("day", to_date(col("ts_utc")))
    EventStreams.toLake(stream1, sink, ckpt, Seq("day")).awaitTermination()
    spark.read.parquet(sink).count() shouldBe 2

    // stream is down; file B arrives
    Seq((ts("2024-01-03 12:00:00"), "click", 4.0))
      .toDF("ts_utc", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)

    // run 2: fresh query object, SAME checkpoint — offset log must skip
    // file A (its rows appear once, not twice) and drain exactly file B
    val stream2 = EventStreams.fromParquetDir(spark, src, schema)
      .withColumn("day", to_date(col("ts_utc")))
    EventStreams.toLake(stream2, sink, ckpt, Seq("day")).awaitTermination()

    val out = spark.read.parquet(sink)
    out.count() shouldBe 3
    out.groupBy("ts_utc").count().filter(col("count") > 1).count() shouldBe 0
    out.filter(col("value") === 4.0).count() shouldBe 1
  }

  test("restart recovers windowed STATE: a window spanning the restart emits once, complete") {
    val dir = Files.createTempDirectory("recov_state").toString
    val src = s"$dir/src"; val sink = s"$dir/lake"; val ckpt = s"$dir/ckpt"
    Files.createDirectory(Paths.get(src))
    val schema = Seq((ts("2024-01-01 10:00:00"), "click", 1.0))
      .toDF("ts_utc", "event_type", "value").schema
    def agg(s: org.apache.spark.sql.DataFrame) =
      EventStreams.tumblingAgg(s, windowLen = "1 hour", lateness = "10 minutes")

    // run 1: two events close the 10:00 window (13:00 advances the
    // watermark past it) and leave the 13:00 window OPEN in the state
    // store when the stream stops
    Seq((ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:50:00"), "click", 2.0),
        (ts("2024-01-01 13:00:00"), "click", 8.0))
      .toDF("ts_utc", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    EventStreams.toLake(
      agg(EventStreams.fromParquetDir(spark, src, schema)),
      sink, ckpt, Seq.empty).awaitTermination()
    val afterRun1 = spark.read.parquet(sink)
      .select("window_start", "n_events", "sum_value").rows
    afterRun1 shouldBe Seq(Seq(ts("2024-01-01 10:00:00"), 2L, 3.0))

    // down-time arrivals: one more event INTO the open 13:00 window,
    // plus one far ahead that closes it on restart
    Seq((ts("2024-01-01 13:05:00"), "click", 16.0),
        (ts("2024-01-01 16:00:00"), "click", 0.0))
      .toDF("ts_utc", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)

    // run 2 reads ONLY file B — the 13:00 window's run-1 event exists
    // nowhere but in the recovered state store, so n_events=2 proves
    // state (not just offsets) survived the restart
    EventStreams.toLake(
      agg(EventStreams.fromParquetDir(spark, src, schema)),
      sink, ckpt, Seq.empty).awaitTermination()
    val out = spark.read.parquet(sink)
      .select("window_start", "n_events", "sum_value")
      .orderBy("window_start").rows
    out shouldBe Seq(
      Seq(ts("2024-01-01 10:00:00"), 2L, 3.0),   // emitted once, in run 1
      Seq(ts("2024-01-01 13:00:00"), 2L, 24.0))  // run-1 event + run-2 event
  }

  test("restart recovers CUSTOM GroupState: the cusum fold carries across the gap") {
    // flatMapGroupsWithState keeps its fold in the state store — a
    // restart must resume the statistic, not restart it. Run 2 reads
    // ONLY file B, so n_events=3 with the carried S+ proves the
    // recovered CusumFold (not reprocessing) supplied events 1–2.
    import EventStreams.CusumEvent
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("recov_cusum").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"; val sink = s"$dir/sink"
    Files.createDirectory(Paths.get(src))
    // memory sinks refuse checkpoint recovery; a foreachBatch parquet
    // append is the restart-capable update-mode sink shape
    def run(): Unit = {
      val stream = spark.readStream
        .schema(Seq(CusumEvent(1L, ts("2024-01-01 10:00:00"), 1L, 1L, 1L))
          .toDS().schema)
        .parquet(src).as[CusumEvent]
      val q = EventStreams.streamingCusum(stream, targetCents = 100L)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStreams.CusumRow],
                         _: Long) =>
          df.write.mode("append").parquet(sink); ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def latest() = spark.read.parquet(sink)
      .orderBy(col("n_events").desc)
      .select("user_id", "n_events", "cusum_up").rows.head
    // run 1: devs 50→−50 then 300→+200 (sorted fold) ⇒ S+ = 200, n = 2
    Seq(CusumEvent(1L, ts("2024-01-01 10:00:30"), 2000L, 2L, 300L),
        CusumEvent(1L, ts("2024-01-01 10:00:00"), 1000L, 1L, 50L))
      .toDS().coalesce(1).write.mode("append").parquet(src)
    run()
    latest() shouldBe Seq(1L, 2L, 200L)

    // down-time arrival: a dev-0 event — the statistic must CARRY
    Seq(CusumEvent(1L, ts("2024-01-01 10:01:00"), 3000L, 3L, 100L))
      .toDS().coalesce(1).write.mode("append").parquet(src)
    run()
    latest() shouldBe Seq(1L, 3L, 200L)   // S+ carried — recovered fold
  }

  test("restart recovers the WATERMARK: pre-restart lateness horizon still drops") {
    val dir = Files.createTempDirectory("recov_wm").toString
    val src = s"$dir/src"; val sink = s"$dir/lake"; val ckpt = s"$dir/ckpt"
    Files.createDirectory(Paths.get(src))
    val schema = Seq((ts("2024-01-01 10:00:00"), "click", 1.0))
      .toDF("ts_utc", "event_type", "value").schema
    def agg(s: org.apache.spark.sql.DataFrame) =
      EventStreams.tumblingAgg(s, windowLen = "1 hour", lateness = "10 minutes")

    // run 1 pushes the watermark to 13:50 (14:00 − 10 min) and stops
    Seq((ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 14:00:00"), "click", 2.0))
      .toDF("ts_utc", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    EventStreams.toLake(
      agg(EventStreams.fromParquetDir(spark, src, schema)),
      sink, ckpt, Seq.empty).awaitTermination()

    // a late event for the long-closed 10:00 window arrives during the
    // outage; if the restart forgot the watermark it would reopen the
    // window and re-emit it (duplicate window_start downstream)
    Seq((ts("2024-01-01 10:30:00"), "click", 100.0),
        (ts("2024-01-01 17:00:00"), "click", 0.0))
      .toDF("ts_utc", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    EventStreams.toLake(
      agg(EventStreams.fromParquetDir(spark, src, schema)),
      sink, ckpt, Seq.empty).awaitTermination()

    val tenOClock = spark.read.parquet(sink)
      .filter(col("window_start") === ts("2024-01-01 10:00:00"))
      .select("n_events", "sum_value").rows
    // exactly one emission, with the ORIGINAL content — the late row
    // neither duplicated the window nor leaked into it
    tenOClock shouldBe Seq(Seq(1L, 1.0))
  }

  test("kllPartialsToLake replay safety: re-running a micro-batch with " +
    "the same batchId leaves the sink and its fold unchanged") {
    import graft.ops.Kll
    val dir = Files.createTempDirectory("recov_kll").toString
    val sink = s"$dir/sink"
    val batch = (1 to 1000).map(i => (ts("2024-01-01 10:00:30"), i.toDouble))
      .toDF("ts_utc", "value")
    def write(id: Long) = EventStreams.kllPartialBatch(batch, sink,
      batchId = id, value = "value", k = 64, tsCol = "ts_utc",
      windowLen = "1 hour")
    def partials() = spark.read.parquet(sink)
      .select("window_start", "kll_value", "kll_weight")
    write(0L)
    val n1 = partials().count()
    val fold1 = Kll.compactByGroup(partials(), Seq("window_start"), 64)
      .orderBy("kll_value").rows.map(_.toString)
    // the at-least-once replay: same batch, same id, written again —
    // the overwrite-per-batch_id sink must absorb it, where the old
    // blind append would double every window weight
    write(0L)
    partials().count() shouldBe n1
    Kll.compactByGroup(partials(), Seq("window_start"), 64)
      .orderBy("kll_value").rows.map(_.toString) shouldBe fold1
    // sum weight ~ the batch once (compaction drift < 2*step = 32)
    val w1 = partials().agg(sum("kll_weight")).rows.head.head
      .asInstanceOf[Long]
    w1 should (be >= 968L and be <= 1032L)
    // a genuinely NEW batch lands beside it — partition dirs coexist
    // and the root read folds both
    write(1L)
    val w2 = partials().agg(sum("kll_weight")).rows.head.head
      .asInstanceOf[Long]
    w2 should (be >= 2L * 968 and be <= 2L * 1032)
  }
}
