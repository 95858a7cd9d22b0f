package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumblingAgg: windows aggregate; late data beyond watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStreams.tumblingAgg(
      input.toDF().toDF("ts_utc", "event_type", "value"),
      windowLen = "1 hour", lateness = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      // batch 1: two events in the 10:00 window, one in 11:00
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:50:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "click", 4.0))
      q.processAllAvailable()
      // batch 2: advance watermark far past the 10:00 window → it closes
      input.addData((ts("2024-01-01 13:00:00"), "click", 8.0))
      q.processAllAvailable()
      // batch 3: a late event for the long-closed 10:00 window → dropped
      input.addData((ts("2024-01-01 10:30:00"), "click", 100.0))
      q.processAllAvailable()

      val out = spark.table("tumbling")
        .select("window_start", "n_events", "sum_value")
        .orderBy("window_start").rows
      // emitted (closed) windows: 10:00 with the ORIGINAL two events, 11:00
      out.head shouldBe Seq(ts("2024-01-01 10:00:00"), 2L, 3.0)
      out(1) shouldBe Seq(ts("2024-01-01 11:00:00"), 1L, 4.0)
    } finally q.stop()
  }

  test("sessionize: events within gap merge into one session, beyond gap split") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val sess = EventStreams.sessionize(
      input.toDF().toDF("ts_utc", "user_id", "value"),
      gap = "30 minutes", lateness = "5 minutes")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:10:00"), 1L, 2.0),   // same session (10 min gap)
        (ts("2024-01-01 12:00:00"), 1L, 4.0))   // new session (110 min gap)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 15:00:00"), 1L, 0.0))  // advance watermark
      q.processAllAvailable()

      val out = spark.table("sessions")
        .orderBy("session_start").select("n_events", "session_value").rows
      out.head shouldBe Seq(2L, 3.0)
      out(1) shouldBe Seq(1L, 4.0)
    } finally q.stop()
  }

  test("slidingAvg: an event lands in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStreams.slidingAvg(
      input.toDF().toDF("ts_utc", "event_type", "value"),
      windowLen = "1 hour", slide = "15 minutes", lateness = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 10:31:00"), "click", 8.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), "click", 0.0))  // close the windows
      q.processAllAvailable()
      val starts = spark.table("sliding")
        .filter(col("avg_value") === 8.0)
        .select("window_start").rows.map(_.head.toString).sorted
      // 10:31 falls in the 4 hour-long windows starting 09:45..10:30
      starts shouldBe Seq("2024-01-01 09:45:00.0", "2024-01-01 10:00:00.0",
        "2024-01-01 10:15:00.0", "2024-01-01 10:30:00.0")
    } finally q.stop()
  }

  test("toLake: AvailableNow file stream lands partitioned parquet exactly once") {
    val dir = Files.createTempDirectory("evstream").toString
    val src = s"$dir/src"; val sink = s"$dir/lake"; val ckpt = s"$dir/ckpt"
    val events = Seq(
      (ts("2024-01-01 10:00:00"), "click", 1.0),
      (ts("2024-01-02 11:00:00"), "view", 2.0)
    ).toDF("ts_utc", "event_type", "value")
    events.write.parquet(src)

    val stream = EventStreams.fromParquetDir(spark, src, events.schema)
      .withColumn("day", to_date(col("ts_utc")))
    val q1 = EventStreams.toLake(stream, sink, ckpt, Seq("day"))
    q1.awaitTermination()
    spark.read.parquet(sink).count() shouldBe 2

    // re-running with the same checkpoint re-reads nothing → still 2 rows
    val q2 = EventStreams.toLake(stream, sink, ckpt, Seq("day"))
    q2.awaitTermination()
    spark.read.parquet(sink).count() shouldBe 2
  }

  test("streamingDedup: duplicate keys within the watermark horizon drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = EventStreams.streamingDedup(
      input.toDF().toDF("ts_utc", "doc_id", "payload"),
      keys = Seq("doc_id"), lateness = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "first"),
        (ts("2024-01-01 10:01:00"), 1L, "dup-same-batch"),
        (ts("2024-01-01 10:02:00"), 2L, "other"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:03:00"), 1L, "dup-next-batch"))
      q.processAllAvailable()
      val out = spark.table("dedupstream").select("doc_id", "payload")
        .orderBy("doc_id").rows
      out shouldBe Seq(Seq(1L, "first"), Seq(2L, "other"))
    } finally q.stop()
  }

  test("runningUserTotals: state persists across batches, expires after event-time idle gap") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.UserEvent
    val input = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(input.toDS(),
        lateness = "1 minute", idleGapMs = 10 * 60 * 1000L)  // 10-minute idle gap
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      input.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00"), 10.0),
        UserEvent(1L, ts("2024-01-01 10:00:30"), 5.0),
        UserEvent(2L, ts("2024-01-01 10:01:00"), 1.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, ts("2024-01-01 10:02:00"), 2.0))
      q.processAllAvailable()
      // state accumulated across batches
      val afterTwo = spark.table("running")
        .groupBy("user_id").agg(max_by(struct(col("n_events"), col("total_value")),
          col("n_events")).as("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .orderBy("user_id").rows
      afterTwo shouldBe Seq(Seq(1L, 3L, 17.0), Seq(2L, 1L, 1.0))

      // push the watermark far past user 1's idle horizon, then send a new
      // user-1 event: its totals restart — old state was expired, not resumed
      input.addData(UserEvent(3L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, ts("2024-01-01 12:00:30"), 4.0))
      q.processAllAvailable()
      val user1Latest = spark.table("running").filter(col("user_id") === 1)
        .orderBy(col("n_events").desc).select("n_events", "total_value").rows
      user1Latest should contain(Seq(1L, 4.0))   // fresh state, not 4 events / 21.0
      user1Latest should not contain Seq(4L, 21.0)
    } finally q.stop()
  }

  test("streamingCusum: within-batch order restored, state folds across batches") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{CusumEvent, CusumRow}
    val input = MemoryStream[CusumEvent]
    val q = EventStreams.streamingCusum(input.toDS(), targetCents = 100L)
      .writeStream.format("memory").queryName("scusum")
      .outputMode("update").start()
    try {
      // batch 1 deliberately OUT OF ORDER: the fold must sort by
      // (ts_nanos, event_id) first — devs 50→-50 then 300→+200 give
      // S+ = 200; the unsorted order would give 150
      input.addData(
        CusumEvent(1L, ts("2024-01-01 10:00:30"), 2000L, 2L, 300L),
        CusumEvent(1L, ts("2024-01-01 10:00:00"), 1000L, 1L, 50L))
      q.processAllAvailable()
      spark.table("scusum").orderBy(col("n_events").desc).rows.head shouldBe
        Seq(1L, 2L, 200L, 0L, 0L)
      // batch 2: a dev-0 event — the statistic must CARRY (state, not
      // restart): S+ stays 200 with n = 3
      input.addData(CusumEvent(1L, ts("2024-01-01 10:01:00"), 3000L, 3L, 100L))
      q.processAllAvailable()
      spark.table("scusum").orderBy(col("n_events").desc).rows.head shouldBe
        Seq(1L, 3L, 200L, 0L, 0L)
      // batch 3: a CROSS-BATCH late event (tick before the last folded
      // position) — folding it would misorder the statistic, so it is
      // dropped and COUNTED, everything else unchanged
      input.addData(CusumEvent(1L, ts("2024-01-01 10:00:15"), 1500L, 9L, 999L))
      q.processAllAvailable()
      spark.table("scusum").orderBy(col("n_late").desc).rows.head shouldBe
        Seq(1L, 3L, 200L, 0L, 1L)
    } finally q.stop()
  }

  test("mergeIntoWarehouse: streamed upsert collapses duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("evmerge").toString
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStreams.mergeIntoWarehouse(
      input.toDF().toDF("id", "payload", "version"),
      s"$dir/wh", s"$dir/ckpt", keys = Seq("id"), tiebreak = "version")
    try {
      input.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      input.addData((1L, "a2", 2L), (3L, "c", 1L))   // update id=1, insert id=3
      q.processAllAvailable()
      val wh = spark.read.parquet(s"$dir/wh").orderBy("id")
      wh.select("payload").rows.map(_.head) shouldBe Seq("a2", "b", "c")
    } finally q.stop()
  }

  test("intervalJoin: matches within horizon, buffered state expires past it") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Timestamp, Long, String)]
    val rIn = MemoryStream[(Timestamp, Long, String)]
    val joined = EventStreams.intervalJoin(
      lIn.toDF().toDF("l_ts", "l_user", "click_id"), "l_user", "l_ts",
      rIn.toDF().toDF("r_ts", "r_user", "buy_id"), "r_user", "r_ts",
      horizon = "30 minutes", lateness = "10 minutes")
      .select("click_id", "buy_id")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      lIn.addData((ts("2024-01-01 10:00:00"), 1L, "c1"),
        (ts("2024-01-01 10:00:00"), 2L, "c2"))
      rIn.addData((ts("2024-01-01 10:20:00"), 1L, "b1"),   // in horizon
        (ts("2024-01-01 10:45:00"), 1L, "b2"),             // past horizon
        (ts("2024-01-01 10:10:00"), 3L, "b3"))             // no such click
      q.processAllAvailable()
      spark.table("ivj").rows.map(r => (r(0), r(1))) shouldBe Seq(("c1", "b1"))

      // advance BOTH watermarks far past c1's ts+horizon, then replay a
      // matching-time purchase: the buffered click is gone → no new row
      lIn.addData((ts("2024-01-01 12:00:00"), 9L, "cx"))
      rIn.addData((ts("2024-01-01 12:00:00"), 9L, "bx"))
      q.processAllAvailable()
      rIn.addData((ts("2024-01-01 10:15:00"), 1L, "b_late"))
      q.processAllAvailable()
      spark.table("ivj").filter(col("buy_id") === "b_late").count() shouldBe 0L
    } finally q.stop()
  }

  test("intervalJoin left_outer: null-pad fires on watermark eviction, not before") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Timestamp, Long, String)]
    val rIn = MemoryStream[(Timestamp, Long, String)]
    val joined = EventStreams.intervalJoin(
      lIn.toDF().toDF("l_ts", "l_user", "click_id"), "l_user", "l_ts",
      rIn.toDF().toDF("r_ts", "r_user", "buy_id"), "r_user", "r_ts",
      horizon = "30 minutes", lateness = "10 minutes", joinType = "left_outer")
      .select("click_id", "buy_id")
    val q = joined.writeStream.format("memory").queryName("ivjl")
      .outputMode("append").start()
    try {
      lIn.addData((ts("2024-01-01 10:00:00"), 1L, "c1"),  // will match
        (ts("2024-01-01 10:00:00"), 2L, "c2"))            // never matches
      rIn.addData((ts("2024-01-01 10:20:00"), 1L, "b1"))
      q.processAllAvailable()
      // c2 is unmatched but still OPEN — no null row may exist yet
      spark.table("ivjl").rows.map(r => (r(0), r(1))) shouldBe Seq(("c1", "b1"))
      // push both watermarks past c2's ts + horizon → eviction emits
      // exactly one null-padded row for c2 (and none for matched c1)
      lIn.addData((ts("2024-01-01 12:00:00"), 9L, "cx"))
      rIn.addData((ts("2024-01-01 12:00:00"), 9L, "bx"))
      q.processAllAvailable()
      lIn.addData((ts("2024-01-01 12:30:00"), 9L, "cy"))
      rIn.addData((ts("2024-01-01 12:30:00"), 9L, "by"))
      q.processAllAvailable()
      val nulls = spark.table("ivjl").filter(col("buy_id").isNull)
        .rows.map(_.head)
      nulls shouldBe Seq("c2")
    } finally q.stop()
    an[IllegalArgumentException] should be thrownBy
      EventStreams.intervalJoin(
        lIn.toDF().toDF("l_ts", "l_user", "click_id"), "l_user", "l_ts",
        rIn.toDF().toDF("r_ts", "r_user", "buy_id"), "r_user", "r_ts",
        horizon = "30 minutes", joinType = "right_outer")
  }

  test("intervalJoin rejects overlapping column names up front") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Timestamp, Long)].toDF().toDF("ts", "user")
    val b = MemoryStream[(Timestamp, Long)].toDF().toDF("ts", "user")
    an[IllegalArgumentException] should be thrownBy
      EventStreams.intervalJoin(a, "user", "ts", b, "user", "ts", "1 hour")
  }

  test("cdcIntoWarehouse: out-of-order batches converge, deletes tombstone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val changes = input.toDF().toDF("k", "seq", "tie", "op", "bal")
    val base = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("k", "bal")
    val tmp = Files.createTempDirectory("cdcwh").toString
    val q = EventStreams.cdcIntoWarehouse(changes, base, s"$tmp/wh",
      s"$tmp/ckpt", "k", "seq", "tie", "op")
    def snapshot() = spark.read.parquet(s"$tmp/wh")
      .filter(col("__op") =!= "D")
      .select("k", "bal").orderBy("k").rows.map(r => (r(0), r(1)))
    try {
      // batch 1 arrives first but holds the LATER (seq=10) changes
      input.addData((1L, 10L, 1L, "U", 500.0), (2L, 10L, 2L, "U", 900.0))
      q.processAllAvailable()
      snapshot() shouldBe Seq((1L, 500.0), (2L, 900.0), (3L, 300.0))
      // batch 2 delivers OLDER (seq=5) changes late: a stale upsert for
      // key 1 and a stale delete for key 2 — both must lose to the
      // snapshot's seq=10 state, not clobber it
      input.addData((1L, 5L, 3L, "U", 111.0), (2L, 5L, 4L, "D", 0.0))
      q.processAllAvailable()
      snapshot() shouldBe Seq((1L, 500.0), (2L, 900.0), (3L, 300.0))
      // a genuinely newer delete wins — and persists as a tombstone row
      // (not a bare removal), so further stale upserts cannot resurrect
      input.addData((2L, 20L, 5L, "D", 0.0))
      q.processAllAvailable()
      snapshot() shouldBe Seq((1L, 500.0), (3L, 300.0))
      input.addData((2L, 7L, 6L, "U", 777.0)) // older than the delete
      q.processAllAvailable()
      snapshot() shouldBe Seq((1L, 500.0), (3L, 300.0))
    } finally q.stop()
  }

  test("cdcIntoWarehouse: schema guards fire at construction, before start()") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("cdcguard").toString
    val base = Seq((1L, 100.0)).toDF("k", "bal")
    // changes missing the base's bal column → loud require, no stream
    val noBal = MemoryStream[(Long, Long, Long, String)].toDF()
      .toDF("k", "seq", "tie", "op")
    an[IllegalArgumentException] should be thrownBy
      EventStreams.cdcIntoWarehouse(noBal, base, s"$tmp/wh1", s"$tmp/c1",
        "k", "seq", "tie", "op")
    // a pre-existing reserved working column would corrupt the fold
    val clash = MemoryStream[(Long, Long, Long, String, Double, Long)].toDF()
      .toDF("k", "seq", "tie", "op", "bal", "__seq")
    an[IllegalArgumentException] should be thrownBy
      EventStreams.cdcIntoWarehouse(clash, base, s"$tmp/wh2", s"$tmp/c2",
        "k", "seq", "tie", "op")
    // base lacking the key fails the same way
    an[IllegalArgumentException] should be thrownBy
      EventStreams.cdcIntoWarehouse(
        MemoryStream[(Long, Long, Long, String, Double)].toDF()
          .toDF("k", "seq", "tie", "op", "bal"),
        base.withColumnRenamed("k", "other"), s"$tmp/wh3", s"$tmp/c3",
        "k", "seq", "tie", "op")
  }
}
