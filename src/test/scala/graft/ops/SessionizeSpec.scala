package graft.ops

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // user 1: events at 0,100,250 (gap 100 keeps 0→100 together, 100→250
  // breaks); user 2: single event; gap exactly == threshold continues
  private val events = Seq(
    (1L, 0L, 10L), (1L, 100L, 11L), (1L, 250L, 12L),
    (2L, 500L, 20L),
    (3L, 0L, 30L), (3L, 100L, 31L) // gap == 100 → same session
  ).toDF("user", "t", "eid")

  test("assign: gap-strict session boundaries, 1-based per-key ordinals") {
    val out = Sessionize.assign(events, "user", "t", "eid", gap = 100L)
      .select("user", "t", "session_id").orderBy("user", "t")
      .rows.map(r => (r(0), r(1), r(2)))
    out shouldBe Seq(
      (1L, 0L, 1L), (1L, 100L, 1L), (1L, 250L, 2L),
      (2L, 500L, 1L),
      (3L, 0L, 1L), (3L, 100L, 1L))
  }

  test("sessions: rollup start/end/count per session") {
    val out = Sessionize.sessions(events, "user", "t", "eid", gap = 100L)
      .orderBy("user", "session_id")
      .rows.map(r => (r(0), r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      (1L, 1L, 0L, 100L, 2L),
      (1L, 2L, 250L, 250L, 1L),
      (2L, 1L, 500L, 500L, 1L),
      (3L, 1L, 0L, 100L, 2L))
  }

  test("gap = 0 splits on any positive gap, keeps exact ties together") {
    val df = Seq((1L, 5L, 1L), (1L, 5L, 2L), (1L, 6L, 3L)).toDF("user", "t", "eid")
    val out = Sessionize.sessions(df, "user", "t", "eid", gap = 0L)
      .orderBy("session_id").rows.map(r => (r(1), r(4)))
    out shouldBe Seq((1L, 2L), (2L, 1L))
  }

  test("reserved working columns are rejected") {
    val bad = Seq((1L, 0L, 1L)).toDF("user", "t", "session_id")
    an[IllegalArgumentException] should be thrownBy
      Sessionize.assign(bad, "user", "t", "t", gap = 10L)
    an[IllegalArgumentException] should be thrownBy
      Sessionize.assign(events, "user", "t", "eid", gap = -1L)
  }

  test("empty input yields empty sessions") {
    Sessionize.sessions(events.limit(0), "user", "t", "eid", 10L)
      .count() shouldBe 0L
  }

  // ── incremental merge ──────────────────────────────────────────────

  private def roll(df: org.apache.spark.sql.DataFrame) =
    Sessionize.sessions(df, "user", "t", "eid", gap = 100L)

  test("mergeSessions: bridge fuses last prior with first delta; later deltas renumber") {
    // key 1 prior: s1 [0,100] n2, s2 [250,250] n1; delta events at 300
    // (bridges s2: 300-250 ≤ 100) and 600 (new session)
    val prior = roll(events)
    val delta = roll(Seq((1L, 300L, 13L), (1L, 600L, 14L)).toDF("user", "t", "eid"))
    val out = Sessionize.mergeSessions(prior, delta, "user", gap = 100L)
      .filter($"user" === 1L).orderBy("session_id")
      .rows.map(r => (r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      (1L, 0L, 100L, 2L),
      (2L, 250L, 300L, 2L), // fused: end extended, count folded
      (3L, 600L, 600L, 1L)) // delta session 2 → last_id + 1
  }

  test("mergeSessions: no bridge appends; unseen and untouched keys pass through") {
    val prior = roll(events)
    // key 2 delta far beyond the gap; key 9 unseen before
    val delta = roll(Seq((2L, 1000L, 21L), (9L, 5L, 90L)).toDF("user", "t", "eid"))
    val out = Sessionize.mergeSessions(prior, delta, "user", gap = 100L)
      .orderBy("user", "session_id")
      .rows.map(r => (r(0), r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      (1L, 1L, 0L, 100L, 2L), (1L, 2L, 250L, 250L, 1L),
      (2L, 1L, 500L, 500L, 1L), (2L, 2L, 1000L, 1000L, 1L),
      (3L, 1L, 0L, 100L, 2L),
      (9L, 1L, 5L, 5L, 1L))
  }

  test("mergeSessions: equals the from-scratch sessionization of the union") {
    val all = Seq(
      (1L, 0L, 1L), (1L, 90L, 2L), (1L, 400L, 3L), (1L, 450L, 4L),
      (2L, 100L, 5L), (2L, 390L, 6L), (2L, 391L, 7L),
      (4L, 395L, 8L), (4L, 900L, 9L)
    ).toDF("user", "t", "eid")
    val cutoff = 392L
    val merged = Sessionize.mergeSessions(
        roll(all.filter($"t" <= cutoff)), roll(all.filter($"t" > cutoff)),
        "user", gap = 100L)
      .orderBy("user", "session_id").rows
    merged shouldBe roll(all).orderBy("user", "session_id").rows
  }

  test("mergeSessions: a delta that does not partition time fails loudly") {
    val prior = roll(events)
    val delta = roll(Seq((1L, 50L, 99L)).toDF("user", "t", "eid"))
    val ex = intercept[Exception] {
      Sessionize.mergeSessions(prior, delta, "user", gap = 100L).collect()
    }
    ex.getMessage should include("partition time")
  }

  test("mergeSessions: null-safe sum fold — all-NULL legs match the recompute") {
    import org.apache.spark.sql.functions._
    // user 1: prior leg all-NULL values, delta leg non-null → SUM keeps
    // the non-null leg; user 2: both legs all-NULL → stays NULL
    val all = Seq(
      (1L, 0L, 1L, None: Option[Double]), (1L, 90L, 2L, None),
      (1L, 150L, 3L, Some(2.5)),
      (2L, 80L, 4L, None), (2L, 150L, 5L, None)
    ).toDF("user", "t", "eid", "v")
    def rollV(df: org.apache.spark.sql.DataFrame) =
      Sessionize.assign(df, "user", "t", "eid", gap = 100L)
        .groupBy($"user", $"session_id")
        .agg(min($"t").as("session_start"), max($"t").as("session_end"),
          count(lit(1)).as("n_events"), sum($"v").as("sum_v"))
    val merged = Sessionize.mergeSessions(
        rollV(all.filter($"t" <= 100L)), rollV(all.filter($"t" > 100L)),
        "user", gap = 100L, sums = Seq("sum_v"))
      .orderBy("user", "session_id").rows
    merged shouldBe rollV(all).orderBy("user", "session_id").rows
    merged.map(r => (r(0), r(5))) shouldBe Seq((1L, 2.5), (2L, null))
  }

  test("one exchange, one sort: both window passes share the plan prefix") {
    val plan = Sessionize.assign(events, "user", "t", "eid", gap = 100L)
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    "(?i)\\bsort\\b".r.findAllIn(plan).size should be <= 2 // one Sort node, name may repeat in expr
  }
}
