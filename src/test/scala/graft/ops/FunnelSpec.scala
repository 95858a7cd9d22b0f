package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, t): u1 converts (B at 15, within 10 of first A at 10);
  // u2 has B only BEFORE its first A → not converted; u3 has B past the
  // horizon; u4 never did step A → excluded entirely; u5's earliest A
  // (not a later one) starts the clock
  private val events = Seq(
    (1L, "A", 10L), (1L, "B", 15L), (1L, "B", 30L),
    (2L, "B", 5L), (2L, "A", 10L),
    (3L, "A", 10L), (3L, "B", 25L),
    (4L, "B", 10L),
    (5L, "A", 20L), (5L, "A", 8L), (5L, "B", 17L)
  ).toDF("user", "typ", "t")

  test("twoStep: conversion, ordering, horizon and missing-A semantics") {
    val out = Funnel.twoStep(events, "user", "typ", "t", "A", "B", horizon = 10L)
      .orderBy("user").rows
      .map(r => (r(0), r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      (1L, 10L, 15L, true, 5L),
      (2L, 10L, null, false, null),
      (3L, 10L, null, false, null),
      (5L, 8L, 17L, true, 9L))
  }

  test("twoStep: boundary timestamps are inclusive on both ends") {
    val df = Seq((1L, "A", 10L), (1L, "B", 10L), (2L, "A", 0L), (2L, "B", 10L))
      .toDF("user", "typ", "t")
    val out = Funnel.twoStep(df, "user", "typ", "t", "A", "B", horizon = 10L)
      .orderBy("user").rows.map(r => (r(0), r(3)))
    out shouldBe Seq((1L, true), (2L, true))
  }

  test("twoStep: reserved working column is rejected, not clobbered") {
    val df = Seq((1L, "A", 10L, 99L)).toDF("user", "typ", "t", "__first_a")
    an[IllegalArgumentException] should be thrownBy
      Funnel.twoStep(df, "user", "typ", "t", "A", "B", horizon = 10L)
  }

  private def ordered(rows: Seq[(Long, String, Long)], gap: Long) =
    Funnel.orderedFunnel(rows.toDF("user", "typ", "t"),
        "user", "typ", "t", Seq("A", "B", "C"), gap)
      .rows.map(r => r.head.asInstanceOf[Long] ->
        ((r(1).asInstanceOf[Int], r(2).asInstanceOf[Long]))).toMap

  test("orderedFunnel: full chain, stalled chain, gap violation, no-step-1 excluded") {
    val out = ordered(Seq(
      (1L, "A", 0L), (1L, "B", 5L), (1L, "C", 9L),   // full chain
      (2L, "A", 0L), (2L, "B", 5L),                  // stalls at B
      (3L, "A", 0L), (3L, "C", 5L), (3L, "B", 20L),  // B outside gap → C at 5 can't count (before B)
      (4L, "B", 0L), (4L, "C", 5L)                   // never did A
    ), gap = 10L)
    out shouldBe Map(1L -> ((3, 9L)), 2L -> ((2, 5L)), 3L -> ((1, 0L)))
  }

  test("orderedFunnel: progress is strict — a same-timestamp next step does not count") {
    val out = ordered(Seq(
      (1L, "A", 10L), (1L, "B", 10L),                // B not AFTER A
      (2L, "A", 10L), (2L, "B", 11L)
    ), gap = 10L)
    out shouldBe Map(1L -> ((1, 10L)), 2L -> ((2, 11L)))
  }

  test("orderedFunnel: greedy-earliest chain is taken, and it completes whenever any chain does") {
    // A at 0; B at 2 (greedy) and 8; C at 11. Greedy B=2 → C window
    // (2, 12] catches 11 ✓ (a later-B chain would too — greedy only
    // ever widens later windows to the left).
    val out = ordered(Seq(
      (1L, "A", 0L), (1L, "B", 2L), (1L, "B", 8L), (1L, "C", 11L)
    ), gap = 10L)
    out shouldBe Map(1L -> ((3, 11L)))
  }

  test("orderedFunnel: working-column clash is rejected") {
    val df = Seq((1L, "A", 0L, 1L)).toDF("user", "typ", "t", "__t1")
    an[IllegalArgumentException] should be thrownBy
      Funnel.orderedFunnel(df, "user", "typ", "t", Seq("A", "B", "C"), 10L)
  }
}
