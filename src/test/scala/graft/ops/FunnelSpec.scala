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
}
