package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

/** Planted-case tests for the funnel / retention analytics: the ORDER
  * constraint (stage 2 strictly after stage 1) is what distinguishes a
  * funnel from three independent mins, so the fixtures plant out-of-order
  * stages explicitly.
  */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def events() = {
    import spark.implicits._
    Seq(
      // user 1: full conversion in order view(1) -> click(2) -> purchase(3)
      (1L, "view", ts(1), 10L), (1L, "click", ts(2), 11L),
      (1L, "purchase", ts(3), 12L),
      // user 2: click BEFORE the first view never counts; the later click
      // does; no purchase after it
      (2L, "click", ts(1), 20L), (2L, "view", ts(2), 21L),
      (2L, "click", ts(4), 22L), (2L, "purchase", ts(3), 23L),
      // user 3: view only
      (3L, "view", ts(5), 30L),
      // user 4: same-ts view and click — seq breaks the tie, click counts
      // as strictly-after within the same timestamp
      (4L, "view", ts(6), 40L), (4L, "click", ts(6), 41L),
      // user 5: no view at all — never enters the funnel
      (5L, "click", ts(1), 50L), (5L, "purchase", ts(2), 51L)
    ).toDF("user_id", "event_type", "ts", "seq")
  }

  test("funnel: strictly-after ordering, ties on ts break by seq") {
    val out = Behavior.funnel(events(), "view", "click", "purchase")
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.lang.Long]("s1_seq")),
          Option(r.getAs[java.lang.Long]("s2_seq")),
          Option(r.getAs[java.lang.Long]("s3_seq"))))).toMap
    assert(out.size == 5, "one row per user, converters or not")
    assert(out(1L) == ((Some(10L), Some(11L), Some(12L))))
    assert(out(2L) == ((Some(21L), Some(22L), None)),
      "pre-view click ignored; purchase before the counted click ignored")
    assert(out(3L) == ((Some(30L), None, None)))
    assert(out(4L) == ((Some(40L), Some(41L), None)),
      "same-ts later-seq click is strictly after the view")
    assert(out(5L) == ((None, None, None)), "no view: nothing downstream counts")
  }

  test("retention: cohort by first week, offsets and rates exact") {
    import spark.implicits._
    val wk = 604800L * 1000L
    def at(week: Int, m: Int) = new Timestamp(week * wk + m * 60000L)
    val ev = Seq(
      (1L, at(0, 1)), (1L, at(0, 2)), (1L, at(2, 1)), // cohort 0, active 0+2
      (2L, at(0, 5)),                                 // cohort 0, active 0
      (3L, at(1, 1)), (3L, at(2, 2))                  // cohort 1, active 1+2
    ).toDF("user_id", "ts")
    val out = Behavior.retention(ev).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
          r.getAs[Double]("retention")))).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)), "whole cohort active in week 0")
    assert(out((0L, 2L)) == ((1L, 2L, 0.5)), "half of cohort 0 returns in week 2")
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(out((1L, 1L)) == ((1L, 1L, 1.0)))
    assert(out.size == 4, "no zero rows for inactive offsets")
  }
}
