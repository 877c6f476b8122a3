package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LatestPerGroup

class LatestPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("latest (max_by agg) equals the row_number window plan") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    for (keys <- Seq(Seq(col("user_id")), Seq(col("event_type")))) {
      val order = Seq(col("ts"), col("event_id"))
      val a = LatestPerGroup.latest(ev, keys, order)
        .orderBy(col("event_id")).collect()
      val w = LatestPerGroup.latestWindow(ev, keys, order)
        .orderBy(col("event_id")).collect()
      assert(a.length == w.length && a.nonEmpty)
      a.zip(w).foreach { case (x, y) => assert(x == y) }
    }
  }

  test("latest plan partially aggregates instead of shuffling all rows") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = LatestPerGroup.latest(ev, Seq(col("event_type")),
      Seq(col("ts"), col("event_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan, got:\n$plan")
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }
}
