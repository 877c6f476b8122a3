package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must turn `row_number() <= k` over a
  * descending window into the bounded top-k aggregate — same rows out, no
  * Window operator in the optimized plan — and must leave non-eligible
  * shapes (ascending order, other window functions) untouched.
  */
class TopKRewriteSpec extends AnyFunSuite {

  private def extSession(): SparkSession = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(base.sparkContext.master)
      .withExtensions(new GraftExtensions).getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("latest-3 per user rewrites to graft_topk and matches the window result") {
    val s2 = extSession()
    val e = Tables.events(s2, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val q = e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("rn"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window"), s"window must be rewritten:\n$optimized")
    assert(optimized.contains("graft_topk"), s"expected topk aggregate:\n$optimized")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // same query through the plain session (no rewrite rule)
    val base = TestSpark.spark
    val eb = Tables.events(base, "/root/testdata/sf0.001")
    val want = eb.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("non-eligible windows are left alone") {
    val s2 = extSession()
    val e = Tables.events(s2, "/root/testdata/sf0.001")
    // ascending order: outside the soundness envelope
    val asc = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val q1 = e.withColumn("rn", row_number().over(asc)).filter(col("rn") <= 3)
    assert(q1.queryExecution.optimizedPlan.toString.contains("Window"))
    // rank() is not row_number: ineligible
    val desc = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val q2 = e.withColumn("rn", rank().over(desc)).filter(col("rn") <= 3)
    assert(q2.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
