package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** graft_topk must equal the window row_number() <= k construction —
  * including across partial aggregation (serialize/merge over the
  * exchange), ties, k larger than the group, and null skipping.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_topk(struct, k) equals window row_number <= k on events") {
    GraftFunctions.register(spark)
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val viaAgg = e
      .groupBy(col("user_id"))
      .agg(call_function("graft_topk",
        struct(col("ts"), col("event_id"), col("value")), lit(3)).as("top"))
      .select(col("user_id"), explode(col("top")).as("t"))
      .select(col("user_id"), col("t.ts").as("ts"), col("t.event_id").as("event_id"),
        col("t.value").as("value"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = e
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAgg.nonEmpty && viaAgg == viaWindow)
  }

  test("graft_topk edge cases: small groups, nulls skipped, descending order") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("a", Some(3L)), ("a", Some(1L)), ("a", Some(7L)), ("a", None),
      ("b", Some(5L)),
      ("c", None)).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("v"), lit(2)).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got("a") == Seq(7L, 3L), "descending, k bound")
    assert(got("b") == Seq(5L), "k larger than group returns all")
    assert(got("c") == Seq(), "all-null group returns empty array")
  }

  test("graft_topk survives many-partition partial aggregation") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    // one group spread over 16 partitions: merge must see the true top-k
    val df = (1 to 10000).map(i => ("g", i.toLong)).toDF("g", "v").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("v"), lit(5)).as("top"))
      .head().getSeq[Long](1).toSeq
    assert(got == Seq(10000L, 9999L, 9998L, 9997L, 9996L))
  }

  test("graft_bottomk is the ascending twin across partial aggregation") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = (1 to 10000).map(i => ("g", i.toLong)).toDF("g", "v").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(call_function("graft_bottomk", col("v"), lit(4)).as("bot"))
      .head().getSeq[Long](1).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L))
  }
}
