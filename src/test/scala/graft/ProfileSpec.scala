package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("null semantics: counted in n_null, absent from distinct/min/max/len") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("aa")), (2L, Some("bb")), (3L, None), (4L, Some("aa"))
    ).toDF("id", "s")
    val rows = Profile.profile(df, Seq("id", "s")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val s = rows("s")
    assert(s.getAs[Long]("n_rows") == 4 && s.getAs[Long]("n_null") == 1)
    assert(s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[String]("min_val") == "aa" && s.getAs[String]("max_val") == "bb")
    assert(s.getAs[Long]("sum_len") == 6) // nulls contribute no length
    val id = rows("id")
    assert(id.getAs[Long]("n_null") == 0 && id.getAs[Long]("n_distinct") == 4)
    assert(id.getAs[String]("min_val") == "1" && id.getAs[String]("max_val") == "4")
  }

  test("long values truncate to the report width") {
    import spark.implicits._
    val df = Seq(("x" * 100), ("y" * 100)).toDF("t")
    val r = Profile.profile(df, Seq("t"), truncateTo = 8).collect().head
    assert(r.getAs[String]("min_val") == "x" * 8)
    assert(r.getAs[Long]("sum_len") == 200) // sum_len is over FULL values
  }

  test("histogram bins by floor division, empty bins absent") {
    import spark.implicits._
    val df = Seq(0.0, 5.0, 9.99, 10.0, 25.0, 25.0).toDF("v")
    val rows = Profile.histogram(df, col("v"), width = 10.0).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 2L)) // bin for 30s range absent
    assert(rows(0L).getAs[Long]("n") == 3
      && rows(0L).getAs[Double]("max_val") == 9.99)
    assert(rows(1L).getAs[Long]("n") == 1
      && rows(1L).getAs[Double]("bin_lo") == 10.0)
    assert(rows(2L).getAs[Long]("n") == 2)
  }

  test("q124 plan broadcasts the filtered dims into the fact join") {
    val df = graft.SparkEntry.queries("q124_tpch_q3")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q117 plan reads the table exactly once (k-distinct Expand, no re-scan)") {
    val df = graft.SparkEntry.queries("q117_profile")(
      spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }
}
