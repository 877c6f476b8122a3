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

  test("keySkew: uniform keys give Gini 0, concentrated keys the closed form") {
    import spark.implicits._
    val uni = Seq.tabulate(12)(i => (i % 4).toLong).toDF("k")
    val r0 = Profile.keySkew(uni, col("k")).collect().head
    assert(r0.getLong(0) == 4 && r0.getLong(1) == 12 && r0.getLong(2) == 3)
    assert(r0.getLong(3) == 0L)
    // counts (1,1,1,97): G = (2·394 − 5·100)/(4·100) = 288/400 = 0.72
    val skew = (Seq(0L, 1L, 2L) ++ Seq.fill(97)(3L)).toDF("k")
    val r1 = Profile.keySkew(skew, col("k")).collect().head
    assert(r1.getLong(0) == 4 && r1.getLong(1) == 100 && r1.getLong(2) == 97)
    assert(r1.getLong(3) == 720000L)
  }

  test("keySkew: partition-count invariant and matches a local oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val keys = Seq.fill(800)(rnd.nextInt(30).toLong)
    val cs = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
    val k = cs.size.toLong; val s = cs.sum
    val srcSum = cs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val gNum = 2 * srcSum - (k + 1) * s // ≥ 0: ascending ranks on ascending counts
    val gDen = k * s
    val want = (2000000L * gNum + gDen) / (2 * gDen)
    Seq(1, 7).foreach { np =>
      val r = Profile.keySkew(keys.toDF("k"), col("k"), numParts = np)
        .collect().head
      assert(r.getLong(0) == k && r.getLong(1) == s && r.getLong(3) == want,
        s"numParts=$np")
    }
  }
}
