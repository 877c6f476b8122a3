package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentiles

/** Percentiles.exact must be bit-identical to Spark's buffering built-in
  * `percentile` — same order statistics, same interpolation arithmetic —
  * while never holding a full group in one aggregation buffer.
  */
class PercentilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(df: org.apache.spark.sql.DataFrame, gCol: String, vCol: String,
      ps: Seq[(String, Double)]): Unit = {
    val pSql = ps.map { case (_, p) => s"${p}D" }.mkString(",")
    val want = df.groupBy(col(gCol).as("g"))
      .agg(expr(s"percentile($vCol, array($pSql))").as("pp"))
      .select(col("g") +: ps.zipWithIndex.map { case ((n, _), i) =>
        element_at(col("pp"), i + 1).as(n) }: _*)
      .collect().map(r => r.getAs[Any]("g") -> r).toMap
    val got = Percentiles.exact(df, col(gCol), col(vCol), ps)
      .collect().map(r => r.getAs[Any]("g") -> r).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, gr) =>
      ps.foreach { case (name, _) =>
        val w = want(g).getAs[Double](name)
        val v = gr.getAs[Double](name)
        assert(v == w, s"group $g $name: got $v want $w (must be bit-identical)")
      }
    }
  }

  test("matches built-in percentile bit-for-bit on the lineitem fixture") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    check(li, "l_returnflag", "l_extendedprice",
      Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9)))
  }

  test("matches on duplicates, tiny groups, and edge fractions 0.0/1.0") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(2000) { i =>
      // group "dup" is 90% duplicated values; "tiny1"/"tiny2" have 1-2 rows
      ("dup", math.floor(rng.nextDouble() * 10))
    } ++ Seq(("tiny1", 7.5), ("tiny2", 1.0), ("tiny2", 2.0)) ++
      Seq.tabulate(500)(i => ("uniform", rng.nextDouble() * 1000))
    val df = rows.toDF("g", "v")
    check(df, "g", "v",
      Seq(("pmin", 0.0), ("p10", 0.1), ("p50", 0.5), ("p99", 0.99), ("pmax", 1.0)))
  }

  test("property: bit-identity holds across seeded random distributions") {
    import spark.implicits._
    val ps = Seq(("p01", 0.01), ("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p999", 0.999))
    for (seed <- 0 until 5) {
      val rng = new scala.util.Random(seed)
      val rows = Seq.newBuilder[(String, Double)]
      // heavy duplicates (10 distinct values over 3000 rows)
      (0 until 3000).foreach(_ => rows += (("dup", (rng.nextInt(10) * 7).toDouble)))
      // log-skewed magnitudes spanning 12 orders of magnitude
      (0 until 2000).foreach(_ => rows += (("skew", math.pow(10, rng.nextDouble() * 12 - 6))))
      // negatives + zeros mixed
      (0 until 1000).foreach(_ => rows += (("neg", rng.nextDouble() * 200 - 100)))
      rows += (("neg", 0.0)); rows += (("neg", -0.0))
      // group sizes 1..4 around the rank edges
      (0 until 1 + seed % 4).foreach(i => rows += (("tiny", i * 3.25)))
      check(rows.result().toDF("g", "v"), "g", "v", ps)
    }
  }

  test("q39's and q46's plans carry no full-value percentile buffer") {
    Seq("q39_percentiles", "q46_approx_quantile").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
      assert(!plan.contains("percentile("),
        s"$q: exact percentile (per-group full-value buffer) must not appear; " +
          "only percentile_approx brackets are allowed")
    }
  }

  test("q164 winsorized mean actually clips: differs from the plain mean, stays in [p05, p95]") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q164_winsorize")(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n"), r.getAs[Double]("wmean"))).toMap
    val caps = Percentiles.exact(Tables.load(spark, dir, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"),
        Seq(("lo", 0.05), ("hi", 0.95)))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    val plain = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag")).agg(avg(col("l_extendedprice")).as("m"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("m")).toMap
    assert(got.nonEmpty)
    got.foreach { case (g, (n, wmean)) =>
      val (lo, hi) = caps(g)
      assert(n > 0 && wmean >= lo && wmean <= hi,
        s"$g: winsorized mean $wmean outside [$lo, $hi]")
      assert(math.abs(wmean - plain(g)) > 1e-9,
        s"$g: clipping never engaged — winsorized mean equals the plain mean")
    }
  }
}
