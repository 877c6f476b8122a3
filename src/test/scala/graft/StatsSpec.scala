package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chi2 contingency: hand-computed 2x2 cells, margins, contributions") {
    import spark.implicits._
    // table: (A,x)=10 (A,y)=20 (B,x)=30 (B,y)=40 ; N=100
    val df = (Seq.fill(10)(("A", "x")) ++ Seq.fill(20)(("A", "y")) ++
      Seq.fill(30)(("B", "x")) ++ Seq.fill(40)(("B", "y"))).toDF("s", "l")
    val rows = Stats.contingencyChi2(df, col("s"), col("l")).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    val ax = rows(("A", "x"))
    assert(ax.getAs[Long]("o") == 10 && ax.getAs[Long]("r_total") == 30
      && ax.getAs[Long]("c_total") == 40)
    // e = 30*40/100 = 12 ; contrib = (10-12)^2/12 = 1/3
    assert(ax.getAs[Double]("expected") == 12.0)
    assert(ax.getAs[Double]("contrib") == 0.333333)
    // by = (B,y): e = 70*60/100 = 42 ; contrib = 4/42 = 0.095238
    val by = rows(("B", "y"))
    assert(by.getAs[Double]("expected") == 42.0)
    assert(by.getAs[Double]("contrib") == 0.095238)
  }

  test("olsByGroup recovers an exact line and NULLs a degenerate group") {
    import spark.implicits._
    // g1: y = 3x + 2 exactly; g2: constant x (den 0)
    val df = (Seq((1L, 5L), (2L, 8L), (3L, 11L), (4L, 14L)).map {
      case (x, y) => ("g1", x, y)
    } ++ Seq(("g2", 7L, 1L), ("g2", 7L, 9L))).toDF("g", "x", "y")
    val rows = Stats.olsByGroup(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val g1 = rows("g1")
    assert(g1.getAs[java.math.BigDecimal]("slope").doubleValue == 3.0 &&
      g1.getAs[java.math.BigDecimal]("intercept").doubleValue == 2.0)
    // n=4 sx=10 sy=38 sxx=30 sxy=110: num=4*110-10*38=60, den=4*30-100=20
    assert(g1.getAs[java.math.BigDecimal]("slope_num").longValueExact == 60L)
    assert(g1.getAs[java.math.BigDecimal]("slope_den").longValueExact == 20L)
    val g2 = rows("g2")
    assert(g2.getAs[java.math.BigDecimal]("slope_den").longValueExact == 0L)
    assert(g2.isNullAt(g2.fieldIndex("slope")) && g2.isNullAt(g2.fieldIndex("intercept")))
  }

  test("chi2 contributions sum to the textbook statistic on a skewed table") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(2000)((s"s${rnd.nextInt(4)}",
      if (rnd.nextInt(10) < 3) "en" else s"l${rnd.nextInt(3)}"))
    val df = data.toDF("s", "l")
    val got = Stats.contingencyChi2(df, col("s"), col("l")).collect()
      .map(_.getAs[Double]("contrib")).sum
    // local recompute
    val n = data.size.toDouble
    val cells = data.groupBy(identity).view.mapValues(_.size.toDouble)
    val rTot = data.groupBy(_._1).view.mapValues(_.size.toDouble)
    val cTot = data.groupBy(_._2).view.mapValues(_.size.toDouble)
    val want = cells.map { case ((a, b), o) =>
      val e = rTot(a) * cTot(b) / n; (o - e) * (o - e) / e
    }.sum
    assert(math.abs(got - want) < 1e-3)
  }

  test("percentRank: min-rank tie semantics, endpoints, partition invariance") {
    import spark.implicits._
    // values 10,20,20,30: ranks 1,2,2,4 → pr 0, 1/3, 1/3, 1
    val rows = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L))
    Seq(1, 7).foreach { np =>
      val got = Stats.percentRank(rows.toDF("id", "v"), col("id"), col("v"),
          numParts = np)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      assert(got == Seq((1L, 0L), (2L, 333333L), (3L, 333333L),
        (4L, 1000000L)), s"numParts=$np")
    }
    // n = 1: percent_rank undefined → NULL
    val one = Stats.percentRank(Seq((9L, 5L)).toDF("id", "v"),
      col("id"), col("v")).collect()
    assert(one.length == 1 && one(0).isNullAt(2))
  }

  test("percentRank matches a local oracle on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(40).toLong))
    val n = rows.size.toLong
    val want = rows.map { case (id, v) =>
      val below = rows.count(_._2 < v).toLong
      (id, (2000000L * below + (n - 1)) / (2 * (n - 1)))
    }
    val got = Stats.percentRank(rows.toDF("id", "v"), col("id"), col("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == want)
  }
}
