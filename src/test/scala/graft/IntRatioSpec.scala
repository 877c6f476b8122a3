package graft

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IntRatio

/** The integer-space 6-dp ratio derivation must round half-AWAY-from-zero
  * on exact halfway quotients and never pass through a double — the
  * q116/q121 driver-gate lesson (a double→decimal cast or round(double)
  * is engine-version-dependent at boundaries).
  */
class IntRatioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ratio(num: Long, den: Long): java.math.BigDecimal = {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    Seq((num, den)).toDF("n", "d")
      .select(col("n").cast(d38).as("num"), col("d").cast(d38).as("den"))
      .select(IntRatio.ratio6("num", "den").as("r"))
      .collect().head.getAs[java.math.BigDecimal]("r")
  }

  test("plain quotients round to nearest micro") {
    assert(ratio(1L, 8L).toPlainString == "0.125000")
    assert(ratio(13L, 18L).toPlainString == "0.722222")   // 0.7222... down
    assert(ratio(5L, 18L).toPlainString == "0.277778")    // 0.2777... up
  }

  test("exact halfway quotients round AWAY from zero, both signs") {
    // 1/2000000 = 0.0000005 — exactly half a micro
    assert(ratio(1L, 2000000L).toPlainString == "0.000001")
    assert(ratio(-1L, 2000000L).toPlainString == "-0.000001")
    // 3/2000000 = 0.0000015 — half-away gives 2 micro (half-even would give 2
    // too; distinguish with 1/2000000 above and 5/2000000 here → 3 micro,
    // where half-even would give 2)
    assert(ratio(5L, 2000000L).toPlainString == "0.000003")
    assert(ratio(-5L, 2000000L).toPlainString == "-0.000003")
  }

  test("negative non-halfway quotients mirror positive ones exactly") {
    assert(ratio(-13L, 18L).toPlainString == "-0.722222")
    assert(ratio(-5L, 18L).toPlainString == "-0.277778")
  }

  test("property: ratio6 == BigDecimal.setScale(6, HALF_UP) on 300 pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    // random pairs + constructed exact-halfway pairs (den = 2e6 * k makes
    // num/den land exactly on half-micro boundaries)
    val cases = Seq.tabulate(250) { _ =>
      (rnd.nextLong() % 1000000000L, math.abs(rnd.nextLong() % 999999L) + 1L)
    } ++ Seq.tabulate(50) { i =>
      val k = i + 1
      ((2 * i + 1).toLong * (if (i % 2 == 0) 1 else -1), 2000000L * k)
    }
    val d38 = DecimalType(38, 0)
    val got = cases.toDF("n", "d")
      .select(col("n").cast(d38).as("num"), col("d").cast(d38).as("den"))
      .select(col("num"), col("den"), IntRatio.ratio6("num", "den").as("r"))
      .collect()
    got.foreach { row =>
      val n = row.getDecimal(0).toBigInteger.longValueExact
      val d = row.getDecimal(1).toBigInteger.longValueExact
      val want = new java.math.BigDecimal(n)
        .divide(new java.math.BigDecimal(d), 6, java.math.RoundingMode.HALF_UP)
      assert(row.getDecimal(2).compareTo(want) == 0,
        s"$n / $d: got ${row.getDecimal(2)}, want $want")
    }
  }

  test("micro is exactly ratio6 scaled by 10^6, as a BIGINT") {
    // micro is the hash-gate spelling (all-BIGINT output, r9): it must be
    // the SAME rounding as ratio6 — ratio6(n,d)·10⁶ with no residue.
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val cases = Seq((1L, 2000000L), (-1L, 2000000L), (5L, 2000000L),
      (-5L, 2000000L), (13L, 18L), (-13L, 18L), (22722L, 45000L),
      (123456789L, 7L), (-987654321L, 13L))
    val got = cases.toDF("n", "d")
      .select(col("n").cast(d38).as("num"), col("d").cast(d38).as("den"))
      .select(IntRatio.ratio6("num", "den").as("r"),
        IntRatio.micro("num", "den").as("m"))
      .collect()
    got.foreach { row =>
      val r = row.getDecimal(0).movePointRight(6).longValueExact
      assert(row.getLong(1) == r, s"micro ${row.getLong(1)} != ratio6·10⁶ $r")
    }
  }

  test("duckMicro mirror (BIGINT stand-in for HUGEINT) agrees with micro") {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val cases = Seq((1L, 2000000L), (-1L, 2000000L), (5L, 2000000L),
      (-5L, 2000000L), (13L, 18L), (-13L, 18L), (22722L, 45000L))
    cases.foreach { case (n, d) =>
      val sparkSide = Seq((n, d)).toDF("n", "d")
        .select(col("n").cast(d38).as("num"), col("d").cast(d38).as("den"))
        .select(IntRatio.micro("num", "den").as("m"))
        .collect().head.getLong(0)
      val mirror = spark.sql(
        s"""SELECT CAST(CAST(CASE WHEN $n < 0 THEN -1 ELSE 1 END AS BIGINT)
           |  * ((2000000 * abs(CAST($n AS BIGINT)) + CAST($d AS BIGINT))
           |     div (2 * CAST($d AS BIGINT))) AS BIGINT) AS m""".stripMargin)
        .collect().head.getLong(0)
      assert(sparkSide == mirror, s"($n, $d): $sparkSide vs $mirror")
    }
  }

  test("duckdb mirror produces the identical micro on the same inputs") {
    // The DuckDB spelling is string-templated SQL; assert the Spark SQL
    // translation of the same arithmetic (BIGINT stand-in for HUGEINT)
    // agrees with ratio6 on boundary cases — the two spellings must be the
    // same function.
    import spark.implicits._
    val cases = Seq((1L, 2000000L), (-1L, 2000000L), (5L, 2000000L),
      (-5L, 2000000L), (13L, 18L), (-13L, 18L), (22722L, 45000L))
    cases.foreach { case (n, d) =>
      val sparkSide = ratio(n, d)
      val mirror = spark.sql(
        s"""SELECT CAST(CAST(CAST(CASE WHEN $n < 0 THEN -1 ELSE 1 END AS BIGINT)
           |  * ((2000000 * abs(CAST($n AS BIGINT)) + CAST($d AS BIGINT))
           |     div (2 * CAST($d AS BIGINT))) AS DECIMAL(18,0))
           |  * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(18,6)) AS r""".stripMargin)
        .collect().head.getAs[java.math.BigDecimal]("r")
      assert(sparkSide == mirror, s"($n, $d): $sparkSide vs $mirror")
    }
  }
}
