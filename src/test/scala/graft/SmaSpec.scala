package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sma

class SmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), "H0", v)
    }.toDF("seq", "ts", "hub", "price_mwh")
  }

  private def flags(vals: Seq[Double]) =
    Sma.rollingAnomalies(df(vals), col("hub"), col("price_mwh"),
        Seq(col("ts"), col("seq")))
      .collect().map(_.getAs[Long]("seq")).toSet

  test("planted spike on a noisy base is flagged; the base itself is not") {
    // alternating ±0.5 noise around 50, one +30 spike at index 30
    val vals = Seq.tabulate(40)(i =>
      if (i == 30) 80.0 else 50.0 + (if (i % 2 == 0) 0.5 else -0.5))
    assert(flags(vals) == Set(30L))
  }

  test("constant series never flags (dev = 0 beats any threshold)") {
    assert(flags(Seq.fill(40)(75.25)).isEmpty)
  }

  test("partial windows are excluded: a wild tick before 20 history is silent") {
    val vals = Seq.tabulate(15)(i => if (i == 10) 500.0 else 50.0)
    assert(flags(vals).isEmpty)
  }

  test("integer test matches a local double z-score recompute on random data") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.tabulate(200)(_ => math.floor(rnd.nextDouble * 10000) / 100)
    val got = flags(vals)
    val expect = (19 until 200).filter { i =>
      val w = vals.slice(i - 19, i + 1).map(v => math.round(v * 100))
      val n = 20L; val s = w.sum; val q = w.map(x => x * x).sum
      val dev = n * w.last - s
      (n - 1) * dev * dev > 9L * n * (n * q - s * s)
    }.map(_.toLong).toSet
    assert(got == expect)
  }
}
