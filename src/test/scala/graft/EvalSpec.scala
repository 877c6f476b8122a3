package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def auc(rows: Seq[(Long, Double)]) = {
    import spark.implicits._
    Eval.aucROC(rows.toDF("pos", "score"), col("pos"), col("score"))
      .collect().head
  }

  // auc is emitted as DECIMAL(18,6) (hash-exact for the driver compare)
  private def aucVal(r: org.apache.spark.sql.Row): Double =
    r.getAs[java.math.BigDecimal]("auc").doubleValue

  test("perfect separation gives AUC 1, inverted gives 0") {
    val sep = auc(Seq((0L, 0.1), (0L, 0.2), (1L, 0.8), (1L, 0.9)))
    assert(aucVal(sep) == 1.0)
    val inv = auc(Seq((1L, 0.1), (1L, 0.2), (0L, 0.8), (0L, 0.9)))
    assert(aucVal(inv) == 0.0)
  }

  test("hand-computed tie-aware Mann-Whitney on a 6-row set") {
    // scores asc: 0.1(neg) 0.2(pos,neg tie) 0.2 0.5(pos) 0.7(neg) 0.9(pos)
    // ranks:      1        2.5  2.5         4        5         6
    // R+ = 2.5 + 4 + 6 = 12.5 ; n+=3 n-=3
    // AUC = (12.5 - 3*4/2) / 9 = 6.5/9 = 0.722222...
    val r = auc(Seq((0L, 0.1), (1L, 0.2), (0L, 0.2),
      (1L, 0.5), (0L, 0.7), (1L, 0.9)))
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 3)
    // auc_num = 2R+ - n+(n++1) = 25 - 12 = 13 ; auc_den = 2*3*3 = 18
    assert(r.getAs[java.math.BigDecimal]("auc_num").longValueExact == 13L)
    assert(r.getAs[java.math.BigDecimal]("auc_den").longValueExact == 18L)
    assert(aucVal(r) == 0.722222)
  }

  test("all-one-class yields NULL auc, not a crash") {
    val r = auc(Seq((1L, 0.3), (1L, 0.7)))
    assert(r.getAs[Long]("n_neg") == 0 && r.isNullAt(r.fieldIndex("auc")))
  }

  test("random-score AUC sits near 0.5 and matches a local recompute") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      (if (rnd.nextBoolean()) 1L else 0L, math.floor(rnd.nextDouble * 50) / 50)
    }
    val r = auc(rows)
    // local recompute with average ranks
    val sorted = rows.sortBy(_._2)
    val byScore = sorted.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L; var rPos = 0.0
    byScore.foreach { case (_, g) =>
      val c = g.size
      rPos += g.count(_._1 == 1L) * (cum + (c + 1) / 2.0)
      cum += c
    }
    val nPos = rows.count(_._1 == 1L); val nNeg = rows.size - nPos
    val want = (rPos - nPos * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
    assert(math.abs(aucVal(r) - want) < 1e-6)
    assert(aucVal(r) > 0.4 && aucVal(r) < 0.6)
  }

  test("calibration bins integer scores into equal-width bands, exact rates") {
    import spark.implicits._
    // scores 0..9, nBins=5 over [0,9]: width hi-lo+1 = 10, bin = s*5 div 10
    // → each bin holds scores {2b, 2b+1}: n = 2, n_pos = 1, rate 0.5
    val rows = (0 to 9).map(s => ((s % 2).toLong, s.toLong))
    val got = Eval
      .calibration(rows.toDF("pos", "score"), col("pos"), col("score"), 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == (0 to 4).map(b => (b.toLong, 2L, 1L, 500000L)))
  }

  test("calibration degenerate range lands everything in bin 0") {
    import spark.implicits._
    val rows = Seq((1L, 7L), (0L, 7L), (1L, 7L))
    val got = Eval
      .calibration(rows.toDF("pos", "score"), col("pos"), col("score"), 10)
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 0 && got(0).getLong(1) == 3 &&
      got(0).getLong(2) == 2)
    assert(got(0).getLong(3) == 666667L) // round-half-away(2/3 · 10⁶)
  }
}
