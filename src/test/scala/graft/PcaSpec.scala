package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pca, Similarity}

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("eigenJacobi: hand-computed 2x2 — [[2,1],[1,2]] -> 3,1 at ±45°") {
    val (eigs, vecs) = Pca.eigenJacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eigs(0) - 3.0) < 1e-12 && math.abs(eigs(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    // sign pin: largest-|component| coordinate positive
    assert(math.abs(vecs(0)(0) - r) < 1e-12 && math.abs(vecs(0)(1) - r) < 1e-12)
    assert(math.abs(math.abs(vecs(1)(0)) - r) < 1e-12 &&
      math.abs(math.abs(vecs(1)(1)) - r) < 1e-12 &&
      vecs(1)(0) * vecs(1)(1) < 0, "second vector is the (1,-1) direction")
  }

  test("eigenJacobi: deterministic 8x8 — orthonormal V, A·v = λ·v, Σλ = tr") {
    val d = 8
    // deterministic symmetric test matrix (diagonally varied, full coupling)
    val a = Array.tabulate(d, d)((i, j) =>
      if (i == j) 3.0 + i else 1.0 / (1.0 + i + j))
    val (eigs, vecs) = Pca.eigenJacobi(a)
    for (i <- 0 until d; j <- i until d) {
      var dp = 0.0
      for (x <- 0 until d) dp += vecs(i)(x) * vecs(j)(x)
      assert(math.abs(dp - (if (i == j) 1.0 else 0.0)) < 1e-10,
        s"orthonormality ($i,$j)")
    }
    for (c <- 0 until d; i <- 0 until d) {
      var av = 0.0
      for (x <- 0 until d) av += a(i)(x) * vecs(c)(x)
      assert(math.abs(av - eigs(c) * vecs(c)(i)) < 1e-9, s"eigenpair $c row $i")
    }
    var tr = 0.0
    for (i <- 0 until d) tr += a(i)(i)
    assert(math.abs(eigs.sum - tr) < 1e-9, "trace preserved")
    assert((1 until d).forall(c => eigs(c - 1) >= eigs(c)), "descending")
  }

  test("fit + transform on the fixture: projections match a driver replay") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
    val model = Pca.fit(emb)
    val k = 4
    val got = Pca.transform(emb, model, k)
      .filter(col("vec_id") < 3).orderBy(col("vec_id")).collect()
    val raw = emb.filter(col("vec_id") < 3).orderBy(col("vec_id"))
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .collect()
    assert(got.length == raw.length && got.nonEmpty)
    got.zip(raw).foreach { case (g, r) =>
      val v = r.getSeq[Double](1).toArray
      for (c <- 0 until k) {
        var dp = 0.0
        for (i <- 0 until v.length)
          dp += (v(i) - model.mean(i)) * model.components(c)(i)
        assert(math.abs(g.getAs[Double](s"pc$c") - dp) < 1e-9,
          s"vec ${g.get(0)} pc$c")
      }
    }
  }

  test("qualityReport: every contract boolean true on the fixture") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
    val rep = Pca.qualityReport(emb, k = 8, varFloor = 0.05).collect()
    assert(rep.length == 8)
    rep.foreach(r => assert(r.getAs[Boolean]("ok"), r.getAs[String]("metric")))
  }
}
