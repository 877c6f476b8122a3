package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Kmeans, Similarity}

class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def vecs = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))

  private def cents0 = vecs.filter(col("vec_id") < 4)
    .select(col("vec_id").as("cid"), col("v").as("cv"))

  test("q12Fast: fast quantization equals BigDecimal.valueOf.setScale(12) " +
      "wherever it answers (adversarial boundaries + random magnitudes)") {
    def ref(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP)
    def check(x: Double): Unit = {
      val q = Kmeans.q12Fast(x)
      if (q != Long.MinValue) {
        val r = ref(x)
        assert(java.math.BigDecimal.valueOf(q, 12).compareTo(r) == 0,
          s"q12Fast($x) = $q but reference = $r")
      } // sentinel: the caller runs the reference itself — nothing to pin
    }
    // exact half-boundary decimals (HALF_UP must round away from zero; the
    // fast path may answer or refuse, but never answer wrong)
    for (k <- Seq(0L, 1L, 2L, 999L, 123456L, 999999999999L);
         s <- Seq(1, -1)) {
      check(s * (k + 0.5) / 1e12)
      check(s * (k.toDouble + 0.4999999999) / 1e12)
      check(s * (k.toDouble + 0.5000000001) / 1e12)
    }
    // specials and extremes
    Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      1e-300, -1e-300, 4503.6, -4503.6, 4.5e15, 9.3e6, -9.3e6, 1e9, 1e18,
      0.1, 0.2, 0.3, 1.0 / 3.0, math.Pi, -math.E).foreach(check)
    assert(Kmeans.q12Fast(Double.NaN) == Long.MinValue)
    assert(Kmeans.q12Fast(Double.PositiveInfinity) == Long.MinValue)
    // random magnitudes across the whole embedding-product range
    val rnd = new scala.util.Random(42)
    (0 until 200000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(26) - 16)
      check(x)
    }
    // and the fixture's own values/products must mostly take the fast path
    // (the win is real, not a fallback in disguise)
    val sample = vecs.limit(200).collect().map(_.getSeq[Double](1))
    val prods = sample.flatMap(v => v.indices.flatMap(i =>
      (i until v.size).map(j => v(i) * v(j))))
    prods.foreach(check)
    val fastShare = prods.count(p =>
      Kmeans.q12Fast(p) != Long.MinValue).toDouble / prods.length
    assert(fastShare > 0.99, s"fast-path share $fastShare unexpectedly low")
  }

  test("covarianceMatrix: long-lane kernel equals a pure-BigDecimal " +
      "reference on the fixture (bit parity)") {
    // driver-side reference: the original BigDecimal spelling of the same
    // closed form, over the collected fixture vectors
    val vs = vecs.collect().map(_.getSeq[Double](1).toArray)
    val d = vs.head.length
    val n = vs.length.toLong
    def q(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    val sums = Array.fill(d)(java.math.BigDecimal.ZERO)
    val acc = Array.fill(d * (d + 1) / 2)(java.math.BigDecimal.ZERO)
    vs.foreach { v =>
      var idx = 0
      var i = 0
      while (i < d) {
        sums(i) = sums(i).add(q(v(i)))
        var j = i
        while (j < d) { acc(idx) = acc(idx).add(q(v(i) * v(j))); idx += 1; j += 1 }
        i += 1
      }
    }
    val mu = sums.map(_.doubleValue / n)
    val want = scala.collection.mutable.Map.empty[(Int, Int), Double]
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      want((i, j)) = java.math.BigDecimal
        .valueOf((acc(idx).doubleValue - n * mu(i) * mu(j)) / (n - 1))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
      idx += 1
    }
    val got = Kmeans.covarianceMatrix(
        Tables.load(spark, sf, "embeddings")).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Double]("cov"))
      .toMap
    assert(got.size == d * (d + 1) / 2)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(want(k)), s"cell $k: $v != ${want(k)}")
    }
  }

  test("covarianceMatrix: hand-computed 2-dim upper triangle") {
    import spark.implicits._
    // vectors (1,2) (3,4) (5,0): mu=(3,2)
    // cov(0,0)=(35-27)/2=4  cov(0,1)=(14-18)/2=-2  cov(1,1)=(20-12)/2=4
    val emb = Seq(Array(1f, 2f), Array(3f, 4f), Array(5f, 0f))
      .toDF("embedding")
    val got = Kmeans.covarianceMatrix(emb).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("cov")))).toMap
    assert(got.keySet == Set((0, 0), (0, 1), (1, 1)), "upper triangle only")
    assert(got((0, 0)) == ((3L, 4.0)) && got((0, 1)) == ((3L, -2.0))
      && got((1, 1)) == ((3L, 4.0)))
  }

  test("covarianceMatrix skips null vectors instead of NPEing") {
    import spark.implicits._
    val emb = Seq(Some(Array(1f, 2f)), None, Some(Array(3f, 4f)),
      Some(Array(5f, 0f)))
      .toDF("embedding")
    val got = Kmeans.covarianceMatrix(emb).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("cov")))).toMap
    // same three non-null vectors as the hand-computed case above
    assert(got((0, 0)) == ((3L, 4.0)) && got((0, 1)) == ((3L, -2.0))
      && got((1, 1)) == ((3L, 4.0)))
  }

  test("covarianceMatrix rejects ragged dims across partitions") {
    import spark.implicits._
    // one dim-2 vector in one partition, one dim-3 vector in the other:
    // each partition's local require passes; only the cross-partition
    // check can catch the mismatch
    val emb = spark.createDataset(Seq(Array(1f, 2f), Array(1f, 2f, 3f)))
      .repartition(2).toDF("embedding")
    val ex = intercept[Exception] {
      Kmeans.covarianceMatrix(emb).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("ragged")), msgs(ex).mkString(" | "))
  }

  test("assign puts every vector in exactly one cluster, seeds at distance 0") {
    val a = Kmeans.assign(vecs, cents0)
    assert(a.count() == vecs.count())
    // each seed vector is its own centroid: dist2 == 0, cluster == own id
    val seeds = a.filter(col("vec_id") < 4)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("cluster"), r.getAs[Double]("dist2")))
    assert(seeds.length == 4 &&
      seeds.forall { case (id, cl, d) => cl == id && math.abs(d) < 1e-9 })
  }

  test("update computes the per-cluster arithmetic mean, dimension-exact") {
    val a = Kmeans.assign(vecs, cents0)
    val got = Kmeans.update(a).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[collection.Seq[Double]]("cv")).toMap
    // recompute locally: decimal-rounded component sums / count, like the op
    val rows = a.select(col("cluster"), col("v")).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[collection.Seq[Double]]("v")))
    val dim = rows.head._2.size
    rows.groupBy(_._1).foreach { case (cl, vs) =>
      val n = vs.size
      val mean = (0 until dim).map { i =>
        val s = vs.map(v => BigDecimal(v._2(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        (s.toDouble / n)
      }
      got(cl).zip(mean).zipWithIndex.foreach { case ((g, m), i) =>
        assert(math.abs(g - m) < 1e-12, s"cluster $cl dim $i: $g vs $m")
      }
      assert(got(cl).size == dim)
    }
  }

  test("one Lloyd step never increases total inertia") {
    def inertia(steps: Int): Double =
      Kmeans.fitSummary(vecs, cents0, steps).agg(sum(col("inertia")))
        .collect()(0).getDouble(0)
    val i0 = inertia(0)
    val i1 = inertia(1)
    assert(i1 <= i0 + 1e-6, s"inertia rose: $i0 -> $i1")
    assert(i0 > 0.0)
  }

  test("labelScatter matches the hand-computed Fisher decomposition") {
    import spark.implicits._
    // label 0: (0,0),(2,0) -> centroid (1,0), within = 1+1 = 2
    // label 1: (10,0),(12,0) -> centroid (11,0), within = 2
    // global (6,0): between = 2*25 + 2*25 per label
    val emb = Seq(
      (1L, 0, Array(0f, 0f)), (2L, 0, Array(2f, 0f)),
      (3L, 1, Array(10f, 0f)), (4L, 1, Array(12f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Kmeans.labelScatter(emb).orderBy("label").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("n"),
        r.getAs[Double]("within_ss"), r.getAs[Double]("between_ss")))
    assert(out.toSeq == Seq((0, 2L, 2.0, 50.0), (1, 2L, 2.0, 50.0)))
  }
}
