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
