package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.Corpus

/** Bloom filter aggregate contracts: no false negatives ever, bounded
  * false-positive rate at the documented sizing, merge-order independence.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every inserted key is contained; fpp on fresh keys stays near theory") {
    val sp = spark
    import sp.implicits._
    GraftFunctions.register(spark)
    val n = 10000
    val inserted = (0L until n).toDF("k")
    val sketch = inserted.agg(
      call_function("graft_bloom", col("k"), lit(1 << 17), lit(7)).as("bf"))
    // no false negatives: all n inserted keys probe true
    val fn = inserted.crossJoin(broadcast(sketch))
      .filter(!call_function("graft_bloom_contains", col("bf"), col("k")))
      .count()
    assert(fn == 0, "a Bloom filter must never miss an inserted key")
    // false positives on 10k fresh keys: m/n ≈ 13 bits/key, k=7 → ~0.5%
    val fresh = (1000000L until 1000000L + n).toDF("k")
    val fp = fresh.crossJoin(broadcast(sketch))
      .filter(call_function("graft_bloom_contains", col("bf"), col("k")))
      .count()
    assert(fp < n * 0.03, s"fpp ${fp.toDouble / n} far above theory (~0.005)")
  }

  test("merge is order-independent: sharded build equals single-partition build") {
    val sp = spark
    import sp.implicits._
    GraftFunctions.register(spark)
    val keys = (0L until 5000L).toDF("k")
    def bytesOf(parts: Int): Seq[Byte] =
      keys.repartition(parts).agg(
        call_function("graft_bloom", col("k"), lit(1 << 16), lit(5)).as("bf"))
        .head().getAs[Array[Byte]](0).toSeq
    assert(bytesOf(1) == bytesOf(13),
      "bitwise-OR merge must make partitioning invisible")
  }

  test("cms: never undercounts, exact on a sparse key set, merge-order independent") {
    val sp = spark
    import sp.implicits._
    GraftFunctions.register(spark)
    // 100 distinct keys with known multiplicities i+1, far under width:
    // no collisions expected -> estimates exactly equal counts
    val rows = (0L until 100L).flatMap(i => Seq.fill(i.toInt + 1)(i)).toDF("k")
    def sketchOf(parts: Int): Array[Byte] =
      rows.repartition(parts).agg(
        call_function("graft_cms", col("k"), lit(4), lit(1 << 14)))
        .head().getAs[Array[Byte]](0)
    val bytes = sketchOf(1)
    assert(bytes.toSeq == sketchOf(11).toSeq,
      "counter addition must make partitioning invisible")
    val est = rows.distinct()
      .select(col("k"),
        call_function("graft_cms_est", lit(bytes), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 100L).foreach { i =>
      assert(est(i) >= i + 1, "cms must never undercount")
      assert(est(i) == i + 1, s"sparse keys must estimate exactly: $i -> ${est(i)}")
    }
  }

  test("decontaminateBloom upper-bounds the exact pass and flags a superset") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Corpus.decontaminate(docs, col("doc_id"), col("text"),
        evalPred = col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("n_hit").as("x"), col("contaminated").as("xf"))
    val bloom = Corpus.decontaminateBloom(docs, col("doc_id"), col("text"),
        evalPred = col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("n_hit").as("b"), col("contaminated").as("bf"))
    val j = exact.join(bloom, Seq("doc_id")).cache()
    assert(j.count() > 0)
    assert(j.filter(col("b") < col("x")).count() == 0, "no false negatives")
    assert(j.filter(col("xf") && !col("bf")).count() == 0, "flag superset")
  }
}
