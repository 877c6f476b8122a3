package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Misra-Gries guarantees must hold for every partitioning of the input —
  * the merge path (Mergeable Summaries rule) is exercised by repartitioning
  * the same stream 1/4/32 ways and asserting the same order-independent
  * contracts the q67 gate checks: superset above n/(k+1), est ≤ true,
  * true − est ≤ n/(k+1), ≤ k items.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mgItems(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    items.toDF("term").repartition(parts)
      .agg(call_function("graft_heavyhitters", col("term"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def check(items: Seq[String], k: Int, parts: Int): Unit = {
    val mg = mgItems(items, k, parts)
    val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val bound = items.size.toDouble / (k + 1)
    assert(mg.size <= k, s"parts=$parts size ${mg.size} > k=$k")
    val missed = exact.filter { case (i, c) => c > bound && !mg.contains(i) }
    assert(missed.isEmpty, s"parts=$parts missed heavy items: $missed")
    mg.foreach { case (i, est) =>
      val c = exact(i)
      assert(est <= c, s"parts=$parts overestimate $i: $est > $c")
      assert(c - est <= bound + 1e-9, s"parts=$parts loose $i: $c - $est > $bound")
    }
  }

  test("skewed zipf-ish stream honors all guarantees at 1, 4, 32 partitions") {
    val rnd = new Random(7)
    // 20 heavy items (geometric weights) over a 2000-item tail
    val stream = Seq.fill(20000) {
      val r = rnd.nextInt(100)
      if (r < 60) s"hot${rnd.nextInt(20)}" else s"cold${rnd.nextInt(2000)}"
    }
    Seq(1, 4, 32).foreach(check(stream, 50, _))
  }

  test("fewer distinct items than k: sketch is exact") {
    val rnd = new Random(11)
    val stream = Seq.fill(5000)(s"w${rnd.nextInt(30)}")
    val mg = mgItems(stream, 50, 8)
    val exact = stream.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    assert(mg == exact)
  }

  test("adversarial uniform stream never violates size or underestimate") {
    val stream = (0 until 10000).map(i => s"u${i % 500}")
    check(stream, 20, 16)
  }
}
