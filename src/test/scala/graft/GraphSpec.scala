package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Hand-computed fixed-point PageRank rounds on a path graph plus an
  * isolated node — the integer recurrence is exactly checkable by hand.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two rounds on 1-2-3 path match hand-computed integer ranks") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Graph.pagerank(nodes, edges, iters = 2).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("rank")).toMap
    // round 1: r(1)=r(3)=150e9+85%*500e9=575e9; r(2)=150e9+85%*2000e9=1850e9
    // round 2: inflow(1)=1850e9 div 2=925e9 -> 150e9+786_250e6=936_250e6
    //          inflow(2)=575e9+575e9 -> 150e9+977_500e6=1_127_500e6
    assert(r(1L) == 936_250_000_000L)
    assert(r(2L) == 1_127_500_000_000L)
    assert(r(3L) == 936_250_000_000L)
    assert(r(9L) == 150_000_000_000L, "isolated node holds teleport mass only")
  }

  test("rank mass stays bounded and every node is ranked") {
    import spark.implicits._
    val nodes = (1L to 20L).toDF("doc_id")
    val edges = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Graph.pagerank(nodes, edges, iters = 5).collect()
    assert(out.length == 20)
    val total = out.map(_.getAs[Long]("rank")).sum
    // damping keeps total mass <= n*scale; integer floors only shrink it
    assert(total <= 20L * 1000000000000L && total > 0L)
  }
}
