package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CurationStream

/** Hand fixture through the INGEST-time curation funnel: one doc per
  * elimination stage, plus the one deliberate batch/stream divergence —
  * near-dup policy (keep-best vs first-occurrence-wins) — pinned
  * explicitly against [[graft.operators.Pipeline.curate]].
  */
class CurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // doc 1: clean keeper; doc 2: exact dup of 1; doc 3: LONGER near-dup of
  // 1 (keep-best would prefer it; first-wins drops it); doc 4: Spanish;
  // doc 6: identical to benchmark doc 10 → contaminated
  private val docA = "the quick brown fox jumps over the lazy dog in the morning"
  private val docA2 = docA.replace("morning", "evening") +
    " again and again and again"
  private val benchText = "the benchmark question about spark and the vectors is in the data"
  private def corpus = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, docA),
      (2L, docA),
      (3L, docA2),
      (4L, "el perro de la casa que y los gatos corren"),
      (6L, benchText),
      (10L, benchText)).toDF("doc_id", "text")
  }

  private def flags(nBatches: Int) =
    CurationStream.replayFunnel(spark, corpus, col("doc_id"), col("text"),
        benchPred = col("doc_id") === 10, nBatches = nBatches)
      .collect()
      .map(r => r.getLong(0) -> (1 to 6).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))).toVector)
      .toMap

  test("each stage eliminates its doc; flags NULL-stage correctly; first-wins keeps the earlier near-dup") {
    val f = flags(nBatches = 4)
    val T = Some(true); val F = Some(false); val N = None
    //                    lang   qual   exact  near   decon  kept
    assert(f(1L) == Vector(T,     T,     T,     T,     T,     T))
    assert(f(2L) == Vector(T,     T,     F,     N,     N,     F))
    assert(f(3L) == Vector(T,     T,     T,     F,     N,     F), "first-wins drops the later near-dup")
    assert(f(4L)(0) == F)
    assert(f(4L)(5) == F)
    assert(f(6L) == Vector(T,     T,     T,     T,     F,     F), "benchmark copy is contaminated")
    assert(!f.contains(10L), "benchmark docs are index, not output")
  }

  test("funnel output is invariant to the micro-batch split") {
    assert(flags(1) == flags(4))
    assert(flags(4) == flags(6))
  }

  test("batch keep-best and streaming first-wins diverge exactly on the near-dup cluster") {
    val batch = graft.operators.Pipeline.curate(corpus, col("doc_id"),
        col("text"), benchPred = col("doc_id") === 10)
      .collect()
      .map(r => r.getLong(0) -> (1 to 6).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))).toVector)
      .toMap
    val stream = flags(4)
    // keep-best prefers the longer doc 3; first-wins admitted doc 1 first
    assert(batch(3L)(3) == Some(true) && batch(1L)(3) == Some(false))
    assert(stream(1L)(3) == Some(true) && stream(3L)(3) == Some(false))
    // every doc OUTSIDE the divergent cluster carries identical flags
    Seq(2L, 4L).foreach(id => assert(batch(id) == stream(id), s"doc $id"))
    // doc 6 is decontam-checked in both, against the same benchmark index
    assert(batch(6L)(4) == Some(false) && stream(6L)(4) == Some(false))
  }
}
