package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** bpeTrainFast (one corpus scan + local incremental merge loop) must be
  * row-for-row identical to bpeTrain (one Spark job per round) — same
  * argmax, same (cnt desc, a, b) tie-break, same exhaustion — because
  * q144/q147 ship the fast path against oracles that replay the
  * round-by-round recurrence.
  */
class CorpusBpeFastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("fast == distributed on the fixture corpus, 5 and 10 merges") {
    // 10, not deeper: bpeTrain's per-round lineage nests the logical plan,
    // and by ~20 rounds the accumulated plan machinery OOMs the test JVM —
    // the measured form of the exact scaling defect bpeTrainFast removes
    // (deeper equality is covered by the small-corpus tests below, whose
    // recurrences exhaust while the lineage is still shallow)
    for (n <- Seq(5, 10)) {
      val slow = Corpus.bpeTrain(fixture, col("text"), n)
        .orderBy(col("step")).collect().map(_.toSeq)
      val fast = Corpus.bpeTrainFast(fixture, col("text"), n)
        .orderBy(col("step")).collect().map(_.toSeq)
      assert(fast.length == slow.length, s"n=$n: ${fast.length} vs ${slow.length} rows")
      fast.zip(slow).foreach { case (f, s) => assert(f == s, s"n=$n: $f vs $s") }
    }
  }

  test("fast == distributed through exhaustion (merges run dry)") {
    import spark.implicits._
    val tiny = Seq("ab ab cd", "ab cd cd").toDF("text")
    val slow = Corpus.bpeTrain(tiny, col("text"), 50)
      .orderBy(col("step")).collect().map(_.toSeq)
    val fast = Corpus.bpeTrainFast(tiny, col("text"), 50)
      .orderBy(col("step")).collect().map(_.toSeq)
    assert(fast.toSeq == slow.toSeq)
    assert(fast.nonEmpty && fast.length < 50, "must exhaust before 50 merges")
  }

  test("merge loop handles repeated symbols (aaa) like the replayed recurrence") {
    import spark.implicits._
    val rep = Seq("aaaa aaa aa").toDF("text")
    val slow = Corpus.bpeTrain(rep, col("text"), 5)
      .orderBy(col("step")).collect().map(_.toSeq)
    val fast = Corpus.bpeTrainFast(rep, col("text"), 5)
      .orderBy(col("step")).collect().map(_.toSeq)
    assert(fast.toSeq == slow.toSeq)
  }

  test("pure loop: tie-break picks lexicographically smallest (a, b)") {
    // "xy" and "pq" both appear twice; (p,q) < (x,y) lexicographically
    val vocab = Array(("xy", 2L), ("pq", 2L))
    val m = Corpus.bpeMergeLoop(vocab, 1)
    assert(m.head == ((1, "p", "q", 2L)), m.toString)
  }

  test("maxVocab cap bounds the collected frame deterministically") {
    import spark.implicits._
    val docs = Seq("aa aa aa bb bb cc").toDF("text")
    // cap to the top-2 words: cc (count 1) is pruned, so its pairs never
    // train; the remaining recurrence proceeds normally
    val m = Corpus.bpeTrainFast(docs, col("text"), 10, maxVocab = 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(m.nonEmpty && !m.contains(("c", "c")), m.mkString(","))
  }
}
