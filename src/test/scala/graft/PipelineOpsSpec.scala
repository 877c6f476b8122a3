package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Eval, Pipeline, Snapshots}

/** The round-9 pipeline additions: chunk planning, snapshot diff, Cohen's
  * kappa — each pinned by hand-computed cases before its oracle gate.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- Corpus.chunkPlan ----

  private def chunksOf(text: String, chunk: Int, overlap: Int) = {
    import spark.implicits._
    Corpus.chunkPlan(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunk, overlap)
      .orderBy(col("chunk_idx"))
      .collect().map(r => (r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
  }

  test("chunkPlan: short doc = one whole-doc chunk") {
    assert(chunksOf("a b c", 32, 8).toSeq == Seq((0L, 0L, 3L)))
  }

  test("chunkPlan: exact-boundary doc still one chunk") {
    val text = (1 to 32).map(i => s"t$i").mkString(" ")
    assert(chunksOf(text, 32, 8).toSeq == Seq((0L, 0L, 32L)))
  }

  test("chunkPlan: 33 tokens = 2 chunks sharing 8-token overlap window") {
    val text = (1 to 33).map(i => s"t$i").mkString(" ")
    // stride 24: [0,32) and [24,33) — 8 shared tokens at the seam
    assert(chunksOf(text, 32, 8).toSeq == Seq((0L, 0L, 32L), (1L, 24L, 33L)))
  }

  test("chunkPlan: 100 tokens = 4 chunks, every token covered") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val cs = chunksOf(text, 32, 8)
    assert(cs.length == 4, cs.mkString(","))
    assert(cs.head._2 == 0L && cs.last._3 == 100L)
    // consecutive chunks overlap by exactly `overlap` except a short tail
    cs.sliding(2).foreach { case Array((_, _, e1), (_, s2, _)) =>
      assert(s2 < e1, "windows must overlap")
    }
  }

  test("chunkPlan: empty text yields zero chunks, not a row") {
    assert(chunksOf("", 32, 8).isEmpty)
  }

  // ---- Snapshots.diff ----

  test("diff classifies added/removed/changed/unchanged on a hand case") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("doc_id", "text")
    val got = Snapshots.diff(oldSnap, newSnap, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  // ---- Eval.cohensKappa ----

  private def kappaOf(pairs: Seq[(Long, Long)]): (Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = Eval.cohensKappa(pairs.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    (r.getAs[Long]("n"), r.getAs[Long]("n_agree"),
      if (r.isNullAt(2)) None else Some(r.getAs[Long]("kappa_micro")))
  }

  test("kappa: perfect agreement = 1.0") {
    assert(kappaOf(Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 0L))) ==
      ((4L, 4L, Some(1000000L))))
  }

  test("kappa: hand-computed textbook 2x2 case") {
    // the classic: a=20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    // po = 35/50; pe = (25*30 + 25*20)/2500 = 1250/2500
    // kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4
    val pairs = Seq.fill(20)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(15)((0L, 0L))
    assert(kappaOf(pairs) == ((50L, 35L, Some(400000L))))
  }

  test("kappa: both raters constant -> NULL (pe = 1), not a crash") {
    assert(kappaOf(Seq((1L, 1L), (1L, 1L))) == ((2L, 2L, None)))
  }

  test("kappa: agreement no better than chance sits at 0") {
    // independent uniform raters over {0,1}, balanced: po = pe = 0.5
    val pairs = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
    assert(kappaOf(pairs) == ((4L, 2L, Some(0L))))
  }

  // ---- Corpus.boilerplatePrefix ----

  test("boilerplate: planted header wins per source, ties break to smaller prefix") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "HEADER X Y body one"), ("s1", "HEADER X Y body two"),
      ("s1", "free text here"),
      // s2: two prefixes tied at 1 -> alphabetically smaller one wins
      ("s2", "alpha beta gamma d"), ("s2", "zeta eta theta d")
    ).toDF("source", "text")
    val got = Corpus.boilerplatePrefix(docs, col("source"), col("text"), 3)
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("s1", "HEADER X Y", 2L, 3L),
      ("s2", "alpha beta gamma", 1L, 2L)))
  }

  test("boilerplate: docs shorter than k use their whole text as prefix") {
    import spark.implicits._
    val docs = Seq(("s", "hi"), ("s", "hi"), ("s", "longer text here")).toDF("source", "text")
    val got = Corpus.boilerplatePrefix(docs, col("source"), col("text"), 3)
      .collect().head
    assert(got.getString(1) == "hi" && got.getLong(2) == 2L)
  }

  // ---- Pipeline.leakFreeSplit ----

  test("leakFreeSplit: a test doc near-duplicating a train doc becomes leak") {
    import spark.implicits._
    // construct docs where the hash split is known, then plant a near-dup
    // pair crossing the boundary; everything else is unique text
    val base = (0L until 40L).map(i => (i, s"unique text body number $i with filler words $i"))
    val assign = Corpus.splitAssign(base.toDF("doc_id", "text"), col("doc_id"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val trainId = assign.collectFirst { case (id, "train") => id }.get
    val testId = assign.collectFirst { case (id, s) if s != "train" => id }.get
    // make testId a near-dup of trainId (identical long text)
    val dupText = "shared shingle text with many overlapping tokens across the pair " * 3
    val docs = base.map { case (id, t) =>
      if (id == trainId || id == testId) (id, dupText) else (id, t)
    }.toDF("doc_id", "text")
    val out = Pipeline.leakFreeSplit(docs, col("doc_id"), col("text"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(trainId) == "train", "train side keeps its assignment")
    assert(out(testId) == "leak", s"cross-boundary near-dup must leak: ${out(testId)}")
    // untouched docs keep their hash assignment
    (out.keySet - trainId - testId).foreach { id =>
      assert(out(id) == assign(id), s"doc $id reassigned without a dup edge")
    }
  }

  // ---- plan-shape assertions (the 100 TB contracts) ----

  test("chunkPlan plan: Generate (explode) runs scan-side, no Exchange below it") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, ("w " * 50).trim)).toDF("doc_id", "text")
    val df = Corpus.chunkPlan(docs, col("doc_id"), col("text"), 32, 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Exchange"), s"chunk planning must be shuffle-free:\n$plan")
    assert(!plan.contains("Window"), s"no window function allowed:\n$plan")
  }

  test("boilerplatePrefix plan: no window function, totals broadcast back") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (s"s${i % 3}", s"a b c d $i")).toDF("source", "text")
    val df = Corpus.boilerplatePrefix(docs, col("source"), col("text"), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmax must be the min-struct agg, not a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"totals frame must broadcast:\n$plan")
  }

  test("chunkPlan property: windows tile [0, n_tok) at fixed stride for 60 random shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 60).foreach { _ =>
      val chunk = 2 + rnd.nextInt(40)
      val overlap = rnd.nextInt(chunk) // 0 <= overlap < chunk
      val nTok = rnd.nextInt(150)
      val text = (1 to nTok).map(i => s"t$i").mkString(" ")
      val cs = Corpus.chunkPlan(Seq((1L, text)).toDF("doc_id", "text"),
          col("doc_id"), col("text"), chunk, overlap)
        .orderBy(col("chunk_idx"))
        .collect().map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
      if (nTok == 0) assert(cs.isEmpty, s"($chunk,$overlap,$nTok)")
      else {
        val stride = chunk - overlap
        assert(cs.head._1 == 0L && cs.last._2 == nTok, s"($chunk,$overlap,$nTok): ${cs.mkString}")
        cs.zipWithIndex.foreach { case ((st, en), i) =>
          assert(st == i.toLong * stride, s"start drift ($chunk,$overlap,$nTok)")
          assert(en == math.min(st + chunk, nTok.toLong), s"end ($chunk,$overlap,$nTok)")
        }
        // no window starts at or past the end of the previous one's coverage
        cs.sliding(2).foreach {
          case Array((_, e1), (s2, _)) => assert(s2 <= e1, s"gap ($chunk,$overlap,$nTok)")
          case _ =>
        }
      }
    }
  }

  test("kappa property: invariant under consistent category relabeling") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(4).toLong))
    val base = kappaOf(pairs)
    // relabel k -> (k * 3 + 1) % 4 is a bijection on {0..3}; kappa is a
    // function of the contingency structure, not the label values
    val relabeled = pairs.map { case (a, b) => ((a * 3 + 1) % 4, (b * 3 + 1) % 4) }
    assert(kappaOf(relabeled) == base)
  }
}
