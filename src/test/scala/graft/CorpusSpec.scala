package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Planted-case tests for the corpus-hygiene operators. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tokenizeIds: rank-ordered vocab ids, OOV zero, position order preserved") {
    import spark.implicits._
    // counts: b=4, a=3, c=2, d=1 → vocab(3): b=1, a=2, c=3; d is OOV
    val docs = Seq(
      (1L, "a b c b"),
      (2L, "b a d"),
      (3L, "c b a")
    ).toDF("doc_id", "text")
    val out = Corpus.tokenizeIds(docs, col("doc_id"), col("text"), vocabSize = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_oov"), r.getAs[String]("ids")))).toMap
    assert(out(1L) == ((4L, 0L, "2 1 3 1")))
    assert(out(2L) == ((3L, 1L, "1 2 0")), "d falls outside vocab → id 0")
    assert(out(3L) == ((3L, 0L, "3 1 2")))
  }

  test("decontaminate flags the eval doc copied from train, not the fresh one") {
    import spark.implicits._
    val train = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, train),                                         // train
      (3L, "completely different words nothing shared here at all friend"), // train
      (10L, train),                                        // eval: full copy
      (20L, "totally novel eval content with zero overlap whatsoever now"), // eval: clean
      (30L, "alpha beta gamma then diverging text that keeps going on")     // eval: partial
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(docs, col("doc_id"), col("text"),
        evalPred = col("doc_id") >= 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("frac"), r.getAs[Boolean]("contaminated")))).toMap
    assert(out(10L) == ((1.0, true)), "verbatim copy: every shingle in train")
    assert(out(20L) == ((0.0, false)), "clean doc: no shingle in train")
    // doc 30: 8 shingles, exactly "alpha beta gamma" shared -> 1/8
    assert(out(30L)._1 == 0.125 && !out(30L)._2)
  }

  test("hashSample is deterministic, stratified, and honors 0/1 rates") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "src")
    val rates = Seq(("s0", 1.0), ("s1", 0.0), ("s2", 0.5)).toDF("stratum", "rate")
    def run() = Corpus.hashSample(rows, col("doc_id"), col("src"), rates)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("stratum"))).toSet
    val a = run()
    assert(a == run(), "same inputs must select the same rows")
    val bySrc = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("s0") == 100, "rate 1.0 keeps every row")
    assert(!bySrc.contains("s1"), "rate 0.0 keeps none")
    val s2 = bySrc("s2")
    assert(s2 > 25 && s2 < 75, s"rate 0.5 keeps about half, got $s2")
    assert(!a.exists(_._2 == "s3"), "strata absent from rates are dropped")
  }

  test("hashSample keeps high ids proportional to rate (pmod overflow guard)") {
    import spark.implicits._
    // ids past 2^63 / 2654435761 wrap the product negative: `%` would keep
    // 100% of them at any rate; pmod must keep ~rate
    val base = 4_000_000_000L
    val rows = (0L until 1000L).map(i => (base + i, "hot")).toDF("doc_id", "src")
    val rates = Seq(("hot", 0.1)).toDF("stratum", "rate")
    val kept = Corpus.hashSample(rows, col("doc_id"), col("src"), rates).count()
    assert(kept > 0 && kept < 300,
      s"rate 0.1 over wrapped ids must not keep everything: kept $kept/1000")
  }

  test("mixWeights: weights normalize to 1, targets hit budget exactly, α flattens") {
    import spark.implicits._
    val docs = (0L until 500L).map(i =>
      (i, if (i < 400) "big" else if (i < 480) "mid" else "small"))
      .toDF("doc_id", "source")
    val out = Corpus.mixWeights(docs, col("source"), budget = 1000L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("weight"),
          r.getAs[Long]("target_n")))).toMap
    assert(out("big")._1 == 400 && out("small")._1 == 20)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
    assert(out.values.map(_._3).sum == 1000L,
      "largest-remainder rounding must allocate the budget exactly")
    // every target within 1 of its exact share (the rounding never moves a
    // source by more than one doc)
    out.values.foreach { case (_, w, tn) =>
      assert(math.abs(tn - w * 1000.0) < 1.0, s"target $tn vs exact ${w * 1000.0}")
    }
    // α=0.5 flattens: big's weight < natural share, small's > natural share
    assert(out("big")._2 < 0.8 && out("small")._2 > 0.04)
  }

  test("mixWeights plan reads the corpus exactly once") {
    // the normalizer and deficit are windows over the per-source subtotal
    // frame; an agg + crossJoin formulation re-ran the corpus count scan
    // per consumer (4 scans in the q82 plan before round 6)
    val df = graft.SparkEntry.queries("q82_source_mix")(
      spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 corpus scan, got ${scans.size}")
  }

  test("hashedLinearScore plan: one scan, zero exchanges before the output sort") {
    // the scorer's claim is "scan-side map, no exchange, no state": the
    // only Exchange in q101's physical plan must be the final ORDER BY's
    // range partitioning, and the corpus must be read exactly once
    val df = graft.SparkEntry.queries("q101_quality_classifier")(
      spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 corpus scan, got ${scans.size}")
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).toList
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"expected only the output-sort range exchange, got: $exchanges")
  }

  test("hashedLinearScore: planted weights give the hand-computed score") {
    import spark.implicits._
    // dim-4 weight vector; token feature ids recomputed in Scala with the
    // same portable-hash arithmetic the kernel uses
    val w = Seq(1.0, 10.0, 100.0, 1000.0)
    def h1(tok: String): Long = {
      var fp = 0L
      tok.foreach(c => fp = (fp * 31 + c.toLong) % 1000000007L)
      ((fp * 2654435761L + 40503L) % 4294967296L) & 0xFFFFFFFFL
    }
    val text = "alpha beta gamma alpha"
    val expect = text.split(' ').map(t => w((h1(t) % 4).toInt)).sum
    val out = graft.operators.Corpus.hashedLinearScore(
      Seq((1L, text)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), w).head()
    assert(out.getAs[Double]("score") == expect)
    assert(out.getAs[Long]("n_tokens") == 4L)
    assert(out.getAs[Double]("mean_score") == expect / 4)
    assert(out.getAs[Boolean]("keep"))
  }

  test("unigramSurprisal: rare-vocabulary doc scores above common-vocabulary doc") {
    import spark.implicits._
    val common = "the the the the the the the the the the"
    val docs = Seq(
      (0L, common), (1L, common), (2L, common),
      (3L, "zyx wvu tsr qpo nml kji")).toDF("doc_id", "text")
    val out = Corpus.unigramSurprisal(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("mean_surprisal")))).toMap
    assert(out(0L)._1 == 10 && out(3L)._1 == 6)
    assert(out(3L)._2 > out(0L)._2,
      "six hapax tokens must be more surprising than 'the' repeated")
    assert(out(0L)._2 == out(1L)._2, "identical docs score identically")
  }

  test("splitAssign: deterministic, exhaustive, proportions near fractions") {
    import spark.implicits._
    val rows = (0L until 10000L).toDF("doc_id")
    def run() = Corpus.splitAssign(rows, col("doc_id"),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val a = run()
    assert(a == run(), "same ids must land in the same split every run")
    val byS = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > 7700 && byS("train") < 8300, s"train ${byS("train")}")
    assert(byS("val") > 700 && byS("val") < 1300)
    assert(byS.values.sum == 10000, "every row gets exactly one split")
  }

  test("weightedSample: deterministic, k rows, heavy weights overrepresented") {
    import spark.implicits._
    // 200 heavy rows (w=500) among 800 light (w=5): heavies should take
    // most of a k=100 sample despite being 20% of the corpus
    val rows = (0L until 1000L).map(i => (i, if (i < 200) 500 else 5))
      .toDF("doc_id", "w")
    def run() = Corpus.weightedSample(rows, col("doc_id"), col("w"), k = 100)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id")))
    val a = run()
    assert(a.length == 100 && a.map(_._1).toSeq == (1L to 100L))
    assert(a.sameElements(run()), "same input must select the same sample")
    val heavies = a.count(_._2 < 200L)
    assert(heavies > 60, s"w=500 rows must dominate the sample: got $heavies/100")
  }

  test("packShards equals the sequential prefix sum at any partition count") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // sparse, shuffled ids — placement balance degrades but correctness
    // must not; token counts 1..40
    val docs = rnd.shuffle((0 until 400).toList)
      .map(i => (i * 7L + 3, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 500L
    // sequential reference in id order
    val seq = docs.collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
      .sortBy(_._1)
    var run = 0L
    val expect = seq.map { case (id, n) =>
      val excl = run; run += n; (id, n, run, excl / budget)
    }.toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = Corpus.packShards(docs, col("doc_id"), col("text"), budget, parts)
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expect, s"parts=$parts")
    }
    // shard invariant: contiguous, non-decreasing, each shard's span covers
    // at most budget tokens of exclusive prefix
    val shards = expect.map(_._4)
    assert(shards == shards.sorted && shards.distinct == (0L to shards.max).toSeq)
  }

  test("repetitionStats: planted repetition and diversity score exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam"),       // 5 tokens, 1 distinct, bigram "spam spam" x4
      (2L, "all words here are unique five"), // 6 tokens all distinct, every bigram unique
      (3L, "one"),                            // single token: no bigrams
      (4L, "")                                // empty: all zeros
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") == 5 && out(1L).getAs[Long]("n_distinct") == 1)
    assert(out(1L).getAs[Double]("ttr") == 0.2)
    assert(out(1L).getAs[Long]("top_bigram_n") == 4 && out(1L).getAs[Double]("bigram_frac") == 1.0)
    assert(out(2L).getAs[Double]("ttr") == 1.0 && out(2L).getAs[Long]("top_bigram_n") == 1)
    assert(out(3L).getAs[Long]("top_bigram_n") == 0 && out(3L).getAs[Double]("bigram_frac") == 0.0)
    assert(out(4L).getAs[Long]("n_tokens") == 0 && out(4L).getAs[Double]("ttr") == 0.0)
  }

  test("fairInterleave: every source appears once per round, deterministic") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val out = Corpus.fairInterleave(docs, col("doc_id"), col("source"), budget = 18L)
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    assert(out.length == 18 && out.map(_._1).toSeq == (0L until 18L))
    // strict round-robin: every consecutive block of k=3 holds all 3 sources
    out.grouped(3).foreach { round =>
      assert(round.map(_._2).toSet == Set("s0", "s1", "s2"), round.toSeq)
    }
    // deterministic: a second run emits the identical order
    val again = Corpus.fairInterleave(docs, col("doc_id"), col("source"), budget = 18L)
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    assert(out.toSeq == again.toSeq)
  }

  test("curriculum bins split the fixture corpus into near-quarters") {
    val out = graft.SparkEntry.queries("q113_curriculum_bins")(
      spark, "/root/testdata/sf0.001")
    val byBin = out.collect().groupBy(_.getAs[Long]("bin")).view.mapValues(_.length)
    assert(byBin.keySet == Set(0L, 1L, 2L, 3L))
    // exact quartile brackets on 500 distinct-ish scores: every bin 25%±2%
    byBin.values.foreach(n => assert(math.abs(n - 125) <= 10, byBin.toMap))
  }

  test("dedupPassages: first occurrence wins across and within docs") {
    import spark.implicits._
    // k=2 passages: doc 1 owns [a b][c d]; doc 2 repeats [a b] then its own
    // [x y]; doc 3 is a verbatim copy of doc 1 (all passages dup -> empty);
    // doc 4 repeats ITS OWN first passage ([p q][p q] -> second removed);
    // doc 5 has a short tail passage [z]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b c d"),
      (4L, "p q p q"),
      (5L, "m n z")
    ).toDF("doc_id", "text")
    val out = Corpus.dedupPassages(docs, col("doc_id"), col("text"), k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_passages"), r.getAs[Long]("n_dup_passages"),
          r.getAs[String]("text_dedup")))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d")), "owner keeps everything")
    assert(out(2L) == ((2L, 1L, "x y")), "cross-doc repeated passage removed")
    assert(out(3L) == ((2L, 2L, "")), "full copy reassembles to empty")
    assert(out(4L) == ((2L, 1L, "p q")), "within-doc repeat: first pos wins")
    assert(out(5L) == ((2L, 0L, "m n z")), "short tail passage survives")
  }

  test("pmiCollocations: hand-computed lifts, tie order, min-count prune") {
    import spark.implicits._
    // N=7 tokens, M=5 bigrams; uni a=3 b=3 c=1
    // (a,b)x3: 3*49/(5*9)=3.266667 ; (b,c)x1: 49/15=3.266667 (TIE, a<b)
    // (b,a)x1: 49/45=1.088889
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Corpus.pmiCollocations(docs, col("text"), minCount = 1L, k = 10)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_pair"), r.getAs[Double]("lift")))
    assert(got.toSeq == Seq(
      ("a", "b", 3L, 3.266667), ("b", "c", 1L, 3.266667),
      ("b", "a", 1L, 1.088889)))
    // min-count prunes BEFORE the joins: the singletons vanish
    val pruned = Corpus.pmiCollocations(docs, col("text"), minCount = 2L, k = 10)
      .collect()
    assert(pruned.length == 1 && pruned.head.getAs[String]("w1") == "a")
  }

  test("bpeTrain: hand-computed merges, early stop when pairs run dry") {
    import spark.implicits._
    // words: ab x2, ac x1 -> round 1 merges (a,b) cnt 2; round 2 (a,c) 1;
    // round 3 has no pairs left -> stops at 2 merges despite nMerges=10
    val docs = Seq("ab ab ac").toDF("text")
    val m = Corpus.bpeTrain(docs, col("text"), nMerges = 10)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "b", 2L), (2, "a", "c", 1L)))
  }

  test("bpeTrain: count ties break lexicographically on (left, right)") {
    import spark.implicits._
    // (b,a) and (a,b) both count 2 -> (a,b) wins the tie
    val docs = Seq("ba ba ab ab").toDF("text")
    val m = Corpus.bpeTrain(docs, col("text"), nMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(("a", "b", 2L)))
  }

  test("bpeTrain: greedy left-to-right application on overlapping pairs") {
    import spark.implicits._
    // 'aaa': (a,a) counts 2; after merging greedily the word is [aa, a],
    // so round 2's top pair is (aa, a) with count 1
    val docs = Seq("aaa").toDF("text")
    val m = Corpus.bpeTrain(docs, col("text"), nMerges = 2)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpeEncode: hand-computed symbol counts from trained merges") {
    import spark.implicits._
    // corpus: "abab ac", "abab abab". Chars: abab=[a,b,a,b] ac=[a,c].
    // round 1: (a,b) cnt 2+1+2·2=... per distinct-WORD counts: abab appears
    // 3 times (c=3), ac once. pairs: (a,b) 2 per abab ·3 = 6, (b,a) 3,
    // (a,c) 1 -> merge1 = (a,b). abab -> [ab, ab], ac -> [a, c].
    // round 2: (ab,ab) 3, (a,c) 1 -> merge2 = (ab,ab). abab -> [abab].
    val docs = Seq((1L, "abab ac"), (2L, "abab abab")).toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(docs, col("text"), nMerges = 2)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    val enc = Corpus.bpeEncode(docs, col("doc_id"), col("text"), merges)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: tokens [abab, ac] -> syms 1 + 2 = 3; doc 2: [abab, abab] -> 2
    assert(enc.toSeq == Seq((1L, 2L, 3L), (2L, 2L, 2L)))
  }

  test("bpeEncode: empty-token docs yield no row; empty merge table = char counts") {
    import spark.implicits._
    val docs = Seq((1L, "ab c"), (2L, "")).toDF("doc_id", "text")
    val enc = Corpus.bpeEncode(docs, col("doc_id"), col("text"), Seq.empty)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq((1L, 2L, 3L))) // [a,b] + [c]; doc 2 dropped
  }

  test("hashedEmbedding + hashedKnn: window-ranked re-derivation matches the bounded top-k") {
    import spark.implicits._
    import graft.operators.{Corpus, Similarity}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Corpus.hashedKnn(docs, col("doc_id"), col("text"),
        queryPred = col("doc_id") < 3, k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rn"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).sorted.toSeq
    // reference: same scored frame ranked by a plain window row_number —
    // the one-task plan hashedKnn's graft_topk partial exists to avoid
    val e = Corpus.hashedEmbedding(docs, col("doc_id"), col("text"))
      .filter(col("n2") > 0)
    val q = e.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("vec").as("qv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    val ref = q.join(e, col("doc_id") =!= col("qid"))
      .withColumn("num", call_function("graft_doti", col("qv"), col("vec")))
      .filter(col("num") > 0)
      .select(col("qid"), col("doc_id"),
        ((col("num") * col("num")).cast("double") / col("n2")).as("score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rn"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).sorted.toSeq
    assert(got == ref)
    assert(got.nonEmpty && got.forall { case (q0, rn, d, _) => rn >= 1 && rn <= 5 && d != q0 })
  }

  test("langIdTrained: planted markers separate languages; argmax tie-break is the min lang") {
    import spark.implicits._
    // two languages with disjoint marker vocab over a shared base: the
    // centroid of each lang is dominated by its own markers, so every doc
    // lands on its declared lang
    val docs = (0L until 20L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val marker = if (lang == "aa") "zzqa zzqb zzqc" else "yyra yyrb yyrc"
      (i, s"the common base words here $marker $marker", lang)
    }.toDF("doc_id", "text", "lang")
    val got = Corpus.langIdTrained(docs, col("doc_id"), col("text"),
      col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length == 20)
    assert(got.forall { case (_, lang, pred) => lang == pred },
      s"disjoint markers must classify perfectly: ${got.filter(g => g._2 != g._3).toSeq}")
    // identical docs across langs -> identical scores -> min-lang tie-break
    val tied = Seq((1L, "same words", "bb"), (2L, "same words", "aa"))
      .toDF("doc_id", "text", "lang")
    val t = Corpus.langIdTrained(tied, col("doc_id"), col("text"), col("lang"))
      .collect().map(r => r.getString(2)).distinct
    assert(t.toSeq == Seq("aa"), s"equal scores must break to the min lang: ${t.toSeq}")
  }

  test("extractMainText: tags, entities, boilerplate density, block counts") {
    import spark.implicits._
    val html =
      """<html><head><title>t</title><script>if(a<b){x=1;}</script>
        |<style>p{color:red}</style></head><body>
        |<div><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Blog</a></div>
        |<p>hello &amp; world &lt;tag&gt; it&#39;s   "fine"</p>
        |<p>see <a href="/r">the ref</a> for details and more words</p>
        |<div>(c) 2026 <a href="/t">Terms</a> <a href="/p">Privacy</a></div>
        |</body></html>""".stripMargin.replace("\n", "")
    val got = Corpus.extractMainText(Seq((1L, html)).toDF("id", "h"),
      col("id"), col("h")).collect().head
    // main p: entities decoded (& < > ' "), whitespace normalized; ref p:
    // 1 anchor / 8 tokens kept; nav (3/3) and footer (2/4) dropped
    assert(got.getString(1) ==
      "hello & world <tag> it's \"fine\" see the ref for details and more words")
    assert(got.getLong(2) == 2L, s"n_kept: $got")
    assert(got.getLong(3) == 2L, s"n_dropped: $got")
  }

  test("extractMainText plan: one scan, zero exchanges before the output sort") {
    // stage 0's claim is "scan-side, zero shuffle": q206's only Exchange
    // must be the final ORDER BY's range partitioning, single corpus scan
    val df = graft.SparkEntry.queries("q206_html_extract")(
      spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 corpus scan, got ${scans.size}")
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).toList
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"expected only the output-sort range exchange, got: $exchanges")
  }

  test("extractMainText: malformed markup is total — no hang, no throw, no script leak") {
    import spark.implicits._
    val cases = Seq(
      // unclosed script: content runs to EOF and is dropped entirely
      (1L, "<p>keep me</p><script>var leak = 'SECRET1';"),
      // nested script: browser rule — first close ends it; 'c' is text
      (2L, "<p>a</p><script>x<script>y</script>c</script><p>b</p>"),
      // unclosed inline tag (greedy to next '>') + unterminated trailing
      // '<a …' — the latter counts as an anchor, so the 1-token 'tail'
      // block is density-dropped
      (3L, "<p>text <b unclosed and <i>more</p><p>tail<a href='x"),
      // stray close tags and a bare ampersand
      (4L, "</div></p>one &amp; two</span>"),
      // adversarial repetition: many opens, never a '>' (backtracking
      // bait) — the unterminated-tag cleanup empties the block
      (5L, "<p>" + ("<a " * 2000) + "ok</p>"),
      // empty and tag-only inputs
      (6L, ""), (7L, "<div></div><p></p>"))
    val t0 = System.nanoTime()
    val got = Corpus.extractMainText(cases.toDF("id", "h"), col("id"), col("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "extraction must not crawl")
    assert(got(1L) == "keep me", s"unclosed script must drop to EOF: ${got(1L)}")
    assert(!got(1L).contains("SECRET1"))
    assert(got(2L) == "a c b", s"nested script: first close wins: ${got(2L)}")
    assert(got(3L) == "text more", s"unclosed tags stripped: ${got(3L)}")
    assert(got(4L) == "one & two", s"stray closes stripped: ${got(4L)}")
    assert(got(5L) == "", s"unterminated-anchor farm must vanish: ${got(5L)}")
    assert(got(6L) == "" && got(7L) == "")
  }
}
