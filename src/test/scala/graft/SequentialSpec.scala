package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sequential

/** Sequential (tick gaps, longest runs) + Eval.ksTest: hand cases, a
  * brute-force local oracle, and the partition-seam invariant — the result
  * must be IDENTICAL at numParts = 1 (no seams) and numParts = 7 (every
  * key's history fragmented), which is the whole correctness burden of the
  * segment-combine/stitch design.
  */
class SequentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(String, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "t", "q", "v")
  }

  /** Local oracle: per key, (n, span, maxGap orNull, nGt) under (t, q). */
  private def gapOracle(rows: Seq[(String, Long, Long, Double)], thr: Long) =
    rows.groupBy(_._1).map { case (k, rs) =>
      val ts = rs.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      (k, ts.size.toLong, ts.max - ts.min,
        if (gaps.isEmpty) None else Some(gaps.max),
        gaps.count(_ > thr).toLong)
    }.toSeq.sortBy(_._1)

  private def runsOracle(rows: Seq[(String, Long, Long, Double)]) =
    rows.groupBy(_._1).map { case (k, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      var best = 1L; var run = 1L
      vs.zip(vs.tail).foreach { case (a, b) =>
        run = if (b > a) run + 1 else 1L
        best = math.max(best, run)
      }
      (k, vs.size.toLong, best)
    }.toSeq.sortBy(_._1)

  test("tickGapAudit matches a hand case incl. single-tick key") {
    val rows = Seq(
      ("a", 0L, 1L, 0.0), ("a", 10L, 2L, 0.0), ("a", 40L, 3L, 0.0),
      ("a", 45L, 4L, 0.0),
      ("b", 100L, 5L, 0.0)) // single tick: no gaps, NULL max_gap
    val got = Sequential
      .tickGapAudit(df(rows), col("k"), col("t"), col("q"), thresholdUs = 10L)
      .orderBy("k").collect()
    assert(got.length == 2)
    val a = got(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 4 && a.getLong(2) == 45)
    assert(a.getLong(3) == 30 && a.getLong(4) == 1) // only the 30-gap > 10
    val b = got(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1 && b.getLong(2) == 0)
    assert(b.isNullAt(3) && b.getLong(4) == 0)
  }

  test("tickGapAudit: random tape equals local oracle at 1 and 7 partitions") {
    val rnd = new Random(42)
    val rows = (1 to 500).map { i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(10000).toLong, i.toLong, 0.0)
    }
    val want = gapOracle(rows, thr = 50L)
    Seq(1, 7).foreach { np =>
      val got = Sequential
        .tickGapAudit(df(rows), col("k"), col("t"), col("q"), 50L, numParts = np)
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
        .toSeq
      assert(got == want, s"numParts=$np")
    }
  }

  test("longestRuns matches a hand case with a cross-boundary run") {
    // k=a values 1,2,3,5,4,6,7,8,9 → longest strictly-increasing run = 5
    val rows = Seq(1.0, 2.0, 3.0, 5.0, 4.0, 6.0, 7.0, 8.0, 9.0).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, i.toLong, v) }
    Seq(1, 7).foreach { np =>
      val got = Sequential
        .longestRuns(df(rows), col("k"), col("t"), col("q"), col("v"), np)
        .collect()
      assert(got.length == 1)
      assert(got(0).getLong(1) == 9 && got(0).getLong(2) == 5, s"numParts=$np")
    }
  }

  test("longestRuns: random tape equals local oracle at 1 and 7 partitions") {
    val rnd = new Random(7)
    val rows = (1 to 400).map { i =>
      (s"k${rnd.nextInt(3)}", (i / 2).toLong, i.toLong, rnd.nextInt(6).toDouble)
    }
    val want = runsOracle(rows)
    Seq(1, 7).foreach { np =>
      val got = Sequential
        .longestRuns(df(rows), col("k"), col("t"), col("q"), col("v"), np)
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"numParts=$np")
    }
  }

  test("segment combine algebra: fold equals whole-sequence scan") {
    val rnd = new Random(11)
    (1 to 50).foreach { _ =>
      val vs = Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(5).toDouble)
      def seg(xs: Seq[Double]): Sequential.RunSeg = {
        var s = Sequential.RunSeg(1, 1, 1, 1, xs.head, xs.head); var run = 1L
        xs.tail.foreach { v =>
          run = if (v > s.lastV) run + 1 else 1L
          s = Sequential.RunSeg(s.n + 1, math.max(s.best, run),
            if (s.pre == s.n && v > s.lastV) s.pre + 1 else s.pre, run,
            s.firstV, v)
        }
        s
      }
      val cut = 1 + rnd.nextInt(vs.size)
      val (l, r) = vs.splitAt(cut)
      val folded =
        if (r.isEmpty) seg(l) else Sequential.combine(seg(l), seg(r))
      assert(folded == seg(vs), s"vs=$vs cut=$cut")
    }
  }

  test("maxDrawdown matches a hand case with a cross-boundary drop") {
    // 10, 50, 40, 45, 20, 30: peak 50 → trough 20 ⇒ drawdown 30
    val vs = Seq(10L, 50L, 40L, 45L, 20L, 30L)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, i.toLong, v.toDouble)
    }
    Seq(1, 7).foreach { np =>
      val got = Sequential.maxDrawdown(df(rows), col("k"), col("t"), col("q"),
        col("v").cast("long"), numParts = np).collect()
      assert(got.length == 1)
      assert(got(0).getLong(1) == 6 && got(0).getLong(2) == 50 &&
        got(0).getLong(3) == 10 && got(0).getLong(4) == 30, s"numParts=$np")
    }
  }

  test("maxDrawdown: random tape equals local oracle at 1 and 7 partitions") {
    val rnd = new Random(19)
    val rows = (1 to 400).map { i =>
      (s"k${rnd.nextInt(3)}", (i / 3).toLong, i.toLong,
        rnd.nextInt(1000).toDouble)
    }
    val want = rows.groupBy(_._1).map { case (k, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3)).map(_._4.toLong)
      var peak = Long.MinValue; var best = 0L
      vs.foreach { v => peak = math.max(peak, v); best = math.max(best, peak - v) }
      (k, vs.size.toLong, vs.max, vs.min, best)
    }.toSeq.sortBy(_._1)
    Seq(1, 7).foreach { np =>
      val got = Sequential.maxDrawdown(df(rows), col("k"), col("t"), col("q"),
          col("v").cast("long"), numParts = np)
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == want, s"numParts=$np")
    }
  }

  test("drawdown combine algebra: fold equals whole-sequence scan") {
    val rnd = new Random(23)
    (1 to 50).foreach { _ =>
      val vs = Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(100).toLong)
      def seg(xs: Seq[Long]): Sequential.DdSeg = {
        var s = Sequential.DdSeg(1, xs.head, xs.head, 0L)
        xs.tail.foreach { v =>
          s = Sequential.DdSeg(s.n + 1, math.max(s.maxV, v),
            math.min(s.minV, v), math.max(s.best, s.maxV - v))
        }
        s
      }
      val cut = 1 + rnd.nextInt(vs.size)
      val (l, r) = vs.splitAt(cut)
      val folded =
        if (r.isEmpty) seg(l) else Sequential.combineDd(seg(l), seg(r))
      assert(folded == seg(vs), s"vs=$vs cut=$cut")
    }
  }

  test("combine algebras are associative on random triples") {
    val rnd = new Random(31)
    (1 to 100).foreach { _ =>
      def runSeg(): Sequential.RunSeg = {
        val n = 1 + rnd.nextInt(20)
        val pre = 1 + rnd.nextInt(n)
        val suf = 1 + rnd.nextInt(n)
        // pre == n ⇔ suf == n ⇔ whole segment is one run: keep consistent
        val (p, s2) = if (pre == n || suf == n) (n, n) else (pre, suf)
        val best = math.max(math.max(p, s2), 1 + rnd.nextInt(n))
        Sequential.RunSeg(n, math.min(best, n), p, s2,
          rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble)
      }
      def ddSeg(): Sequential.DdSeg = {
        val a = rnd.nextInt(100).toLong; val b = rnd.nextInt(100).toLong
        val (mx, mn) = (math.max(a, b), math.min(a, b))
        Sequential.DdSeg(1 + rnd.nextInt(20), mx, mn,
          rnd.nextInt((mx - mn + 1).toInt).toLong)
      }
      val (x, y, z) = (runSeg(), runSeg(), runSeg())
      assert(Sequential.combine(Sequential.combine(x, y), z) ==
        Sequential.combine(x, Sequential.combine(y, z)),
        s"runs combine not associative: $x $y $z")
      val (a, b, c) = (ddSeg(), ddSeg(), ddSeg())
      assert(Sequential.combineDd(Sequential.combineDd(a, b), c) ==
        Sequential.combineDd(a, Sequential.combineDd(b, c)),
        s"drawdown combine not associative: $a $b $c")
    }
  }

  test("ksTest: identical cohorts give 0, disjoint cohorts give 10^6") {
    import spark.implicits._
    val same = (1 to 50).flatMap(i => Seq((1L, i.toDouble), (0L, i.toDouble)))
    val r0 = operators.Eval
      .ksTest(same.toDF("g", "x"), col("g"), col("x")).collect().head
    assert(r0.getLong(0) == 50 && r0.getLong(1) == 50 && r0.getLong(2) == 0L)
    val disj = (1 to 40).map(i => (1L, i.toDouble)) ++
      (1 to 60).map(i => (0L, 1000.0 + i))
    val r1 = operators.Eval
      .ksTest(disj.toDF("g", "x"), col("g"), col("x")).collect().head
    assert(r1.getLong(0) == 40 && r1.getLong(1) == 60 &&
      r1.getLong(2) == 1000000L)
  }

  test("ksTestByGroup equals per-group ksTest at 1 and 7 partitions") {
    import spark.implicits._
    val rnd = new Random(29)
    val rows = (1 to 600).map { _ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(2).toLong, rnd.nextInt(30).toDouble)
    }
    // per-group reference: the single-group operator run per group
    val want = rows.map(_._1).distinct.sorted.map { g =>
      val sub = rows.filter(_._1 == g).map(t => (t._2, t._3))
      val r = operators.Eval
        .ksTest(sub.toDF("g1", "x"), col("g1"), col("x")).collect().head
      (g, r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    }
    Seq(1, 7).foreach { np =>
      val got = operators.Eval
        .ksTestByGroup(rows.toDF("g", "g1", "x"), col("g"), col("g1"),
          col("x"), numParts = np)
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
      assert(got == want, s"numParts=$np")
    }
    // a group with an empty cohort yields NULL, not a crash or a zero
    val oneSided = Seq(("h", 1L, 3.0), ("h", 1L, 4.0))
    val r = operators.Eval
      .ksTestByGroup(oneSided.toDF("g", "g1", "x"), col("g"), col("g1"),
        col("x")).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 0 && r.isNullAt(3))
  }

  test("KS segment combine: fold equals whole-sequence scan and is associative") {
    import java.math.BigInteger
    val rnd = new Random(37)
    def seg(ds: Seq[Long]): operators.Eval.KsSeg =
      ds.map(d => operators.Eval.KsSeg(BigInteger.valueOf(d),
          BigInteger.valueOf(d), BigInteger.valueOf(d)))
        .reduceLeft(operators.Eval.combineKs)
    (1 to 100).foreach { _ =>
      val ds = Seq.fill(2 + rnd.nextInt(30))((rnd.nextInt(41) - 20).toLong)
      val whole = seg(ds)
      // whole-scan reference: prefix extremes of the running sum
      val prefixes = ds.scanLeft(0L)(_ + _).tail
      assert(whole.t.longValueExact == ds.sum)
      assert(whole.mmax.longValueExact == prefixes.max)
      assert(whole.mmin.longValueExact == prefixes.min)
      val cut1 = 1 + rnd.nextInt(ds.size - 1)
      val folded = operators.Eval.combineKs(seg(ds.take(cut1)), seg(ds.drop(cut1)))
      assert(folded == whole, s"ds=$ds cut=$cut1")
    }
  }

  test("high-cardinality keys run distributed: no driver-side stitch bound") {
    // 20 000 distinct keys (the shape the old driver-side fold could not
    // carry): the stitches must run as executor-side folds and return the
    // full key set; spot-check a handful of keys against the local oracle.
    import spark.implicits._
    val rnd = new Random(41)
    val n = 60000
    val rows = (1 to n).map { i =>
      (s"k${rnd.nextInt(20000)}", (i / 2).toLong, i.toLong,
        rnd.nextInt(1000).toDouble)
    }
    val runs = Sequential.longestRuns(df(rows), col("k"), col("t"), col("q"),
      col("v")).cache()
    val dd = Sequential.maxDrawdown(df(rows), col("k"), col("t"), col("q"),
      col("v").cast("long")).cache()
    val nKeys = rows.map(_._1).distinct.size.toLong
    assert(runs.count() == nKeys && dd.count() == nKeys)
    val want = runsOracle(rows.filter(r => Set("k0", "k7", "k42")(r._1)))
    val got = runs.filter(col("k").isin("k0", "k7", "k42"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    runs.unpersist(); dd.unpersist()
    // ksTestByGroup at 5 000 groups: full group set back, no collect blow-up
    val ksRows = (1 to n).map { _ =>
      (s"g${rnd.nextInt(5000)}", rnd.nextInt(2).toLong,
        rnd.nextInt(50).toDouble)
    }
    val ks = operators.Eval.ksTestByGroup(ksRows.toDF("g", "g1", "x"),
      col("g"), col("g1"), col("x"))
    assert(ks.count() == ksRows.map(_._1).distinct.size.toLong)
  }

  test("ksTest matches a local ECDF oracle on random data") {
    val rnd = new Random(3)
    val rows = (1 to 300).map { _ =>
      (rnd.nextInt(2).toLong, rnd.nextInt(40).toDouble)
    }
    val n1 = rows.count(_._1 == 1L).toLong
    val n2 = rows.size - n1
    val ksNum = rows.map(_._2).distinct.sorted.map { x =>
      val c1 = rows.count(r => r._1 == 1L && r._2 <= x).toLong
      val c2 = rows.count(r => r._1 == 0L && r._2 <= x).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    val den = n1 * n2
    val wantMicro = (2000000L * ksNum + den) / (2 * den) // round-half-away, pos
    import spark.implicits._
    val got = operators.Eval
      .ksTest(rows.toDF("g", "x"), col("g"), col("x")).collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2 &&
      got.getLong(2) == wantMicro)
  }
}
