package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.RangePartitioner
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-dependent sequence audits over keyed event streams — the
  * data-quality checks a feed operator runs before trusting a tape:
  * missing-interval (tick-gap) detection and monotone-run profiling.
  * Reference behavior: the feed-health checks around the reference's price
  * tape consumers (kafka-flink-processing's ingest jobs assume an
  * uninterrupted per-topic tick cadence; these operators are the audit that
  * VERIFIES that assumption on 100 TB of landed history).
  *
  * Scale shape — the naive spelling of both ops is `lag() OVER (PARTITION
  * BY key ORDER BY ts)`: with few keys (feeds have 4-10) that is one
  * reducer task PER KEY sorting that key's entire history — the
  * single-task window the q116 AUC redesign eliminated. Instead both ops
  * use the established two-pass sorted-partition idiom
  * ([[Eval.aucROC]], [[Corpus.packShardsByCount]]):
  *   1. range-partition by (key, ts, seq) and sort within partitions —
  *      Spark's own ORDER BY machinery, so one key's history spans MANY
  *      partitions, each partition-fragment internally ordered;
  *   2. one sequential scan per partition folds each fragment to O(1)
  *      summary state (first/last ts, internal max gap, run lengths at the
  *      fragment edges);
  *   3. fragments stitch on a TINY frame (≤ numPartitions·keys rows, KBs)
  *      — a window/fold over summaries, never over rows.
  * Wall-clock is governed by the one sort-shuffle; per-key skew cannot
  * serialize the scan because fragments of one key land on many tasks.
  */
object Sequential {

  /** Tick-gap audit: per key, the inter-arrival profile of an event stream
    * ordered by (ts, seq) — (n_ticks, span_us, max_gap_us, n_gaps_gt).
    * `n_gaps_gt` counts gaps strictly above `thresholdUs` (the
    * missing-interval alarm); `max_gap_us` is NULL for single-tick keys.
    * Gaps are ts-to-ts deltas, so equal-timestamp ties contribute gap 0
    * regardless of tie order — the audit is tie-order-invariant, and the
    * (ts, seq) sort pins determinism anyway.
    *
    * All outputs are BIGINT/STRING (hash-gate type discipline).
    */
  def tickGapAudit(df: DataFrame, keyCol: Column, tsUsCol: Column,
      seqCol: Column, thresholdUs: Long, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df
      .select(keyCol.cast("string").as("k"), tsUsCol.cast("long").as("t"),
        seqCol.cast("long").as("q"))
      .as[(String, Long, Long)].rdd
      .map { case (k, t, q) => ((k, t, q), ()) }
    val nPart = math.max(1, math.min(parts, 32))
    // one sorted RDD serves the whole job; fragments of a hot key spread
    // over many range partitions instead of one per-key reducer.
    val sorted = base.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, base))
    val frags = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        val out = ArrayBuffer.empty[(String, Int, Long, Long, Long, Option[Long], Long)]
        var curK: String = null
        var first = 0L; var last = 0L; var n = 0L
        var maxGap = -1L; var nGt = 0L
        def flush(): Unit = if (n > 0)
          out += ((curK, pid, first, last, n,
            if (maxGap >= 0) Some(maxGap) else None, nGt))
        it.foreach { case ((k, t, _), _) =>
          if (k != curK) {
            flush(); curK = k; first = t; last = t; n = 1; maxGap = -1L; nGt = 0L
          } else {
            val g = t - last
            if (g > maxGap) maxGap = g
            if (g > thresholdUs) nGt += 1
            last = t; n += 1
          }
        }
        flush(); out.iterator
      }
      .toDF("k", "pid", "first_t", "last_t", "n", "max_gap", "n_gt")
    // stitch: boundary gap between consecutive fragments of the same key.
    // The frame is ≤ nPart·K rows — the window here is over summaries, not
    // events, so the per-key partition is trivially small.
    val w = Window.partitionBy("k").orderBy("pid")
    frags
      .withColumn("bgap", col("first_t") - lag(col("last_t"), 1).over(w))
      .groupBy(col("k"))
      .agg(
        sum(col("n")).as("n_ticks"),
        (max(col("last_t")) - min(col("first_t"))).as("span_us"),
        greatest(max(col("max_gap")), max(col("bgap"))).as("max_gap_us"),
        (sum(col("n_gt")) +
          count(when(col("bgap") > thresholdUs, 1))).as("n_gaps_gt"))
  }

  /** Per-fragment summary for [[longestRuns]]: a strictly-increasing-run
    * segment in the classic segment-combine form (n, best, prefix run,
    * suffix run, first/last value). Associative combine of ADJACENT
    * fragments — the same algebra a segment tree uses, here folded left
    * over a key's pid-ordered fragments.
    */
  private[graft] final case class RunSeg(n: Long, best: Long, pre: Long,
      suf: Long, firstV: Double, lastV: Double)

  private[graft] def combine(a: RunSeg, b: RunSeg): RunSeg = {
    val join = b.firstV > a.lastV
    val cross = if (join) a.suf + b.pre else 0L
    RunSeg(
      n = a.n + b.n,
      best = math.max(math.max(a.best, b.best), cross),
      pre = if (join && a.pre == a.n) a.n + b.pre else a.pre,
      suf = if (join && b.suf == b.n) b.n + a.suf else b.suf,
      firstV = a.firstV, lastV = b.lastV)
  }

  /** Per-fragment summary for [[maxDrawdown]]: (n, max, min, best
    * peak-to-trough) — associative: a drawdown either lives inside one
    * fragment or crosses the seam as (a's running max) − (b's min).
    */
  private[graft] final case class DdSeg(n: Long, maxV: Long, minV: Long,
      best: Long)

  private[graft] def combineDd(a: DdSeg, b: DdSeg): DdSeg =
    DdSeg(a.n + b.n, math.max(a.maxV, b.maxV), math.min(a.minV, b.minV),
      math.max(math.max(a.best, b.best), a.maxV - b.minV))

  /** Maximum drawdown per key — the largest peak-to-trough drop of an
    * integer value series (cents) under the (ts, seq) order: the risk
    * audit a feed/strategy operator reads next to the [[longestRuns]]
    * streak profile. All arithmetic is integer (caller quantizes, e.g.
    * cents = floor(price·100) — one IEEE multiply then floor,
    * engine-deterministic), so the result is exact at any scale.
    * Output: (k STRING, n_ticks, max_cents, min_cents, max_drawdown_cents)
    * — all BIGINT; drawdown is 0 for monotone-rising or single-tick keys.
    *
    * Same two-pass shape as [[longestRuns]], stitched distributively (a
    * per-key executor-side fold over ≤ numPartitions summaries — no driver
    * collect, no key-cardinality bound); the seam algebra is the classic
    * max-subarray-style combine (best = max(inside a, inside b,
    * a.max − b.min)), folded over the summary-sized fragment frame.
    */
  def maxDrawdown(df: DataFrame, keyCol: Column, tsUsCol: Column,
      seqCol: Column, valueCentsCol: Column, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df
      .select(keyCol.cast("string").as("k"), tsUsCol.cast("long").as("t"),
        seqCol.cast("long").as("q"), valueCentsCol.cast("long").as("c"))
      .as[(String, Long, Long, Long)].rdd
      .map { case (k, t, q, c) => ((k, t, q), c) }
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = base.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, base))
    val frags = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        val out = ArrayBuffer.empty[(String, Int, DdSeg)]
        var curK: String = null
        var seg: DdSeg = null
        def flush(): Unit = if (seg != null) out += ((curK, pid, seg))
        it.foreach { case ((k, _, _), c) =>
          if (k != curK) { flush(); curK = k; seg = DdSeg(1L, c, c, 0L) }
          else seg = DdSeg(seg.n + 1, math.max(seg.maxV, c),
            math.min(seg.minV, c), math.max(seg.best, seg.maxV - c))
        }
        flush(); out.iterator
      }
    // stitch DISTRIBUTED: a key has at most one fragment per partition, so
    // groupByKey moves ≤ nPart tiny summaries per key and the pid-ordered
    // fold runs on executors — no driver collect, no bounded-key contract
    // (a 10⁷-cardinality key is just a bigger, still-summary-sized shuffle).
    val merged = frags
      .map { case (k, pid, seg) => (k, (pid, seg)) }
      .groupByKey()
      .map { case (k, fs) =>
        val tot = fs.toSeq.sortBy(_._1).map(_._2).reduceLeft(combineDd)
        (k, tot.n, tot.maxV, tot.minV, tot.best)
      }
    spark.createDataFrame(merged)
      .toDF("k", "n_ticks", "max_cents", "min_cents", "max_drawdown_cents")
  }

  /** Longest strictly-increasing run of `valueCol` per key under the
    * (ts, seq) order — the monotone-streak profile (how long does a feed
    * trend before reversing; how long does a quality score climb).
    * Output: (k STRING, n_ticks BIGINT, longest_run BIGINT). Doubles are
    * only COMPARED (never summed or divided), so the result is
    * engine-exact.
    *
    * The per-key fold over fragment summaries is DISTRIBUTED: a key has at
    * most one fragment per range partition, so a groupByKey over the
    * fragment frame moves ≤ numPartitions summaries per key and the
    * pid-ordered associative fold runs on executors. Key cardinality is
    * therefore unbounded — a 10⁷-key stream shuffles 10⁷ × nPart tiny
    * summary rows, never rows of events, and nothing touches the driver.
    */
  def longestRuns(df: DataFrame, keyCol: Column, tsUsCol: Column,
      seqCol: Column, valueCol: Column, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df
      .select(keyCol.cast("string").as("k"), tsUsCol.cast("long").as("t"),
        seqCol.cast("long").as("q"), valueCol.cast("double").as("v"))
      .as[(String, Long, Long, Double)].rdd
      .map { case (k, t, q, v) => ((k, t, q), v) }
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = base.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, base))
    val frags = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        val out = ArrayBuffer.empty[(String, Int, RunSeg)]
        var curK: String = null
        var seg: RunSeg = null
        var run = 0L // current strictly-increasing run length
        def flush(): Unit = if (seg != null) out += ((curK, pid, seg))
        it.foreach { case ((k, _, _), v) =>
          if (k != curK) {
            flush(); curK = k; seg = RunSeg(1L, 1L, 1L, 1L, v, v); run = 1L
          } else {
            run = if (v > seg.lastV) run + 1 else 1L
            seg = RunSeg(
              n = seg.n + 1,
              best = math.max(seg.best, run),
              pre = if (seg.pre == seg.n && v > seg.lastV) seg.pre + 1 else seg.pre,
              suf = run,
              firstV = seg.firstV, lastV = v)
          }
        }
        flush(); out.iterator
      }
    // same distributed stitch as [[maxDrawdown]]: ≤ nPart summaries per key
    // folded on executors in pid order with the associative [[combine]]
    val merged = frags
      .map { case (k, pid, seg) => (k, (pid, seg)) }
      .groupByKey()
      .map { case (k, fs) =>
        val total = fs.toSeq.sortBy(_._1).map(_._2).reduceLeft(combine)
        (k, total.n, total.best)
      }
    spark.createDataFrame(merged).toDF("k", "n_ticks", "longest_run")
  }
}
