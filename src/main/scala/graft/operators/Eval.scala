package graft.operators

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.RangePartitioner
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-evaluation metrics over scored datasets — the audit step after a
  * quality / relevance scorer runs and before its threshold is trusted to
  * curate 100 TB. The flagship is exact ROC AUC via the tie-aware
  * Mann-Whitney rank statistic:
  *
  *   AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)
  *
  * where R⁺ is the sum of AVERAGE ranks of the positive examples under an
  * ascending score order (average ranks make ties exact, not approximated).
  *
  * Scale shape — the naive spelling is `rank() OVER (ORDER BY score)`, a
  * single-task window over the whole corpus. Instead:
  *   1. group by score → (score, n_pos, n_total) — partial-aggregated, so
  *      the exchange carries one row per DISTINCT score per partition;
  *   2. range-partition the group frame by score and sort within
  *      partitions — Spark's sampling RangePartitioner, the same engine
  *      `ORDER BY` uses, so partitions are score-ordered end to end;
  *   3. one tiny pass collects per-partition row counts (one row per
  *      partition), the driver prefix-sums them into rank offsets;
  *   4. a per-partition running count turns each tied group into its exact
  *      doubled average rank `2·cumBefore + c + 1` and its contribution
  *      `p · (2·cumBefore + c + 1)` to 2·R⁺ — pure sequential arithmetic,
  *      no further exchange (the [[Corpus.packShards]] two-pass prefix-sum
  *      idiom, keyed by score instead of id).
  *
  * Contributions accumulate in BigInteger: at 10¹¹ rows the doubled rank
  * sum reaches ~10²², past Long but far inside DECIMAL(38,0) — the result
  * is EXACT at any scale, and the integer numerator/denominator hash-gate
  * against the oracle engine-for-engine.
  */
object Eval {

  private val outSchema = StructType(Seq(
    StructField("part_pos", LongType, nullable = false),
    StructField("part_tot", LongType, nullable = false),
    StructField("part_contrib", DecimalType(38, 0), nullable = false)))

  /** Exact ROC AUC of `scoreCol` predicting `posCol` (1 = positive, 0 =
    * negative). One output row:
    * (n_pos, n_neg, auc_num DECIMAL(38,0), auc_den DECIMAL(38,0), auc) with
    * auc_num = 2·R⁺ − n⁺(n⁺+1), auc_den = 2·n⁺·n⁻ and
    * auc = the 6-dp ratio DECIMAL(18,6) derived ENTIRELY in integer space
    * ([[graft.functions.IntRatio.ratio6]]) — `round(num/den AS DOUBLE, 6)`
    * was the r6/r7 q116 hash-fail: a halfway-boundary double rounds
    * engine-version-dependently, so no double may appear anywhere in the
    * derivation chain. NULL auc when a class is empty.
    */
  def aucROC(scored: DataFrame, posCol: org.apache.spark.sql.Column,
      scoreCol: org.apache.spark.sql.Column, numParts: Int = 0): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val grouped = scored
      .select(posCol.cast("long").as("pos"), scoreCol.cast("double").as("score"))
      .groupBy(col("score"))
      .agg(sum(col("pos")).as("p"), count(lit(1)).as("c"))
      .as[(Double, Long, Long)].rdd
      .map { case (score, p, c) => (score, (p, c)) }
    // one RangePartitioner instance serves both passes: the sorted RDD is
    // shuffled once and its shuffle files are reused by pass 2.
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = grouped.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, grouped))
    // pass 1: per-partition total counts (one Long per partition — KBs)
    val subtotals = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(s += _._2._2); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    // pass 2: running rank + BigInteger contribution, one output row per
    // partition (sum of p, sum of c, sum of p·(2·cumBefore + c + 1))
    val partRows = sorted.mapPartitionsWithIndex { case (pid, it) =>
      var cum = offsets(pid)
      var sumP = 0L; var sumC = 0L; var contrib = BigInteger.ZERO
      it.foreach { case (_, (p, c)) =>
        val rank2 = BigInteger.valueOf(2L * cum + c + 1)
        contrib = contrib.add(BigInteger.valueOf(p).multiply(rank2))
        sumP += p; sumC += c; cum += c
      }
      Iterator(Row(sumP, sumC, new JBigDecimal(contrib)))
    }
    val perPart = spark.createDataFrame(partRows, outSchema)
    val d38 = DecimalType(38, 0)
    perPart.agg(
        sum(col("part_pos")).as("n_pos"),
        (sum(col("part_tot")) - sum(col("part_pos"))).as("n_neg"),
        sum(col("part_contrib")).as("contrib"))
      .select(col("n_pos"), col("n_neg"),
        (col("contrib") - col("n_pos").cast(d38) * (col("n_pos") + 1).cast(d38))
          .cast(d38).as("auc_num"),
        (lit(2).cast(d38) * col("n_pos").cast(d38) * col("n_neg").cast(d38))
          .cast(d38).as("auc_den"))
      .select(col("n_pos"), col("n_neg"), col("auc_num"), col("auc_den"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          graft.functions.IntRatio.ratio6("auc_num", "auc_den"))
          .as("auc"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (label columns): the audit between a model labeler and a
    * reference labeler (or two annotation runs) before either is trusted.
    *
    *   κ = (p_o − p_e) / (1 − p_e)
    *     = (n·Σ_k c_kk − Σ_k a_k·b_k) / (n² − Σ_k a_k·b_k)
    *
    * over the k×k contingency cells c (a_k/b_k the rater margins) — the
    * all-integer closed form, so the statistic is exact at any scale.
    * Products run in DECIMAL(38,0): at 10¹¹ rows n² reaches 10²², past
    * Long but far inside 38 digits. Output is hash-gate-disciplined
    * all-BIGINT: (n, n_agree, kappa_micro = round-half-away(κ·10⁶) via
    * [[graft.functions.IntRatio.micro]]); NULL kappa_micro when p_e = 1
    * (both raters constant — κ undefined). The num/den exactness is the
    * EvalSpec contract, mirroring [[aucROC]].
    *
    * Scale shape: one groupBy(a, b) partial-agg scan → k² cells; margins
    * re-aggregate the CELL frame (never the data); the closed form is
    * arithmetic over three 1-row frames joined by broadcast.
    */
  def cohensKappa(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    val cells = df
      .groupBy(aCol.cast("long").as("a"), bCol.cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
    val am = cells.groupBy(col("a")).agg(sum(col("c")).as("ca"))
    val bm = cells.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val tot = cells.agg(sum(col("c")).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("n_agree"))
    val marg = am.join(bm, col("a") === col("b"))
      .agg(coalesce(sum(col("ca").cast(d38) * col("cb").cast(d38)),
        lit(0).cast(d38)).as("s_marg"))
    tot.crossJoin(broadcast(marg))
      .select(col("n"), col("n_agree"),
        (col("n").cast(d38) * col("n_agree").cast(d38) - col("s_marg"))
          .cast(d38).as("k_num"),
        (col("n").cast(d38) * col("n").cast(d38) - col("s_marg"))
          .cast(d38).as("k_den"))
      .select(col("n"), col("n_agree"),
        when(col("k_den") =!= 0,
          graft.functions.IntRatio.micro("k_num", "k_den"))
          .as("kappa_micro"))
  }

  private val ksSchema = StructType(Seq(
    StructField("part_max", DecimalType(38, 0), nullable = false)))

  /** Two-sample Kolmogorov-Smirnov statistic — the distribution-drift
    * test between two cohorts of one numeric column (did the quality-score
    * distribution shift between two sources / two snapshots?):
    *
    *   KS = max_x |F₁(x) − F₂(x)| = max_x |c₁(x)·n₂ − c₂(x)·n₁| / (n₁·n₂)
    *
    * where c_i(x) is the running ≤-x count of cohort i — the numerator is
    * ALL-INTEGER, so the statistic is exact at any scale (BigInteger
    * accumulation; at 10¹¹ rows c·n reaches ~10²², past Long, inside
    * DECIMAL(38,0)). Output is hash-gate-disciplined:
    * (n1, n2, ks_micro BIGINT) — num/den exactness is the EvalSpec
    * contract, mirroring [[aucROC]].
    *
    * Scale shape = [[aucROC]]'s two-pass rank machinery with two counters:
    * group by value → (x, c1, c2) partial-agg'd; range-partition the
    * DISTINCT-VALUE frame; per-partition offsets from one KB-sized
    * subtotal collect (which also yields the global n₁/n₂ BEFORE pass 2);
    * pass 2 scans each partition once emitting its local max |ECDF diff|.
    * No global window anywhere.
    */
  def ksTest(df: DataFrame, in1Col: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val grouped = df
      .select(in1Col.cast("long").as("g1"), valueCol.cast("double").as("x"))
      .groupBy(col("x"))
      .agg(sum(col("g1")).as("c1"), (count(lit(1)) - sum(col("g1"))).as("c2"))
      .as[(Double, Long, Long)].rdd
      .map { case (x, c1, c2) => (x, (c1, c2)) }
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = grouped.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, grouped))
    val subtotals = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        var s1 = 0L; var s2 = 0L
        it.foreach { case (_, (c1, c2)) => s1 += c1; s2 += c2 }
        Iterator((pid, s1, s2))
      }
      .collect().sortBy(_._1)
    val off1 = subtotals.map(_._2).scanLeft(0L)(_ + _)
    val off2 = subtotals.map(_._3).scanLeft(0L)(_ + _)
    val n1 = off1.last; val n2 = off2.last
    val bN1 = BigInteger.valueOf(n1); val bN2 = BigInteger.valueOf(n2)
    val partRows = sorted.mapPartitionsWithIndex { case (pid, it) =>
      var cc1 = off1(pid); var cc2 = off2(pid)
      var best = BigInteger.ZERO
      it.foreach { case (_, (c1, c2)) =>
        cc1 += c1; cc2 += c2
        val d = BigInteger.valueOf(cc1).multiply(bN2)
          .subtract(BigInteger.valueOf(cc2).multiply(bN1)).abs()
        if (d.compareTo(best) > 0) best = d
      }
      Iterator(Row(new JBigDecimal(best)))
    }
    val d38 = DecimalType(38, 0)
    spark.createDataFrame(partRows, ksSchema)
      .agg(coalesce(max(col("part_max")), lit(0).cast(d38)).as("ks_num"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"), col("ks_num"),
        (lit(n1).cast(d38) * lit(n2).cast(d38)).cast(d38).as("ks_den"))
      .select(col("n1"), col("n2"),
        when(col("ks_den") > 0,
          graft.functions.IntRatio.micro("ks_num", "ks_den"))
          .as("ks_micro"))
  }

  private val ksGroupSchema = StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("n1", LongType, nullable = false),
    StructField("n2", LongType, nullable = false),
    StructField("ks_num", DecimalType(38, 0), nullable = false)))

  /** Per-fragment KS segment: the running signed diff D(i) = C1(i)·n2 −
    * C2(i)·n1 is a prefix sum of per-row deltas, so a fragment summarizes
    * to (total delta, prefix max, prefix min) — the same segment algebra
    * as a max-prefix segment tree. `max`/`min` are over the D values AFTER
    * each row of the fragment; the group's KS numerator is
    * max(|mmax|, |mmin|) of the folded chain (D starts at 0 and ends at 0,
    * so the global extremes ARE the max |D|). BigInteger throughout: |D| ≤
    * 2·n², past Long at ~3·10⁹ rows.
    */
  private[graft] final case class KsSeg(t: BigInteger, mmax: BigInteger,
      mmin: BigInteger)

  private[graft] def combineKs(a: KsSeg, b: KsSeg): KsSeg =
    KsSeg(a.t.add(b.t), a.mmax.max(a.t.add(b.mmax)),
      a.mmin.min(a.t.add(b.mmin)))

  /** Per-group two-sample KS — [[ksTest]] run for EVERY group in one
    * pass: the segment-level drift report (per source / per shard / per
    * day: did cohort 1's value distribution diverge from cohort 2's?).
    * One query, never a per-group job loop.
    *
    * Scale shape: group BY (g, value) partial-agg → the per-group
    * distinct-value frames; per-group totals (n1, n2) join back in (a
    * distributed shuffle join — the totals frame is one row per group);
    * the joined frame range-partitions and sorts on (g, value) so each
    * group's frame is contiguous-ordered ACROSS partitions; one scan folds
    * each (partition, group) fragment to an O(1) [[KsSeg]] (total signed
    * diff, prefix max, prefix min); the fragments stitch DISTRIBUTED — a
    * group has at most one fragment per partition, so a groupByKey moves
    * ≤ partitions summaries per group and the pid-ordered associative
    * [[combineKs]] fold runs on executors. Nothing touches the driver, so
    * group cardinality is unbounded (per-source and per-day both fine).
    * Output per group: (g, n1, n2, ks_micro) — NULL when a cohort is
    * empty in that group. Numerators in BigInteger (exact past Long).
    */
  def ksTestByGroup(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      in1Col: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val grouped = df
      .select(groupCol.cast("string").as("g"), in1Col.cast("long").as("g1"),
        valueCol.cast("double").as("x"))
      .groupBy(col("g"), col("x"))
      .agg(sum(col("g1")).as("c1"), (count(lit(1)) - sum(col("g1"))).as("c2"))
    val totals = grouped.groupBy(col("g"))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val joined = grouped.join(totals, Seq("g"))
      .select(col("g"), col("x"), col("c1"), col("c2"), col("n1"), col("n2"))
      .as[(String, Double, Long, Long, Long, Long)].rdd
      .map { case (g, x, c1, c2, n1, n2) => ((g, x), (c1, c2, n1, n2)) }
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = joined.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, joined))
    // one scan: fold each (partition, group) fragment to a KsSeg
    val frags = sorted.mapPartitionsWithIndex { case (pid, it) =>
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, (Int, KsSeg, Long, Long))]
      var curG: String = null
      var bN1 = BigInteger.ZERO; var bN2 = BigInteger.ZERO
      var n1 = 0L; var n2 = 0L
      var seg: KsSeg = null
      def flush(): Unit =
        if (seg != null) out += ((curG, (pid, seg, n1, n2)))
      it.foreach { case ((g, _), (c1, c2, t1, t2)) =>
        if (g != curG) {
          flush(); curG = g; n1 = t1; n2 = t2
          bN1 = BigInteger.valueOf(t1); bN2 = BigInteger.valueOf(t2)
          seg = null
        }
        val d = BigInteger.valueOf(c1).multiply(bN2)
          .subtract(BigInteger.valueOf(c2).multiply(bN1))
        seg =
          if (seg == null) KsSeg(d, d, d)
          else combineKs(seg, KsSeg(d, d, d))
      }
      flush(); out.iterator
    }
    // distributed stitch: ≤ nPart fragments per group, folded in pid order
    val rows = frags.groupByKey().map { case (g, fs) =>
      val sortedFs = fs.toSeq.sortBy(_._1)
      val tot = sortedFs.map(_._2).reduceLeft(combineKs)
      val ksNum = tot.mmax.abs.max(tot.mmin.abs)
      val (n1, n2) = (sortedFs.head._3, sortedFs.head._4)
      Row(g, n1, n2, new JBigDecimal(ksNum))
    }
    val d38 = DecimalType(38, 0)
    spark.createDataFrame(rows, ksGroupSchema)
      .select(col("g"), col("n1"), col("n2"), col("ks_num"),
        (col("n1").cast(d38) * col("n2").cast(d38)).cast(d38).as("ks_den"))
      .select(col("g"), col("n1"), col("n2"),
        when(col("ks_den") > 0,
          graft.functions.IntRatio.micro("ks_num", "ks_den"))
          .as("ks_micro"))
  }

  /** Calibration curve (reliability diagram) of an INTEGER score — the
    * companion audit to [[aucROC]]: AUC says the scorer RANKS well,
    * calibration says whether the score VALUE can be trusted as a
    * threshold (per score band: how many examples, how many positive).
    * Bands are equal-width over the observed [min, max]:
    *
    *   bin = (score − lo) · nBins div (hi − lo + 1)
    *
    * — all-integer (one subtraction, one multiply, one integral divide of
    * non-negative operands), so the binning is engine-exact. Scores from
    * the q116 dot-product family are ≤ ~10¹⁴; ·nBins stays far inside
    * Long. Output per occupied bin (all BIGINT):
    * (bin, n, n_pos, pos_rate_micro).
    *
    * Scale shape: one 1-row min/max agg broadcast into a scan-side bin
    * expression, then one partial-agg'd groupBy over ≤ nBins rows — two
    * scans, KB exchanges.
    */
  def calibration(scored: DataFrame, posCol: org.apache.spark.sql.Column,
      scoreCol: org.apache.spark.sql.Column, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val d38 = DecimalType(38, 0)
    val s = scored.select(posCol.cast("long").as("pos"),
      scoreCol.cast("long").as("score"))
    val mm = s.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    s.crossJoin(broadcast(mm))
      .select(col("pos"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(expr(s"((score - lo) * $nBins) div (hi - lo + 1)"))
          .as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        col("n_pos").cast(d38).as("pr_num"), col("n").cast(d38).as("pr_den"))
      .select(col("bin"), col("n"), col("n_pos"),
        graft.functions.IntRatio.micro("pr_num", "pr_den")
          .as("pos_rate_micro"))
      .orderBy(col("bin"))
  }
}
