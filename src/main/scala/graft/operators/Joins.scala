package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark has no built-in operator for, expressed so Catalyst
  * still sees plain shuffles/equi-joins (never a BroadcastNestedLoopJoin).
  *
  * The reference's nearest construct is the PnL CoProcess (trade → latest
  * price per hub, PnlAndExposureJob.java:134-137) — [[asOfJoin]] is that
  * lookup generalized to any (keys, order, payload); [[rangeJoinBucketed]]
  * is the standard interval-bucketing reduction of a range predicate to an
  * equi-join.
  */
object Joins {

  /** Conf key capping [[hintSmall]]'s row count (set 0 to disable every
    * graft size-gated broadcast hint at once).
    */
  val HintSmallMaxRowsKey = "spark.graft.broadcast.maxRows"

  /** SIZE-GATED broadcast hint for a MATERIALIZED (checkpointed /
    * localCheckpointed) frame: such frames carry no size statistics, so
    * the planner falls back to its default (huge) estimate and plans
    * sort-merge — per micro-batch in a stream-static join, per join in a
    * multi-stage assembly — even when the frame is KBs. Hinting
    * unconditionally is worse (r16 ADVICE): a production landed store or
    * flag frame is NOT broadcastable, and a hard-wired hint turns a slow
    * plan into a driver OOM. So the hint is gated on the frame's REAL row
    * count — one cheap job against already-materialized blocks — under
    * `spark.graft.broadcast.maxRows` (default 100 000 rows: ids/flags/
    * sketch rows ≤ ~1 KB keep the built relation well inside the guide's
    * few-hundred-MB broadcast comfort zone; 0 disables the hint entirely,
    * restoring pure planner choice). Above the cap the frame is returned
    * unhinted and the planner decides from whatever it knows.
    */
  def hintSmall(df: DataFrame): DataFrame = {
    val cap = hintCap(df)
    if (cap > 0 && df.count() <= cap) broadcast(df) else df
  }

  private def hintCap(df: DataFrame): Long =
    df.sparkSession.conf.getOption(HintSmallMaxRowsKey)
      .map(_.toLong).getOrElse(100000L)

  /** [[hintSmall]] for callers that already hold an UPPER BOUND on the
    * frame's row count (a funnel gates every stage frame by the corpus
    * count it measures once) — same size gate, zero extra count jobs:
    * the per-frame `count()` probes measurably ate the plan win at gate
    * scale (~10 jobs/gate in the r17 A/B). `boundRows` must bound the
    * frame's true cardinality or the gate is meaningless.
    */
  def hintSmallBounded(df: DataFrame, boundRows: Long): DataFrame = {
    val cap = hintCap(df)
    if (cap > 0 && boundRows >= 0 && boundRows <= cap) broadcast(df) else df
  }

  /** As-of join: for every `left` row, the single nearest `right` row at or
    * before it in the order (`direction = "backward"`, the default — order
    * key ≤ the left row's) or at or after it (`direction = "forward"` —
    * order key ≥, the next-tick/slippage lookup); right payload columns
    * come back null when no such row exists.
    *
    * Implementation is a tagged union + one window pass, NOT a range join:
    * both sides shuffle once on `keys`, sort within partitions by
    * (orderCols, tag) — right rows (tag 0) before left rows (tag 1) at
    * equal order keys, giving inclusive semantics in either direction
    * (forward simply scans the order descending) — and a running
    * `last(_, ignoreNulls)` carries the nearest right payload along the
    * scan. O(n log n) in the partition sort, O(1) state per key; at 100 TB
    * this is one exchange over the combined inputs, the same shape as the
    * PnL secondary sort. No pair blow-up, no per-key collect.
    *
    * `rightVals` maps right-side column name → output name; output names
    * must not collide with left columns.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               orderCols: Seq[String], rightVals: Map[String, String],
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown as-of direction: $direction")
    val payloadT = org.apache.spark.sql.types.StructType(
      right.select(rightVals.keys.toSeq.map(col): _*).schema.fields)
    val leftCols = left.columns
    val l = left
      .withColumn("_tag", lit(1))
      .withColumn("_rv", lit(null).cast(payloadT))
    val r0 = right.select((keys ++ orderCols).map(col) :+
      struct(rightVals.keys.toSeq.map(col): _*).as("_rv"): _*)
    // conform the right side to the union schema: left payload columns null
    val r = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.withColumn("_tag", lit(0)).select(l.columns.toIndexedSeq.map(col): _*)
    val ordered =
      if (direction == "backward") orderCols.map(col)
      else orderCols.map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((ordered :+ col("_tag")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val outVals = rightVals.toSeq.map { case (src, out) =>
      col("_rv").getField(src).as(out)
    }
    joined.select(leftCols.toIndexedSeq.map(col) ++ outVals: _*)
  }

  /** Skew-salted equi-join: when the join key has a few hot values (a
    * 5-value event_type, the 4-hub domain), a plain shuffle join lands each
    * hot key's entire fact volume on ONE reducer. Salting spreads it:
    * every fact row picks a deterministic salt from `saltBy` (a
    * high-cardinality fact column — hash-based, so the plan is
    * re-runnable, unlike rand()), the (small) `right` side replicates
    * ×`salts` with one copy per salt, and the join runs on (keys, salt) —
    * each hot key now occupies `salts` reducers. Replication cost is
    * |right|·salts, the deliberate price; result is exactly the plain
    * inner join (JoinsSpec property). AQE's skew split handles the
    * post-hoc case; salting is the a-priori form that also helps the
    * aggregate-after-join pattern.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("_salt", pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val r = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** The salt-count decision rule behind [[skewAwareJoin]], as a pure
    * function of the fact side's key-frequency audit: enough salts that
    * the hottest key's reducer share shrinks to ~the MEAN key's volume —
    * `ceil(maxCount / (nRows / nKeys))`, i.e. the hot key's multiple of
    * the average frequency — clamped to [1, maxSalts] (each salt
    * replicates the dim side once; past maxSalts the replication cost
    * outruns the balance win). A uniform key derives 1 → the plain join,
    * so the rule is a no-op exactly when salting would be pure overhead.
    * BigInt intermediate: maxCount·nKeys overflows Long at warehouse
    * cardinalities (10¹² rows × 10⁹ keys).
    */
  def deriveSalts(nKeys: Long, nRows: Long, maxCount: Long,
      maxSalts: Int = 64): Int = {
    require(maxSalts > 0, "maxSalts must be positive")
    if (nKeys <= 0 || nRows <= 0) 1
    else ((BigInt(maxCount) * nKeys + nRows - 1) / nRows)
      .min(maxSalts).max(1).toInt
  }

  /** Skew-AWARE equi-join: the composed decision pipeline the q181 Gini
    * audit and the q88 salted join exist for, as ONE operator — measure
    * the fact side's key skew, derive the salt count with [[deriveSalts]],
    * then run either the plain join (uniform keys) or [[saltedJoin]]
    * (hot keys). The result is exactly the plain inner join either way
    * (the q194 gate hash-matches it); only the shuffle layout adapts.
    *
    * The audit is one partial-agg'd groupBy collapsed to a single driver
    * row — the same eager-statistics trade as the Bloom-prefiltered join
    * (production would read table/column stats instead of scanning; the
    * explicit scan keeps the operator self-contained and the decision
    * deterministic and testable). `auditCol`, when set, appends the
    * derived salt count as a constant column so gates and operators can
    * assert the DECISION, not just the rows.
    *
    * CONTRACT: `left` must be deterministic — it is evaluated twice (once
    * for the audit, once in the join), the [[bloomPrefilterJoin]] caveat.
    */
  def skewAwareJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBy: Column, maxSalts: Int = 64,
      auditCol: Option[String] = None): DataFrame = {
    val audit = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(count(lit(1)).as("_nk"), sum(col("_c")).as("_nr"),
        max(col("_c")).as("_mx"))
      .collect()(0)
    val salts =
      if (audit.isNullAt(1)) 1 // empty left: no keys, plain join
      else deriveSalts(audit.getLong(0), audit.getLong(1), audit.getLong(2),
        maxSalts)
    val joined =
      if (salts == 1) left.join(right, keys)
      else saltedJoin(left, right, keys, salts, saltBy)
    auditCol.fold(joined)(c => joined.withColumn(c, lit(salts)))
  }

  /** Range join `fact.point ∈ [interval.lo, interval.hi)` as an equi-join:
    * both sides key on `floor(value / bucketWidth)` — the interval side
    * explodes to every bucket its range overlaps — then the exact predicate
    * refines. Each (fact, interval) pair meets in exactly one bucket (the
    * fact's), so no post-join dedup is needed.
    *
    * Scale shape: a plain shuffled hash join on the bucket key; interval
    * replication is ~(hi−lo)/bucketWidth per interval, so pick bucketWidth
    * near the median interval length. The alternative Spark picks for a raw
    * inequality join — BroadcastNestedLoopJoin — is O(|fact|·|intervals|).
    */
  def rangeJoinBucketed(fact: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val fb = fact.withColumn("_rb", floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("_rb", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    fb.join(ib, Seq("_rb"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_rb")
  }

  /** Bloom-prefiltered equi-join: build a Bloom sketch of the dim side's
    * join keys (nBits/8 bytes regardless of dim size), broadcast it as a
    * LITERAL (the q92 decode-cache pattern), and filter the fact side
    * BEFORE its shuffle — only fact rows whose key might match ever enter
    * the exchange. The follow-up exact equi-join drops the sketch's false
    * positives, so the result is IDENTICAL to the plain join (hash-gated,
    * not quality-gated); the sketch only cuts shuffled volume.
    *
    * This is the 100 TB shape for selective fact⋈dim joins where the dim
    * is too big to broadcast as a hash relation (100 M keys ≈ GBs) but its
    * Bloom is not (≈512 KB at 2²² bits): a 1%-selective dim turns a full
    * fact shuffle into a ~1% shuffle for one extra scan-side probe per
    * row. Spark's own runtime row-level filters do this opportunistically;
    * the explicit operator makes the plan deterministic and testable.
    *
    * The sketch is collected eagerly at plan-build (one aggregate job over
    * the dim — same trade-off as the IVF centroid literals; production
    * would materialize it next to the table). Inner joins only: a missing
    * fact row can only be one the join would drop anyway.
    *
    * CONTRACT: `dim` must be deterministic — it is evaluated twice (once
    * for the sketch, once in the join), and a nondeterministic dim (e.g.
    * one built on rand() or an unstable limit) could present keys to the
    * join that the sketch pass never saw, turning the prefilter's
    * guaranteed-zero false negatives into real dropped matches. Persist or
    * localCheckpoint such a dim before calling.
    */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, nBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    require(nBits > 0 && (nBits & 63) == 0, "nBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val bfBytes: Array[Byte] = dim
      .agg(call_function("graft_bloom", xxhash64(col(dimKey)),
        lit(nBits), lit(numHashes)).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact
      .filter(call_function("graft_bloom_contains", lit(bfBytes),
        xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
