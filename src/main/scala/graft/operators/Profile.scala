package graft.operators

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.RangePartitioner
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

/** Dataset profiling — the per-column health report (row/null/distinct
  * counts, lexicographic min/max, total string length) a pipeline audits
  * before and after every curation stage. Everything is computed over the
  * STRING form of each column so one operator covers any schema and the
  * numbers are engine-portable (integer→string rendering is identical
  * across engines; no doubles are profiled here).
  *
  * Scale shape: ONE scan. All metrics for all columns live in a single
  * aggregate; the exact distinct counts make Catalyst plan it as an Expand
  * (k× row multiply, partial-aggregated map-side so the exchange carries
  * distinct (column, value) pairs, not rows). At 100 TB swap
  * `count_distinct` for `approx_count_distinct` (or the q98 mergeable HLL
  * sketches) if ±2% is acceptable — the rest of the plan is unchanged.
  * The wide→long unpivot is a scan-side `stack` over the one aggregated
  * row: no second exchange.
  */
object Profile {

  /** One row per profiled column:
    * (col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_len).
    * min/max/len are over the string cast, min/max truncated to
    * `truncateTo` chars so document-sized values stay report-sized.
    */
  def profile(df: DataFrame, cols: Seq[String], truncateTo: Int = 32): DataFrame = {
    val aggs = cols.flatMap { c =>
      val sc = col(c).cast("string")
      Seq(
        sum(when(sc.isNull, 1L).otherwise(0L)).as(s"${c}__null"),
        count_distinct(sc).as(s"${c}__distinct"),
        substring(min(sc), 1, truncateTo).as(s"${c}__min"),
        substring(max(sc), 1, truncateTo).as(s"${c}__max"),
        sum(length(sc).cast("long")).as(s"${c}__len"))
    }
    val agged = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__null`, `${c}__distinct`, `${c}__min`, `${c}__max`, `${c}__len`"
    }.mkString(", ")
    agged.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_val, max_val, sum_len)")
      .select(col("col_name"), col("__n").as("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"), col("sum_len"))
  }

  /** Equi-width histogram of a numeric column: one row per occupied bin
    * (empty bins are absent — at 100 TB the occupied-bin frame is what
    * fits anywhere; grid-completing is a tiny left join the caller can
    * add). `bin = floor(x / width)`, engine-exact for doubles; min/max
    * ride along so each bar is self-describing.
    * Output: (bin, bin_lo, n, min_val, max_val).
    */
  def histogram(df: DataFrame, valueCol: Column, width: Double): DataFrame =
    df.select(valueCol.cast("double").as("x"))
      .groupBy(floor(col("x") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_val"),
        max(col("x")).as("max_val"))
      .select(col("bin"), (col("bin") * width).as("bin_lo"), col("n"),
        col("min_val"), col("max_val"))

  private val skewSchema = StructType(Seq(
    StructField("p_keys", LongType, nullable = false),
    StructField("p_rows", LongType, nullable = false),
    StructField("p_max", LongType, nullable = false),
    StructField("p_rc", DecimalType(38, 0), nullable = false)))

  /** Key-skew audit: the Gini concentration index of a key's frequency
    * distribution — the number a planner reads BEFORE deciding whether a
    * join/agg on this key needs salting or AQE skew-split (Gini ≈ 0:
    * uniform keys, shuffle partitions balance; → 1: a few keys carry the
    * table and one reducer would own the job). Over counts c₁…c_K sorted
    * ascending with ranks 1…K:
    *
    *   G = (2·Σᵢ i·cᵢ − (K+1)·Σc) / (K·Σc)
    *
    * — the all-integer closed form, exact at any scale (BigInteger rank
    * products; at 10¹¹ rows and 10⁹ keys Σ i·cᵢ ~ 10²⁰, past Long,
    * inside DECIMAL(38,0)). Equal counts make the rank sum order-invariant
    * within the tied block, so the tie-break (count, key) is pinned only
    * for determinism of the scan, not of the result.
    *
    * Output (hash-gate discipline, one row, all BIGINT):
    * (n_keys, n_rows, max_count, gini_micro); NULL gini when the frame is
    * empty. Scale shape: one partial-agg'd groupBy builds the (key, count)
    * frame — the only row-count-sized exchange; ranking uses the
    * [[Eval.aucROC]] two-pass range-partition machinery over the KEY frame
    * (per-partition offsets from a KB-sized subtotal collect), never a
    * global window.
    */
  def keySkew(df: DataFrame, keyCol: Column, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val counts = df
      .groupBy(keyCol.cast("long").as("k"))
      .agg(count(lit(1)).as("c"))
      .as[(Long, Long)].rdd
      .map { case (k, c) => ((c, k), c) }
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = counts.repartitionAndSortWithinPartitions(
      new RangePartitioner(nPart, counts))
    val subtotals = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        var n = 0L; it.foreach(_ => n += 1); Iterator((pid, n))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    val partRows = sorted.mapPartitionsWithIndex { case (pid, it) =>
      var rank = offsets(pid)
      var nk = 0L; var rows = 0L; var maxC = 0L
      var sumRC = BigInteger.ZERO
      it.foreach { case ((c, _), _) =>
        rank += 1; nk += 1; rows += c
        if (c > maxC) maxC = c
        sumRC = sumRC.add(
          BigInteger.valueOf(rank).multiply(BigInteger.valueOf(c)))
      }
      Iterator(Row(nk, rows, maxC, new JBigDecimal(sumRC)))
    }
    val d38 = DecimalType(38, 0)
    df.sparkSession.createDataFrame(partRows, skewSchema)
      .agg(sum(col("p_keys")).as("n_keys"), sum(col("p_rows")).as("n_rows"),
        max(col("p_max")).as("max_count"),
        coalesce(sum(col("p_rc")), lit(0).cast(d38)).as("s_rc"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        (lit(2).cast(d38) * col("s_rc")
          - (col("n_keys") + 1).cast(d38) * col("n_rows").cast(d38))
          .cast(d38).as("g_num"),
        (col("n_keys").cast(d38) * col("n_rows").cast(d38)).cast(d38)
          .as("g_den"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        when(col("g_den") > 0,
          graft.functions.IntRatio.micro("g_num", "g_den"))
          .as("gini_micro"))
  }
}
