package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
