package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles without per-group value buffering.
  *
  * Spark's built-in `percentile` materializes EVERY value of a group in one
  * aggregation buffer — with a handful of groups at 100 TB that is ~n/groups
  * doubles in a single executor's memory → OOM. This operator computes the
  * same bit-exact answer in bounded memory via bracketed selection:
  *
  *   1. brackets — per group, `count` + `percentile_approx` at
  *      p ± 2/accuracy (a bounded KLL-style sketch; rank error ≤ n/accuracy,
  *      so the bracket [vlo, vhi] covers the target ranks to within ONE rank
  *      on each side — see the fallback step);
  *   2. exact rank anchor — one partial-aggregated pass per
  *      (group, percentile): `below` = count(v < vlo), the in-bracket count,
  *      and the bracket's exact one-step neighbors `next_down` = max(v < vlo)
  *      / `next_up` = min(v > vhi). The neighbors make the selection robust
  *      for small groups, where ±2/accuracy is less than one rank wide and
  *      the sketch may place a bracket edge one order statistic short of the
  *      target (below ≤ r+1 and covered_max ≥ r2−1 are guaranteed by the
  *      sketch's rank-error bound, so one exact neighbor per side closes the
  *      gap in every case);
  *   3. selection — row_number over ONLY the in-bracket sliver
  *      (≤ ~4n/accuracy rows per group-percentile, a spillable sort, not an
  *      agg buffer) picks the order statistics at ranks r = ⌊(n−1)p⌋ and
  *      r2 = min(r+1, n−1), then interpolates with Spark `percentile`'s own
  *      formula `(higher − position) · lo + (position − lower) · hi` so
  *      results are bit-identical to the built-in (PercentilesSpec).
  *
  * Cost: two full passes over the column plus the sliver sort (vs one pass
  * for the buffering built-in) — the price of bounded memory; every exchange
  * carries (group, percentile)-sized rows except the candidate sliver.
  *
  * Groups whose values are all null are omitted (the buffering built-in
  * returns a null-valued row for them).
  */
object Percentiles {

  /** Exact percentiles `ps` (output-name → fraction) of `valueCol` per
    * `groupCol`. Returns one row per group: (g, <name1>, <name2>, ...).
    */
  def exact(df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[(String, Double)], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val eps = 2.0 / accuracy
    val base = df.select(groupCol.as("g"), valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val pLoSql = ps.map { case (_, p) => s"${math.max(0.0, p - eps)}D" }.mkString(",")
    val pHiSql = ps.map { case (_, p) => s"${math.min(1.0, p + eps)}D" }.mkString(",")
    val pArr = array(ps.map { case (_, p) => lit(p) }: _*)
    val brackets = base.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        expr(s"percentile_approx(v, array($pLoSql), $accuracy)").as("vlos"),
        expr(s"percentile_approx(v, array($pHiSql), $accuracy)").as("vhis"))
      .select(col("g"), col("n"), posexplode(arrays_zip(col("vlos"), col("vhis"))))
      .select(col("g"), col("n"), col("pos").as("i"),
        col("col.vlos").as("vlo"), col("col.vhis").as("vhi"))
      .withColumn("p", element_at(pArr, col("i") + 1))
      .withColumn("position", (col("n") - 1).cast("double") * col("p"))
      .withColumn("r", floor(col("position")).cast("long"))
      .withColumn("frac", col("position") - col("r"))
      .withColumn("r2", least(col("r") + 1, col("n") - 1))
    // brackets is (groups × percentiles) rows — broadcast by construction
    val joined = base.join(broadcast(brackets), "g")
    val inBracket = col("v") >= col("vlo") && col("v") <= col("vhi")
    val stats = joined.groupBy(col("g"), col("i")).agg(
      count(when(col("v") < col("vlo"), 1)).as("below"),
      max(when(col("v") < col("vlo"), col("v"))).as("next_down"),
      count(when(inBracket, 1)).as("cnt_in"),
      min(when(col("v") > col("vhi"), col("v"))).as("next_up"))
    val w = Window.partitionBy(col("g"), col("i")).orderBy(col("v"))
    val pickedAgg = joined.filter(inBracket)
      .join(broadcast(stats.select(col("g"), col("i"), col("below"))), Seq("g", "i"))
      .withColumn("g0", col("below") + row_number().over(w) - 1)
      .filter(col("g0") === col("r") || col("g0") === col("r2"))
      .groupBy(col("g"), col("i"))
      .agg(min(when(col("g0") === col("r"), col("v"))).as("lo_c"),
        min(when(col("g0") === col("r2"), col("v"))).as("hi_c"))
    // if the sketch's rank-error bound were ever violated beyond the
    // one-neighbor fallback (below > r+1 or r outside [below-1,
    // below+cnt_in]), the when-chains yield NULL — fail LOUDLY instead of
    // quietly emitting a NULL percentile for the group: a broken sketch
    // contract is a bug, not a data condition
    def checked(c: Column, which: String): Column =
      when(c.isNotNull, c).otherwise(raise_error(concat(
        lit(s"graft percentile bracket miss ($which) for group "),
        col("g").cast("string"),
        lit(" — percentile_approx rank-error contract violated"))).cast("double"))
    val res = brackets.join(broadcast(stats), Seq("g", "i"))
      .join(broadcast(pickedAgg), Seq("g", "i"), "left")
      .withColumn("lo", checked(coalesce(col("lo_c"),
        when(col("r") === col("below") - 1, col("next_down"))
          .when(col("r") === col("below") + col("cnt_in"), col("next_up"))), "lo"))
      .withColumn("hi", checked(coalesce(col("hi_c"),
        when(col("r2") === col("below") - 1, col("next_down"))
          .when(col("r2") === col("below") + col("cnt_in"), col("next_up"))), "hi"))
      // Spark Percentile's own arithmetic, replicated exactly for bit
      // parity: integral position returns the lower value; otherwise the
      // TWO-SIDED weighted form (higher−position)·lo + (position−lower)·hi
      // — NOT lo + (hi−lo)·frac, which differs in the last ulp
      .withColumn("res", when(col("frac") === 0.0, col("lo"))
        .otherwise((col("r") + 1 - col("position")) * col("lo") +
          (col("position") - col("r")) * col("hi")))
    res.groupBy(col("g")).agg(
      ps.zipWithIndex.map { case ((name, _), idx) =>
        max(when(col("i") === idx, col("res"))).as(name)
      }.head,
      ps.zipWithIndex.drop(1).map { case ((name, _), idx) =>
        max(when(col("i") === idx, col("res"))).as(name)
      }: _*)
  }
}
