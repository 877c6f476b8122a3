package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical-association and grouped-regression statistics — the
  * relationship audits a curation pipeline runs between its metadata
  * dimensions (is `lang` independent of `source`? does length scale with
  * token count the same way per source?). Both operators aggregate to
  * margin-sized frames first, so the expensive part is one partial-agg
  * scan; the statistics themselves are arithmetic over KB-sized frames.
  */
object Stats {

  /** Chi-square contingency table: observed cell counts for `aCol` × `bCol`
    * plus row/column margins, the expected count under independence, and
    * each cell's χ² contribution (o−e)²/e — the per-cell evidence display
    * every independence test reads. (The χ² total is Σ of the UNROUNDED
    * contributions — summing engine-rounded doubles is order-dependent, so
    * the operator reports cells and leaves the scalar to the caller.)
    *
    * Engine-exact: expected and contribution are left-assoc double
    * products/quotients of the integer counts — identical IEEE ops in any
    * engine — rounded to 6 dp. `dev = o·N − r·c` is formed in doubles, not
    * integers: the integer product overflows Long once o·N passes 2⁶³
    * (~10¹¹ rows × 10¹¹ total), the doubles never do.
    *
    * Scale shape: one groupBy(a, b) partial-agg scan → cell frame
    * (|a|·|b| rows); margins re-aggregate the CELL frame (never the data)
    * and broadcast back; everything after is scan-side arithmetic on KBs.
    */
  def contingencyChi2(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val rm = cells.groupBy(col("a")).agg(sum(col("o")).as("r_total"))
    val cm = cells.groupBy(col("b")).agg(sum(col("o")).as("c_total"))
    val tot = cells.agg(sum(col("o")).as("n_total"))
    val oD = col("o").cast("double"); val nD = col("n_total").cast("double")
    val rD = col("r_total").cast("double"); val cD = col("c_total").cast("double")
    val dev = oD * nD - rD * cD
    cells
      .join(broadcast(rm), Seq("a"))
      .join(broadcast(cm), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("o"), col("r_total"), col("c_total"),
        round(rD * cD / nD, 6).as("expected"),
        round(dev * dev / (nD * rD * cD), 6).as("contrib"))
  }

  /** Per-group ordinary-least-squares line y ~ x: exact DECIMAL(38,0)
    * numerators/denominators from the closed form
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    *
    * over INTEGER x/y. The sums accumulate in Long (Σxy needs x·y·rows
    * < 2⁶³ — beyond that, cast the inputs to DECIMAL at the agg); the
    * closed-form products run in DECIMAL(38,0), which holds n·Σxy up to
    * 10³⁸ — exact at any realistic scale, and the integer num/den pair
    * hash-gates engine-for-engine. The DECIMAL(18,6) ratio columns are
    * derived entirely in integer space ([[graft.functions.IntRatio.ratio6]],
    * half-away-from-zero — slope/intercept can be negative):
    * `round(num/den AS DOUBLE, 6)` was the r6/r7 q121 hash-fail, because a
    * halfway-boundary double rounds engine-version-dependently. Degenerate
    * groups (constant x → den 0) yield NULL ratios.
    *
    * Scale shape: one partial-agg scan to a |groups|-row frame; the rest
    * is scan-side decimal arithmetic.
    */
  def olsByGroup(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = xCol.cast("long"); val y = yCol.cast("long")
    val agged = df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
    val nD = col("n").cast(d38); val sxD = col("sx").cast(d38)
    val syD = col("sy").cast(d38); val sxxD = col("sxx").cast(d38)
    val sxyD = col("sxy").cast(d38)
    agged.select(col("grp"), col("n"),
        (nD * sxyD - sxD * syD).cast(d38).as("slope_num"),
        (nD * sxxD - sxD * sxD).cast(d38).as("slope_den"),
        (syD * sxxD - sxD * sxyD).cast(d38).as("icept_num"))
      .select(col("grp"), col("n"), col("slope_num"), col("slope_den"),
        col("icept_num"),
        when(col("slope_den") =!= 0,
          graft.functions.IntRatio.ratio6("slope_num", "slope_den"))
          .as("slope"),
        when(col("slope_den") =!= 0,
          graft.functions.IntRatio.ratio6("icept_num", "slope_den"))
          .as("intercept"))
  }

  /** Percent rank of every row's integer value — `(rank_min − 1)/(n − 1)`
    * (SQL `percent_rank` with min-rank ties), emitted as an exact
    * micro-BIGINT: the per-document percentile a curriculum/quality
    * pipeline attaches before thresholding or bucketing, without EVER
    * running `percent_rank() OVER (ORDER BY …)` — the one-task global
    * window that cannot exist at 100 TB.
    *
    * Scale shape: the rank map is built on the DISTINCT-VALUE frame with
    * the [[Eval.aucROC]] two-pass machinery (groupBy(value) partial-agg →
    * range-partition → KB subtotal collect → per-partition running
    * cum-before), then joined back to the rows on the value — a
    * value-keyed equi-join Catalyst broadcasts when the distinct-value
    * frame is small (bounded metrics like doc length) and shuffles
    * otherwise. NULL pr_micro when n < 2 (percent_rank undefined).
    */
  def percentRank(df: DataFrame, idCol: Column, valueCol: Column,
      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rows = df.select(idCol.cast("long").as("id"),
      valueCol.cast("long").as("v"))
    val grouped = rows
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].rdd
      .map { case (v, c) => (v, c) }
    val nPart = math.max(1, math.min(parts, 32))
    val sorted = grouped.repartitionAndSortWithinPartitions(
      new org.apache.spark.RangePartitioner(nPart, grouped))
    val subtotals = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    val n = offsets.last
    val rankMap = sorted
      .mapPartitionsWithIndex { case (pid, it) =>
        var cum = offsets(pid)
        it.map { case (v, c) => val before = cum; cum += c; (v, before) }
      }
      .toDF("v", "cum_before")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    rows.join(rankMap, Seq("v"))
      .select(col("id"), col("v"),
        col("cum_before").cast(d38).as("pr_num"),
        lit(n - 1).cast(d38).as("pr_den"))
      .select(col("id"), col("v"),
        when(col("pr_den") > 0,
          graft.functions.IntRatio.micro("pr_num", "pr_den"))
          .as("pr_micro"))
  }
}
