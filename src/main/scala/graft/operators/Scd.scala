package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: collapse a keyed
  * update stream into attribute-validity intervals — the standard
  * warehouse modeling pass that turns "every observation" into "each value
  * and when it held".
  *
  * Two steps, both over the same `(key)` hash partitioning and `(ts, seq)`
  * sort, so Catalyst plans ONE exchange and ONE sort for the whole
  * operator (the change-filter preserves the child's distribution and
  * order, and EnsureRequirements sees the second window already
  * satisfied):
  *   1. change detection — keep a row only when its attribute differs from
  *      the key's previous row (`lag`), so runs of identical observations
  *      collapse to their first;
  *   2. interval closing — each change's `valid_to` is the NEXT change's
  *      timestamp (`lead`); the last change per key stays open
  *      (NULL valid_to, `is_current`).
  */
object Scd {

  /** Build the SCD2 history. `df` must have columns (key, attr, ts, seq);
    * output: (key, attr, valid_from_ts, valid_from_seq, valid_to_ts,
    * is_current), one row per value run per key.
    */
  def scd2(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("seq"))
    df
      .withColumn("_prev", lag(col("attr"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("attr"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("key"), col("attr"),
        col("ts").as("valid_from_ts"), col("seq").as("valid_from_seq"),
        col("valid_to_ts"), col("valid_to_ts").isNull.as("is_current"))
  }
}
