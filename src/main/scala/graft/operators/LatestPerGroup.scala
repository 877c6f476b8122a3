package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-group — Postgres `SELECT DISTINCT ON (…) … ORDER BY …, ts
  * DESC` from the reference's query surface (README.md:92-96; SURVEY.md
  * §2.8 R3/R4).
  *
  * Implemented as `max_by(struct(<all cols>), struct(<order cols>))` — a
  * declarative aggregate with map-side partial aggregation. The window
  * (`row_number` = 1) alternative shuffles EVERY row to its group's
  * partition and sorts there; with the reference's low-cardinality keys
  * (4 hubs, 12 (account, hub) pairs) that caps active parallelism at the
  * group count and melts down at 100 TB. The agg form reduces each input
  * partition to ≤|groups| rows before the exchange, so the shuffle is tiny
  * and parallelism stays at the scan width regardless of key cardinality.
  */
object LatestPerGroup {

  /** Keep the single latest row per `keys`, "latest" = lexicographic max of
    * `order` (e.g. `Seq(col("ts"), col("seq"))`); `order` must be unique
    * within a group for a deterministic result.
    */
  def latest(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val row = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys: _*)
      .agg(max_by(row, struct(order: _*)).as("__row"))
      .select(col("__row.*"))
  }

  /** `row_number() OVER (PARTITION BY keys ORDER BY order DESC) = 1` — the
    * classic plan, kept as the equivalence oracle for [[latest]] (asserted
    * in DedupSpec "latest-per-group agg equals window plan").
    */
  def latestWindow(df: DataFrame, keys: Seq[Column], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
