package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-group — Postgres `SELECT DISTINCT ON (…) … ORDER BY …, ts
  * DESC` from the reference's query surface (README.md:92-96; SURVEY.md
  * §2.8 R3/R4).
  *
  * Implemented as `row_number` over a window ordered descending, filtered to
  * rank 1: one exchange on the group keys + one sort — the plan Spark's
  * `TopK`-per-group rewrite would pick. At scale this beats a self-join
  * against a max-ts aggregate (one shuffle instead of two plus no join).
  */
object LatestPerGroup {

  /** Keep the single latest row per `keys`, "latest" = max by `orderDesc`
    * (compared descending, e.g. `Seq(col("ts"), col("seq"))`).
    */
  def latest(df: DataFrame, keys: Seq[Column], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
