package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling simple-moving-average forecast (reference `ForecastFunction`,
  * ForecastsJob.java:76-88; SURVEY.md §2.4).
  *
  * The reference keeps two ListState ring buffers per hub and rewrites them
  * wholesale per tick (O(n) per element — ForecastsJob.java:86). In batch the
  * whole operator is a Catalyst window: *count-based* frames
  * `ROWS BETWEEN 4|19 PRECEDING AND CURRENT ROW` partitioned by key, ordered
  * by the pinned arrival order `(ts, seq)`. One hash exchange on the key
  * (same boundary as the reference's `keyBy`), then a single sort per
  * partition serves both frames; partial windows average 1..N elements
  * exactly like the reference (`avgOf` over whatever the buffer holds,
  * ForecastsJob.java:87). `forecast_next = sma5` (ref :84 — the "forecast"
  * is just SMA5).
  */
object Sma {

  /** Append sma5 / sma20 / forecast_next columns. */
  def withForecast(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    df.withColumn("sma5", avg(valueCol).over(w.rowsBetween(-4, 0)))
      .withColumn("sma20", avg(valueCol).over(w.rowsBetween(-19, 0)))
      .withColumn("forecast_next", col("sma5"))
  }
}
