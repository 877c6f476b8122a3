package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One EWMA output per price tick (companion forecast family to
  * [[graft.streaming.ForecastRow]]'s SMA — same pinned `(ts, seq)` arrival
  * order).
  */
final case class EwmaRow(
    seq: Long,
    ts: java.sql.Timestamp,
    hub: String,
    price_mwh: Double,
    ewma: Double)

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

  /** One EWMA fold step — the pure kernel shared by the batch fold and
    * [[graft.streaming.StreamingOps.ewmaStream]]. First tick seeds the
    * average; then `s ← α·x + (1−α)·s`, two multiplies + one add in that
    * exact order, so the double result is bit-reproducible in any engine
    * that folds the same sequence.
    */
  private[graft] def ewmaStep(prev: Option[Double], x: Double, alpha: Double): Double =
    prev match {
      case Some(s) => alpha * x + (1 - alpha) * s
      case None    => x
    }

  /** Exponentially-weighted moving average per hub over the pinned
    * `(ts, seq)` arrival order — the infinite-memory companion to the
    * SMA5/20 forecast (EWMA is what the reference's forecast family would
    * ship next; same keyed-fold shape as [[Pnl.replay]]).
    *
    * Scale shape: an EWMA is an order-dependent recurrence, so each key IS
    * the sequential unit — exactly like the PnL fold. One hash exchange on
    * `hub`, one sort per partition, then a single-pass `mapPartitions`
    * fold; parallelism is the number of keys (hubs), the intrinsic limit
    * of any per-key recurrence. A window function cannot express the
    * recurrence and per-key `collect_list` would buffer whole histories;
    * the streaming twin carries one double of state per key forever.
    */
  def ewma(prices: Dataset[MarketEvent], alpha: Double): Dataset[EwmaRow] = {
    val spark = prices.sparkSession
    import spark.implicits._
    prices
      .repartition(col("hub"))
      .sortWithinPartitions(col("hub"), col("ts"), col("seq"))
      .mapPartitions { it =>
        var hub: String = null
        var s: Option[Double] = None
        it.map { e =>
          if (hub == null || e.hub != hub) { hub = e.hub; s = None }
          val v = ewmaStep(s, e.price_mwh, alpha)
          s = Some(v)
          EwmaRow(e.seq, e.ts, e.hub, e.price_mwh, v)
        }
      }
  }
}
