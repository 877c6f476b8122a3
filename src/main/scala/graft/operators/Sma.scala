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

/** One flagged tick from the rolling z-score anomaly detector (q119 batch,
  * q122 streaming — identical integer test, identical oracle).
  */
final case class AnomalyRow(
    seq: Long,
    ts: java.sql.Timestamp,
    hub: String,
    price_mwh: Double,
    dev2_scaled: Long,
    thr_scaled: Long)

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

  /** Rolling z-score anomaly flags — the spike detector a market (or any
    * metric) stream runs continuously: a tick is anomalous when it sits
    * more than `z` sample standard deviations from its own trailing
    * `window`-tick mean.
    *
    * The whole test runs in INTEGER arithmetic — no sqrt, no division, no
    * doubles to diverge between engines. With cents `pc = round(100·x)`,
    * trailing sums `S = Σpc`, `Q = Σpc²` and `dev = n·pc − S`:
    *
    *   |x − μ| > z·σ   ⇔   (n−1)·dev² > z²·n·(n·Q − S²)
    *
    * (multiply through by n²·(n−1); σ² = (n·Q − S²)/(n·(n−1)) is the
    * sample variance). Only FULL windows are tested — a 3-tick history has
    * no meaningful σ. Long headroom: dev² and n·Q stay under 2⁶³ for
    * |pc| < ~10⁸ cents (million-dollar prints) at window 20; past that,
    * cast the two comparison sides to DECIMAL(38,0) — same plan shape.
    *
    * Scale shape: identical to [[withForecast]] — one hash exchange on the
    * key, one sort serving both trailing frames, scan-side arithmetic,
    * then a selective filter. Emits only the flagged ticks:
    * (seq, ts, hub, price_mwh, dev2_scaled, thr_scaled).
    */
  /** The q119 integer 3σ test over one FULL window of cents (last element
    * is the tick under test) — the pure kernel shared by the batch window
    * plan and [[graft.streaming.StreamingOps.anomalyStream]]'s ring state.
    * Returns (dev2_scaled, thr_scaled); anomalous iff dev2 > thr.
    */
  private[graft] def anomalyScores(win: IndexedSeq[Long], z: Int): (Long, Long) = {
    val n = win.length.toLong
    var s = 0L; var q = 0L
    win.foreach { v => s += v; q += v * v }
    val dev = n * win.last - s
    ((n - 1) * dev * dev, z.toLong * z * n * (n * q - s * s))
  }

  def rollingAnomalies(prices: DataFrame, keyCol: Column, valueCol: Column,
      orderCols: Seq[Column], window: Int = 20, z: Int = 3): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-(window - 1), 0)
    prices
      .withColumn("pc", round(valueCol * 100).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("pc")).over(w))
      .withColumn("q", sum(col("pc") * col("pc")).over(w))
      .filter(col("n") === window)
      .withColumn("dev", col("n") * col("pc") - col("s"))
      .withColumn("dev2_scaled", (col("n") - 1) * col("dev") * col("dev"))
      .withColumn("thr_scaled",
        lit(z.toLong * z) * col("n") * (col("n") * col("q") - col("s") * col("s")))
      .filter(col("dev2_scaled") > col("thr_scaled"))
      .drop("pc", "n", "s", "q", "dev")
  }
}
