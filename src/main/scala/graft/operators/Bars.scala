package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OHLC + VWAP bar aggregation over the tagged-union market stream — the
  * canonical market-data rollup downstream of the reference's ingest
  * (reference README.md:83-101 exposes raw prices/trades and SMA forecasts;
  * bars are the hourly rollup any consumer of those tables builds next).
  *
  * Input is the frozen [[Pnl.eventsAsMarket]] shape: (seq, ts, hub, kind,
  * side, mw, price_mwh) with kind ∈ {price, trade}.
  *
  * Scale shape: one `groupBy(hub, window(ts, barLen))` per side — a single
  * hash aggregate with map-side partial aggregation; the exchange carries
  * one row per (hub, bar), never ticks. Open/close ride lexicographic
  * `min/max(struct(ts, seq, px))` (seq is globally unique, so the arg-min
  * is total and deterministic) — partial-aggregatable, unlike the
  * row_number window alternative which would shuffle and sort every tick.
  * VWAP is a DECIMAL(28,12)-exact Σ(px·mw) — order-independent, so the
  * double result is bit-identical in any engine — over the integer Σmw.
  * The price and trade sides reunite with a full-outer join on (hub, bar):
  * bars with only prices keep NULL trade stats and vice versa.
  */
object Bars {

  /** Hourly-style OHLC (price ticks) + VWAP (trades) per hub per bar.
    * Output: (hub, bucket_start_s, open, high, low, close, n_ticks,
    * vwap, mw_total, n_trades), one row per (hub, bar) seen on either
    * side.
    */
  def ohlcVwap(market: DataFrame, barLen: String = "1 hour"): DataFrame = {
    val tick = struct(col("ts"), col("seq"), col("price_mwh").as("px"))
    val px = market.filter(col("kind") === "price")
      .groupBy(col("hub"), window(col("ts"), barLen).as("w"))
      .agg(min(tick).as("o"), max(col("price_mwh")).as("high"),
        min(col("price_mwh")).as("low"), max(tick).as("c"),
        count(lit(1)).as("n_ticks"))
      .select(col("hub"), unix_timestamp(col("w.start")).as("bucket_start_s"),
        col("o.px").as("open"), col("high"), col("low"),
        col("c.px").as("close"), col("n_ticks"))
    // decimal-cast the PRICE, then multiply by the integer mw in decimal:
    // casting the double PRODUCT instead can land exactly on a half-way
    // digit and round differently across engines (seen at sf0.1)
    val tr = market.filter(col("kind") === "trade")
      .groupBy(col("hub"), window(col("ts"), barLen).as("w"))
      .agg((sum(col("price_mwh").cast("decimal(18,6)") * col("mw"))
          .cast("double") / sum(col("mw"))).as("vwap"),
        sum(col("mw")).as("mw_total"), count(lit(1)).as("n_trades"))
      .select(col("hub"), unix_timestamp(col("w.start")).as("bucket_start_s"),
        col("vwap"), col("mw_total"), col("n_trades"))
    px.join(tr, Seq("hub", "bucket_start_s"), "full_outer")
  }

  /** Regular-grid resample with forward-fill — the gap-free time series a
    * downstream model trains on: one row per (hub, `stepSec` bucket) from
    * each hub's first tick bucket to its last, carrying the last observed
    * close through empty buckets (`is_gap` marks the filled rows).
    *
    * Scale shape: ticks collapse to bars first (one partial-agg exchange,
    * one row per (hub, bucket)); the grid EXPLODES FROM THE SPANS frame
    * (|hubs| rows → |hubs|·|buckets|), never from ticks; the forward fill
    * is `last(close) IGNORE NULLS` over a per-hub bucket order — one hash
    * exchange on hub over the BAR-sized frame. Nothing after the first
    * aggregate ever touches a tick.
    *
    * Output: (hub, bucket_start_s, n_ticks, is_gap, close_ffill).
    */
  def resampleFfill(market: DataFrame, stepSec: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tick = struct(col("ts"), col("seq"), col("price_mwh").as("px"))
    val bars = market.filter(col("kind") === "price")
      .groupBy(col("hub"),
        (floor(unix_timestamp(col("ts")) / stepSec) * stepSec)
          .cast("long").as("bucket_start_s"))
      .agg(max(tick).as("c"), count(lit(1)).as("n_ticks"))
      .select(col("hub"), col("bucket_start_s"),
        col("c.px").as("close"), col("n_ticks"))
    val spans = bars.groupBy(col("hub"))
      .agg(min(col("bucket_start_s")).as("mn"), max(col("bucket_start_s")).as("mx"))
    val grid = spans.select(col("hub"),
      explode(sequence(col("mn"), col("mx"), lit(stepSec))).as("bucket_start_s"))
    val w = Window.partitionBy(col("hub")).orderBy(col("bucket_start_s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(bars, Seq("hub", "bucket_start_s"), "left")
      .select(col("hub"), col("bucket_start_s"),
        coalesce(col("n_ticks"), lit(0L)).as("n_ticks"),
        col("close").isNull.as("is_gap"),
        last(col("close"), ignoreNulls = true).over(w).as("close_ffill"))
  }
}
