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
}
