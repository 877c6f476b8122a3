package graft.model

import org.apache.spark.sql.types._

/** Single source of truth for the reference's record types.
  *
  * The reference re-declares these POJOs in every Flink job (e.g. `PriceTick`
  * at IngestPricesAndTradesJob.java:78-80, again at ForecastsJob.java:62);
  * here they live once, as case classes with Spark [[StructType]] schemas for
  * `from_json` ingestion. Field names use the wire (snake_case) names so the
  * DataFrame columns match the JSON payloads and the Postgres DDL
  * (postgres/init.sql) without renames.
  */

/** Spot price tick — reference IngestPricesAndTradesJob.java:78-80. */
final case class PriceTick(ts: String, hub: String, price_mwh: Double)

/** Trade — reference IngestPricesAndTradesJob.java:82-84. */
final case class Trade(
    trade_id: Long,
    ts: String,
    account: String,
    hub: String,
    side: String,
    mw: Int,
    price_mwh: Double)

/** Day-ahead LMP components — reference IngestDayAheadAndRealTimeJob.java:67. */
final case class DaLmp(
    ts: String,
    hub: String,
    lmp_da: Double,
    energy_da: Double,
    congestion_da: Double,
    loss_da: Double)

/** Real-time LMP components — reference IngestDayAheadAndRealTimeJob.java:68. */
final case class RtLmp(
    ts: String,
    hub: String,
    lmp_rt: Double,
    energy_rt: Double,
    congestion_rt: Double,
    loss_rt: Double)

// Engine-typed derived rows (Forecast, PnlRow, ExposureRow, MarketEvent,
// AccState, HubState) live in graft.operators next to their kernels; the
// classes above are the wire-format (JSON topic) records with ISO-8601
// string timestamps, exactly as the reference carries them end-to-end
// (SURVEY.md §1 "timestamps are carried as ISO-8601 strings").

object Schemas {
  val priceTick: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("hub", StringType),
    StructField("price_mwh", DoubleType)))

  val trade: StructType = StructType(Seq(
    StructField("trade_id", LongType),
    StructField("ts", StringType),
    StructField("account", StringType),
    StructField("hub", StringType),
    StructField("side", StringType),
    StructField("mw", IntegerType),
    StructField("price_mwh", DoubleType)))

  val daLmp: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("hub", StringType),
    StructField("lmp_da", DoubleType),
    StructField("energy_da", DoubleType),
    StructField("congestion_da", DoubleType),
    StructField("loss_da", DoubleType)))

  val rtLmp: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("hub", StringType),
    StructField("lmp_rt", DoubleType),
    StructField("energy_rt", DoubleType),
    StructField("congestion_rt", DoubleType),
    StructField("loss_rt", DoubleType)))
}
