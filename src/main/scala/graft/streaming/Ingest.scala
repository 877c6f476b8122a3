package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** JSON topic ingestion — the reference's per-topic Jackson deserializers
  * (IngestPricesAndTradesJob.java:86-112, IngestDayAheadAndRealTimeJob.java:
  * 70-89) become `from_json` over a fixed StructType per topic.
  *
  * Works identically on a batch DataFrame of raw strings, a MemoryStream, or
  * `spark.readStream.format("kafka")` output (select `CAST(value AS STRING)`
  * first) — sources are a config switch, not a code path (SURVEY.md §7).
  *
  * Timestamps arrive as ISO-8601 strings in two variants (FIXTURES.md §1):
  * naive `2024-01-15T10:30:45.123456` (producer.py:89) and offset-aware
  * `…+00:00` (producer_da_rt.py:11-12). `ts_utc` normalizes both to
  * TimestampType; the raw string is kept for byte-faithful replay
  * (SURVEY.md §7 "string-timestamp fidelity").
  */
object Ingest {

  /** Parse both ISO-8601 variants to a UTC timestamp; null (→ frame
    * dropped) on garbage rather than an ANSI cast error — one poison frame
    * must not kill the stream.
    */
  def tsUtc(raw: Column): Column = try_to_timestamp(raw)

  /** Malformed frames are DROPPED, not forwarded as null rows: unparseable
    * JSON gives a null struct, wrong-shape JSON gives a null/unparseable
    * `ts` — both filtered. (The reference's Jackson deserializer throws and
    * fails the job on garbage, IngestPricesAndTradesJob.java:91; at scale a
    * poison frame must not take the pipeline down.)
    */
  private def parse(raw: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    raw.select(from_json(col("value").cast("string"), schema).as("j"))
      .filter(col("j").isNotNull)
      .select(col("j.*"))
      .withColumn("ts_utc", tsUtc(col("ts")))
      .filter(col("ts_utc").isNotNull)

  /** topic `prices` → (ts STRING, hub, price_mwh, ts_utc TIMESTAMP) */
  def prices(raw: DataFrame): DataFrame = parse(raw, Schemas.priceTick)

  /** topic `trades` */
  def trades(raw: DataFrame): DataFrame = parse(raw, Schemas.trade)

  /** topic `dayahead_prices` */
  def dayahead(raw: DataFrame): DataFrame = parse(raw, Schemas.daLmp)

  /** topic `realtime_prices` */
  def realtime(raw: DataFrame): DataFrame = parse(raw, Schemas.rtLmp)

  /** Tag + union parsed price and trade frames into the MarketEvent shape
    * feeding the PnL operator (SURVEY.md §2.5 "union of tagged events").
    * `seq` must be a monotonically increasing arrival id; for Kafka use the
    * record offset, for fixtures the event id.
    */
  def marketUnion(prices: DataFrame, trades: DataFrame, priceSeq: Column, tradeSeq: Column): DataFrame = {
    val p = prices.select(priceSeq.cast("long").as("seq"), col("ts_utc").as("ts"),
      col("hub"), lit("price").as("kind"), lit("").as("account"), lit("").as("side"),
      lit(0).as("mw"), col("price_mwh"))
    val t = trades.select(tradeSeq.cast("long").as("seq"), col("ts_utc").as("ts"),
      col("hub"), lit("trade").as("kind"), col("account"), col("side"),
      col("mw"), col("price_mwh"))
    p.unionByName(t)
  }
}
