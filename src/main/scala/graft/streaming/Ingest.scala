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

  /** Frame validity: JSON parsed AND every schema field present with the
    * right type (PERMISSIVE from_json nulls out a type-mismatched field —
    * e.g. a string `price_mwh` — which must count as malformed, not pass as
    * a null-field row) AND `ts` parseable. The reference's Jackson
    * deserializer would NPE on any of these (IngestPricesAndTradesJob
    * .java:91); at scale a poison frame must not take the pipeline down, so
    * we drop instead — but observably, never silently.
    */
  private def okCol(schema: org.apache.spark.sql.types.StructType): Column =
    col("j").isNotNull && tsUtc(col("j.ts")).isNotNull &&
      schema.fieldNames.map(f => col("j").getField(f).isNotNull).reduce(_ && _)

  /** Malformed frames are DROPPED, not forwarded as null/partial rows, and
    * the drop is counted: the returned frame carries an observed metric
    * `graft_ingest_<topic>` with `frames_in` / `frames_dropped`, readable
    * per micro-batch from `StreamingQueryProgress.observedMetrics` (or a
    * `QueryExecutionListener` in batch). [[rejects]] is the dead-letter
    * side output for routing the dropped frames themselves.
    */
  private def parse(raw: DataFrame, schema: org.apache.spark.sql.types.StructType,
      topic: String): DataFrame = {
    val ok = okCol(schema)
    raw.select(col("value"), from_json(col("value").cast("string"), schema).as("j"))
      .observe(s"graft_ingest_$topic",
        count(lit(1)).as("frames_in"),
        sum(when(ok, 0L).otherwise(1L)).as("frames_dropped"))
      .filter(ok)
      .select(col("j.*"))
      .withColumn("ts_utc", tsUtc(col("ts")))
  }

  /** Dead-letter side output: the raw frames [[parse]] would drop, with a
    * `reason` ∈ malformed_json (unparseable or type-mismatched field, via
    * from_json's columnNameOfCorruptRecord) | missing_field | bad_ts. Route
    * to a quarantine sink when drops must be replayable, not just counted.
    */
  def rejects(raw: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    raw.select(col("value"),
        from_json(col("value").cast("string"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .filter(!okCol(schema))
      .withColumn("reason",
        when(col("j").isNull || col("j").getField("_corrupt").isNotNull, "malformed_json")
          .when(schema.fieldNames.map(f => col("j").getField(f).isNull).reduce(_ || _),
            "missing_field")
          .otherwise("bad_ts"))
      .select(col("value").cast("string").as("value"), col("reason"))
  }

  /** topic `prices` → (ts STRING, hub, price_mwh, ts_utc TIMESTAMP) */
  def prices(raw: DataFrame): DataFrame = parse(raw, Schemas.priceTick, "prices")

  /** topic `trades` */
  def trades(raw: DataFrame): DataFrame = parse(raw, Schemas.trade, "trades")

  /** topic `dayahead_prices` */
  def dayahead(raw: DataFrame): DataFrame = parse(raw, Schemas.daLmp, "dayahead_prices")

  /** topic `realtime_prices` */
  def realtime(raw: DataFrame): DataFrame = parse(raw, Schemas.rtLmp, "realtime_prices")

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
