package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch replay of the PnL/exposure dataflow (reference PnlAndExposureJob;
  * SURVEY.md §2.5, §3 E3).
  *
  * Scale design: a secondary sort, not a per-group collect. The input is
  * hash-partitioned and sorted *within* partitions by event time; the fold
  * then streams each partition once with O(state) memory, resetting at
  * group boundaries. No group is ever materialized.
  *
  * The reference's hub domain has 4 values (producer.py:10), so partitioning
  * by hub alone caps parallelism at 4 regardless of cluster size. The
  * partition key is therefore (hub, salt) with salt = hash(account) mod
  * `shards`: trades go to their account's shard; price ticks replicate to
  * every shard of the hub. Per-account arithmetic only depends on that
  * account's trades and the hub's price stream — both identical in every
  * shard — and each account lives in exactly one shard, so the union of
  * shard outputs is bit-identical to the unsharded fold (asserted in
  * PnlPropertySpec), while active parallelism becomes hubs × shards.
  * Price-tick replication costs shards× on the price rows only; sweep
  * emissions (the dominant volume — one row per account per tick) are not
  * replicated.
  */
object Pnl {

  /** `events` must have columns (seq, ts, hub, kind, account, side, mw,
    * price_mwh); see [[MarketEvent]]. Returns the `positions_pnl` stream.
    */
  def replay(events: Dataset[MarketEvent], shards: Int = 8): Dataset[PnlRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withColumn("salt", explode(
        when(col("kind") === "trade",
          array(pmod(xxhash64(col("account")), lit(shards)).cast("int")))
          .otherwise(sequence(lit(0), lit(shards - 1)))))
      .select(col("salt").as("_1"),
        struct(col("seq"), col("ts"), col("hub"), col("kind"), col("account"),
          col("side"), col("mw"), col("price_mwh")).as("_2"))
      .as[(Int, MarketEvent)]
      .repartition(col("_1"), col("_2.hub"))
      .sortWithinPartitions(col("_1"), col("_2.hub"), col("_2.ts"), col("_2.seq"))
      .mapPartitions { it =>
        var key: (Int, String) = null
        var st = HubState.empty
        it.flatMap { case (salt, e) =>
          if (key == null || salt != key._1 || e.hub != key._2) {
            key = (salt, e.hub); st = HubState.empty
          }
          val (st2, rows) = PnlKernel.step(st, e)
          st = st2
          rows
        }
      }
  }

  /** Exposure projection chained on the replay output (reference
    * PnlAndExposureJob.java:65-69 — one upstream feeding two sinks).
    */
  def exposure(pnl: Dataset[PnlRow]): Dataset[ExposureRow] = {
    val spark = pnl.sparkSession
    import spark.implicits._
    pnl.map(PnlKernel.exposure)
  }

  /** Map the fixture `events` table onto the trade/price tagged union so the
    * fold can be exercised (and hash-checked) on driver testdata. The mapping
    * is frozen — the DuckDB oracle in SparkEntry.oracleSql encodes the same
    * one:
    *   hub = 'H' || (user_id % 4);  account = 'ACC' || (user_id % 3)
    *   kind = trade iff event_type = 'purchase'
    *   side = BUY if event_id % 2 = 0 else SELL;  mw = [5,10,25,50][event_id % 4]
    *   price_mwh = value;  seq = event_id;  order = (ts, seq) per hub
    */
  def eventsAsMarket(events: DataFrame): Dataset[MarketEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("event_id").as("seq"),
      col("ts"),
      concat(lit("H"), pmod(col("user_id"), lit(4))).as("hub"),
      when(col("event_type") === "purchase", lit("trade")).otherwise(lit("price")).as("kind"),
      when(col("event_type") === "purchase",
        concat(lit("ACC"), pmod(col("user_id"), lit(3)))).otherwise(lit("")).as("account"),
      when(col("event_type") === "purchase",
        when(pmod(col("event_id"), lit(2)) === 0, lit("BUY")).otherwise(lit("SELL")))
        .otherwise(lit("")).as("side"),
      when(col("event_type") === "purchase",
        element_at(array(lit(5), lit(10), lit(25), lit(50)),
          (pmod(col("event_id"), lit(4)) + 1).cast("int")))
        .otherwise(lit(0)).cast("int").as("mw"),
      col("value").as("price_mwh")
    ).as[MarketEvent]
  }
}
