package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch replay of the PnL/exposure dataflow (reference PnlAndExposureJob;
  * SURVEY.md §2.5, §3 E3).
  *
  * Scale design: a secondary sort, not a per-group collect. The input is
  * hash-partitioned by `hub` (one shuffle — the same boundary the reference
  * crosses at `keyBy`) and sorted *within* partitions by `(hub, ts, seq)`;
  * the fold then streams each partition once with O(state) memory, resetting
  * at hub boundaries. This holds at 100 TB: no group is ever materialized,
  * and partition count scales with the cluster, independent of key count.
  * Skewed/low-cardinality hub domains (the reference has 4 hubs —
  * producer.py:10) can be spread with `numPartitions` + AQE; the fold itself
  * is key-agnostic.
  */
object Pnl {

  /** `events` must have columns (seq, ts, hub, kind, account, side, mw,
    * price_mwh); see [[MarketEvent]]. Returns the `positions_pnl` stream.
    */
  def replay(events: Dataset[MarketEvent]): Dataset[PnlRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .repartition(col("hub"))
      .sortWithinPartitions(col("hub"), col("ts"), col("seq"))
      .mapPartitions { it =>
        var hub: String = null
        var st = HubState.empty
        it.flatMap { e =>
          if (e.hub != hub) { hub = e.hub; st = HubState.empty }
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
