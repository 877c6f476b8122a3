package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every query entry in [[SparkEntry.queries]] receives `(spark, sfDir)` and
  * resolves tables through here so the scan always carries the pruned schema
  * and pushed filters of the calling plan (plain `spark.read.parquet` —
  * Catalyst handles pruning/pushdown; nothing is cached globally).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Schema-adaptive `events` loader. The fixture's `ts` physical type has
    * drifted across driver regenerations — TIMESTAMP(NANOS) originally, then
    * `timestamp[us]` (2026-08-13) — so the decode is chosen from the loaded
    * schema, not hard-coded:
    *   - `LongType` (nanosAsLong read of a NANOS column): floor-truncate to
    *     microseconds via `ts div 1000` — the same truncation DuckDB's
    *     `CAST(ts AS TIMESTAMP)` applies, so oracle comparisons see identical
    *     instants. `div` keeps the arithmetic in Long: ns magnitudes (~1.7e18)
    *     exceed Double's exact range.
    *   - `TIMESTAMP_NTZ` (micros, isAdjustedToUTC=false): cast to session-TZ
    *     TimestampType. Every session in this repo pins UTC, so the cast is
    *     instant-preserving and matches DuckDB's naive read.
    *   - `TimestampType`: already what downstream expects; pass through.
    * The `nanosAsLong` conf stays set so genuine nanos files keep loading.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Register all fixture tables as temp views for `spark.sql` queries. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val p = new java.io.File(s"$sfDir/$n.parquet")
      if (p.exists()) load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
