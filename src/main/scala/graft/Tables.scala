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

  /** The fixture `events` table carries TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as nanos-since-
    * epoch longs and floor-truncate to microsecond TimestampType — the same
    * truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies, so oracle
    * comparisons see identical instants. `div` (integral division) keeps the
    * arithmetic in Long: ns magnitudes (~1.7e18) exceed Double's exact range.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register all fixture tables as temp views for `spark.sql` queries. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val p = new java.io.File(s"$sfDir/$n.parquet")
      if (p.exists()) load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
