package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** The reference's ingest jobs as Structured Streaming pipelines: raw JSON
  * topic → parsed frame → table sink.
  *
  *   - prices/trades (IngestPricesAndTradesJob.java:23-73)
  *   - dayahead/realtime LMPs (IngestDayAheadAndRealTimeJob.java:23-62)
  *   - forecasts (ForecastsJob.java:48-56)
  *
  * Sources and sinks are configuration, not code paths (SURVEY.md §7): a
  * [[SourceConfig]] picks kafka / file-directory / an injected stream (tests
  * feed MemoryStream), and a [[SinkConfig]] picks parquet or jdbc — the
  * reference's Postgres tables (postgres/init.sql:12-94) map 1:1 onto the
  * written tables, with the parsed `ts` as TIMESTAMPTZ-equivalent UTC
  * timestamps plus the raw wire string kept as `ts_raw` for byte-faithful
  * replay.
  *
  * Scale notes: ingestion is embarrassingly parallel (a map over the topic
  * partitions — no shuffle anywhere in these plans); sink files partition by
  * the micro-batch naturally. Downstream analytic reads should re-bucket by
  * (hub) as needed; the writers stay append-only exactly like the
  * reference's INSERT-only JdbcSink.
  */
object IngestJobs {

  /** Where raw frames come from. `format` ∈ kafka | file.
    *   - kafka: `path` = topic, `broker` = bootstrap servers
    *   - file: `path` = directory of newline-delimited JSON frames
    */
  final case class SourceConfig(format: String, path: String, broker: String = "")

  /** Where tables land. `format` ∈ parquet | jdbc.
    *   - parquet: `path` = warehouse dir (table = subdir)
    *   - jdbc: `url`/`user`/`password` as the reference's JdbcSink options
    */
  final case class SinkConfig(format: String, path: String = "",
      url: String = "", user: String = "", password: String = "")

  /** The exact option map `rawStream` hands the kafka source — split out so
    * the wiring is testable without a broker or the connector jar (neither
    * exists in the sandbox): IngestJobsSpec pins every key/value against the
    * reference's consumer config (IngestPricesAndTradesJob.java:23-29), so a
    * typo'd option key fails the suite even though a kafka plan can never be
    * built here.
    */
  def kafkaSourceOptions(src: SourceConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> src.broker,
    "subscribe" -> src.path,
    // reference consumes from earliest (OffsetsInitializer.earliest())
    "startingOffsets" -> "earliest")

  /** Raw frames as a streaming DataFrame with a string `value` column —
    * exactly what `Ingest.*` parsers expect.
    */
  def rawStream(spark: SparkSession, src: SourceConfig): DataFrame = src.format match {
    case "kafka" =>
      spark.readStream.format("kafka")
        .options(kafkaSourceOptions(src))
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    case "file" =>
      spark.readStream.text(src.path).select(col("value"))
    case other =>
      throw new IllegalArgumentException(s"unknown source format: $other")
  }

  /** Append a parsed frame stream to `table` through the configured sink.
    * One checkpointed query per table, like one Flink sink operator each.
    */
  def writeTable(parsed: DataFrame, table: String, sink: SinkConfig,
      checkpointDir: String): StreamingQuery =
    parsed.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$checkpointDir/$table")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.format match {
          case "parquet" =>
            batch.write.mode("append").parquet(s"${sink.path}/$table")
          case "jdbc" =>
            batch.write.mode("append").format("jdbc")
              .option("url", sink.url)
              .option("dbtable", table)
              .option("user", sink.user)
              .option("password", sink.password)
              .save()
          case other =>
            throw new IllegalArgumentException(s"unknown sink format: $other")
        }
        ()
      }
      .start()

  /** One micro-batch into its own `batch_id=<id>` partition via dynamic
    * partition overwrite: a batch replayed after a crash OVERWRITES its own
    * partition instead of appending duplicates. Idempotent by construction —
    * calling this twice with the same id is a no-op.
    */
  def appendBatchIdempotent(batch: DataFrame, id: Long, tablePath: String): Unit =
    batch.withColumn("batch_id", lit(id))
      .write.mode("overwrite").partitionBy("batch_id")
      // per-write option, NOT session conf: a session-wide "dynamic" would
      // silently turn later overwrite+partitionBy writes into partial ones
      .option("partitionOverwriteMode", "dynamic")
      .parquet(tablePath)

  /** [[writeTable]] upgraded from the reference's at-least-once JDBC
    * semantics (SURVEY §2.6: non-transactional sink + checkpoint ⇒ possible
    * duplicates on recovery) to effective exactly-once for the parquet
    * sink: Structured Streaming replays a failed epoch with the SAME batch
    * id, and [[appendBatchIdempotent]] makes that replay overwrite itself.
    */
  def writeTableIdempotent(parsed: DataFrame, table: String, warehouse: String,
      checkpointDir: String): StreamingQuery =
    parsed.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$checkpointDir/$table")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatchIdempotent(batch, id, s"$warehouse/$table")
      }
      .start()

  /** One micro-batch into a JDBC table EXACTLY ONCE — the transactional
    * upgrade of the reference's at-least-once JDBC sink (a non-
    * transactional batch insert + a separately-committed checkpoint can
    * replay an epoch into duplicate rows on recovery;
    * IngestPricesAndTradesJob.java's JdbcSink has the same window). The
    * standard staging + ledger shape:
    *
    *   1. executor-side: write the batch to `<table>_stage` with
    *      mode=overwrite — re-running the same epoch overwrites the same
    *      staging rows, so this step is idempotent on its own;
    *   2. driver-side, ONE transaction: skip if the `graft_epochs` ledger
    *      already holds (table, batchId) — the committed-epoch replay —
    *      else `INSERT INTO table SELECT * FROM stage` + ledger insert,
    *      COMMIT.
    *
    * Crash anywhere before the commit ⇒ the replayed epoch redoes both
    * steps against the same staging content; crash after ⇒ the ledger row
    * makes the replay a no-op. The visible table therefore holds each
    * epoch exactly once, for any interleaving of failures — the same
    * argument as [[appendBatchIdempotent]]'s partition overwrite, moved
    * into the database's transaction where a JDBC sink needs it.
    *
    * Scale note: the driver-side step is two statements per MICRO-BATCH
    * (not per row); the bulk insert runs inside the database from the
    * staged rows. Works on any JDBC engine with transactions + INSERT
    * SELECT (Derby in-spec; Postgres in the reference deploy).
    */
  def jdbcBatchExactlyOnce(batch: DataFrame, batchId: Long, table: String,
      sink: SinkConfig): Unit = {
    // the table name is interpolated UNQUOTED into raw SQL below (so its
    // identifier folding matches the unquoted `dbtable` Spark's JDBC writer
    // uses for the zero-row create) — restrict it to a plain identifier
    // (optionally schema-qualified: one dot), or a caller-derived name is
    // an injection surface and a mixed-case / reserved-word name silently
    // folds to a different table
    require(table.matches("[A-Za-z][A-Za-z0-9_]{0,100}(\\.[A-Za-z][A-Za-z0-9_]{0,100})?"),
      s"jdbc table name must be a plain (optionally schema-qualified) identifier: $table")
    val stage = s"${table}_stage"
    def withConn[A](f: java.sql.Connection => A): A = {
      val c = java.sql.DriverManager.getConnection(sink.url, sink.user, sink.password)
      try f(c) finally c.close()
    }
    // ledger + target existence: create-if-missing (Derby has no IF NOT
    // EXISTS — swallow the already-exists SQLState X0Y32)
    def ensure(c: java.sql.Connection, ddl: String): Unit = {
      val st = c.createStatement()
      try st.executeUpdate(ddl)
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      finally st.close()
    }
    withConn { c =>
      ensure(c, "CREATE TABLE graft_epochs (tbl VARCHAR(128) NOT NULL, " +
        "batch_id BIGINT NOT NULL, PRIMARY KEY (tbl, batch_id))")
    }
    val alreadyCommitted = withConn { c =>
      val ps = c.prepareStatement(
        "SELECT 1 FROM graft_epochs WHERE tbl = ? AND batch_id = ?")
      try {
        ps.setString(1, table); ps.setLong(2, batchId)
        val rs = ps.executeQuery(); val hit = rs.next(); rs.close(); hit
      } finally ps.close()
    }
    if (!alreadyCommitted) {
      // target must exist before INSERT SELECT: let Spark create it from
      // the schema with a zero-row append (no-op when it already exists)
      batch.limit(0).write.mode("append").format("jdbc")
        .option("url", sink.url).option("dbtable", table)
        .option("user", sink.user).option("password", sink.password).save()
      // step 1 — idempotent staging write (executor-side bulk path)
      batch.write.mode("overwrite").format("jdbc")
        .option("url", sink.url).option("dbtable", stage)
        .option("user", sink.user).option("password", sink.password).save()
      // step 2 — atomic move + ledger record
      withConn { c =>
        c.setAutoCommit(false)
        try {
          val cols = batch.columns.map(c0 => s""""$c0"""").mkString(", ")
          val mv = c.createStatement()
          try mv.executeUpdate(
            s"""INSERT INTO $table ($cols) SELECT $cols FROM $stage""")
          finally mv.close()
          val led = c.prepareStatement(
            "INSERT INTO graft_epochs (tbl, batch_id) VALUES (?, ?)")
          try { led.setString(1, table); led.setLong(2, batchId); led.executeUpdate() }
          finally led.close()
          c.commit()
        } catch { case e: Throwable => c.rollback(); throw e }
      }
    }
  }

  /** [[writeTable]]'s jdbc branch upgraded to exactly-once via
    * [[jdbcBatchExactlyOnce]] — epoch replays after a crash become no-ops
    * instead of duplicate inserts.
    */
  def writeTableJdbcExactlyOnce(parsed: DataFrame, table: String,
      sink: SinkConfig, checkpointDir: String): StreamingQuery =
    parsed.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$checkpointDir/$table")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        jdbcBatchExactlyOnce(batch, id, table, sink)
      }
      .start()

  /** Parsed topic frame → the reference table's column set: UTC timestamp
    * first (as the DDL orders it), raw wire timestamp kept as `ts_raw`.
    */
  private def tableShape(parsed: DataFrame): DataFrame =
    parsed
      .withColumnRenamed("ts", "ts_raw")
      .withColumn("ts", col("ts_utc"))
      .drop("ts_utc")

  /** IngestPricesAndTradesJob: two topic streams → `prices` + `trades`. */
  def ingestPricesAndTrades(pricesRaw: DataFrame, tradesRaw: DataFrame,
      sink: SinkConfig, checkpointDir: String): Seq[StreamingQuery] = Seq(
    writeTable(tableShape(Ingest.prices(pricesRaw))
      .select(col("ts"), col("hub"), col("price_mwh"), col("ts_raw")),
      "prices", sink, checkpointDir),
    writeTable(tableShape(Ingest.trades(tradesRaw))
      .select(col("trade_id"), col("ts"), col("account"), col("hub"),
        col("side"), col("mw"), col("price_mwh"), col("ts_raw")),
      "trades", sink, checkpointDir))

  /** IngestDayAheadAndRealTimeJob: two topic streams → `dayahead_prices` +
    * `realtime_prices`.
    */
  def ingestDaRt(daRaw: DataFrame, rtRaw: DataFrame,
      sink: SinkConfig, checkpointDir: String): Seq[StreamingQuery] = Seq(
    writeTable(tableShape(Ingest.dayahead(daRaw))
      .select(col("ts"), col("hub"), col("lmp_da"), col("energy_da"),
        col("congestion_da"), col("loss_da"), col("ts_raw")),
      "dayahead_prices", sink, checkpointDir),
    writeTable(tableShape(Ingest.realtime(rtRaw))
      .select(col("ts"), col("hub"), col("lmp_rt"), col("energy_rt"),
        col("congestion_rt"), col("loss_rt"), col("ts_raw")),
      "realtime_prices", sink, checkpointDir))

  /** ForecastsJob sink: the SMA5/SMA20 stream → `forecasts` table
    * (init.sql:43-49 columns, plus seq/price_mwh provenance).
    */
  def writeForecasts(forecasts: org.apache.spark.sql.Dataset[ForecastRow],
      sink: SinkConfig, checkpointDir: String): StreamingQuery =
    writeTable(forecasts.toDF()
      .select(col("ts"), col("hub"), col("sma5"), col("sma20"),
        col("forecast_next"), col("seq"), col("price_mwh")),
      "forecasts", sink, checkpointDir)
}
