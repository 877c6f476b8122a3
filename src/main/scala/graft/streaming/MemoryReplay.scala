package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drive a streaming operator to completion over a frozen tape and hand back
  * the materialized sink — the harness that lets the driver's DuckDB oracle
  * gate the STREAMING execution path (SparkEntry q55/q56), not just the batch
  * plans. The reference runs everything as unbounded streams
  * (PnlAndExposureJob.java:29-78, ForecastsJob.java:28-58); replaying its
  * tape through the real `flatMapGroupsWithState` operators in ordered
  * micro-batches proves streaming ≡ batch inside the round's official gate
  * instead of only in ScalaTest.
  *
  * The tape is a driver-side Seq because that is what `MemoryStream` (the
  * only deterministic multi-batch source) accepts — a test-harness cost, not
  * a scale path: production ingestion streams from Kafka/files
  * ([[IngestJobs.rawStream]]) and never collects. Events must arrive sorted
  * by the pinned `(ts, seq)` order; chunk boundaries then preserve per-key
  * arrival order across micro-batches, so state carry-over — not
  * within-batch sorting — is what the replay exercises.
  */
object MemoryReplay {

  /** Monotonic suffix for memory-sink table names: Bench reruns each query
    * `reps` times in one session, and two runs registering the same memory
    * table would race on the catalog.
    */
  private val runId = new AtomicInteger(0)

  /** State-store footprint of the LAST completed replay, captured from the
    * final `StreamingQueryProgress.stateOperators` before `stop()`:
    * (operatorName, numRowsTotal, memoryUsedBytes) per stateful operator.
    * This is the 100 TB audit surface for the streaming families — which
    * state grows with DISTINCT CONTENT (dedup fingerprints, band indexes)
    * vs stays key-bounded (per-hub folds) — recorded per family in
    * BASELINE.md by [[graft.tools.StreamStateProbe]]. Volatile single-slot:
    * replays are sequential within a session (Verify/Bench/probe all run
    * queries one at a time).
    */
  @volatile var lastStateStats: Seq[(String, Long, Long)] = Nil

  private def captureState(query: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    lastStateStats = Option(query.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq)
      .map(so => (so.operatorName, so.numRowsTotal, so.memoryUsedBytes))

  /** Replay `tape` through `f` in `nBatches` ordered micro-batches; returns
    * the complete output as a batch DataFrame. `mode` defaults to Append;
    * Update-mode operators (mapGroupsWithState) pass OutputMode.Update() —
    * the memory sink then accumulates every batch's emitted updates, so the
    * caller sees the full update stream, not just finals.
    */
  def replay[I: Encoder, O: Encoder](spark: SparkSession, tape: Seq[I],
      nBatches: Int, statePartitions: Int = 8,
      mode: OutputMode = OutputMode.Append(),
      stateStoreProvider: Option[String] = None)(f: Dataset[I] => Dataset[O]): DataFrame = {
    val chunk = math.max(1, (tape.size + nBatches - 1) / nBatches)
    replayChunks(spark, tape.grouped(chunk).toSeq, statePartitions, mode,
      stateStoreProvider)(f)
  }

  /** [[replay]] with CALLER-DEFINED micro-batch boundaries: each element of
    * `chunks` becomes exactly one batch, in order. This is the seam the
    * commit-log tailer ([[graft.streaming.LogTail]]) uses — one batch per
    * committed table version, so batch boundaries mean something (a
    * version's rows never split across batches and state carries over at
    * exactly the commit points).
    */
  def replayChunks[I: Encoder, O: Encoder](spark: SparkSession,
      chunks: Seq[Seq[I]], statePartitions: Int = 8,
      mode: OutputMode = OutputMode.Append(),
      stateStoreProvider: Option[String] = None)(f: Dataset[I] => Dataset[O]): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[I]
    val name = s"graft_replay_${runId.incrementAndGet()}"
    // a stateful query pins its state-store partition count from
    // shuffle.partitions at FIRST start; a replay's micro-batches are small,
    // so the session default (sized for batch scans) only multiplies
    // state-store file overhead per batch. Set it for the start() call and
    // restore immediately — never leaked across the session (the round-2
    // ADVICE lesson on session-wide conf mutation). Same discipline for the
    // state-store provider override (heap default vs RocksDB — the 100 TB
    // deploy knob: at rate×TTL ≈ millions of live buckets the heap
    // provider is the first thing to fall over; the provider choice must
    // not change output, which StreamStateProbe's A/B row asserts).
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevProv = spark.conf.getOption(provKey)
    val query =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
        stateStoreProvider.foreach(spark.conf.set(provKey, _))
        f(input.toDS()).writeStream
          .format("memory")
          .queryName(name)
          .outputMode(mode)
          .start()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if (stateStoreProvider.isDefined)
          prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
      }
    try {
      // processAllAvailable per chunk forces a micro-batch boundary, so the
      // operator's state genuinely persists across batches (one addData of
      // the whole tape would collapse the replay into a single batch and
      // prove nothing about state carry-over)
      chunks.filter(_.nonEmpty).foreach { c =>
        input.addData(c)
        query.processAllAvailable()
      }
      captureState(query)
    } finally query.stop()
    detach(spark, name)
  }

  /** Materialize the memory sink's rows off the catalog, then drop its temp
    * view: every replay otherwise leaves a `graft_replay_N` table pinning its
    * full output in driver memory for the life of the session — Bench at
    * reps=3 runs ~21 replays per session. localCheckpoint copies the rows to
    * executor block storage (freed by the ContextCleaner when the returned
    * frame is collected), so dropping the view loses nothing.
    */
  private def detach(spark: SparkSession, name: String): DataFrame = {
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** Run an ALREADY-CONSTRUCTED streaming Dataset to completion against the
    * memory sink and hand back the materialized output — the runner half of
    * [[replayChunks]] without the MemoryStream tape: the input here is a
    * real streaming SOURCE (e.g. `spark.readStream.format("graftlog")`),
    * so rows flow executor-side and the driver never holds a batch.
    * `processAllAvailable` drives micro-batches until the source reports
    * no new data — with a self-pacing source (graftlog's one version per
    * batch) that preserves meaningful batch boundaries.
    */
  def drain[O](spark: SparkSession, out: Dataset[O],
      statePartitions: Int = 8,
      mode: OutputMode = OutputMode.Append()): DataFrame = {
    val name = s"graft_replay_${runId.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val query =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
        out.writeStream.format("memory").queryName(name).outputMode(mode).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try { query.processAllAvailable(); captureState(query) }
    finally query.stop()
    detach(spark, name)
  }

  /** Stage `frame` as a LOGGED-TABLE TAPE: ONE data-write job lays the
    * rows down hive-partitioned into `nBatches` contiguous `orderCol`
    * segments, then each tape position becomes a METADATA-ONLY commit
    * appending its segment's files — N replayable versions for the price
    * of one write, no driver-side rows. Returns the table root; delete it
    * when done ([[dropTape]]).
    */
  def writeTape(spark: SparkSession, frame: DataFrame, orderCol: String,
      nBatches: Int): String = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, ntile}
    import graft.sources.TableLog
    val root = java.nio.file.Files.createTempDirectory("graft_tape_")
      .toString
    val withB = frame.withColumn("tape_b",
      ntile(nBatches).over(Window.orderBy(col(orderCol))))
    val staged = TableLog.writeDataPartitioned(withB, root, Seq("tape_b"))
    val schemaJson = withB.schema.json
    val segs = staged.groupBy(_.partition("tape_b").toLong).toSeq.sortBy(_._1)
    var acc = Vector.empty[TableLog.Entry]
    if (segs.isEmpty)
      TableLog.commit(spark, root, Nil,
        meta = Seq("op:append", "schema:" + schemaJson, "partcols:tape_b"))
    else segs.foreach { case (_, es) =>
      acc = acc ++ es
      TableLog.commit(spark, root, acc,
        meta = Seq("op:append", "schema:" + schemaJson, "partcols:tape_b"))
    }
    root
  }

  /** Replay a [[writeTape]] table through `f` — the REAL
    * `format("graftlog")` streaming source delivers one version per
    * micro-batch (the q219 pattern), so batch boundaries coincide with
    * commit points and rows flow executor-to-executor, never through the
    * driver. A multi-stage harness writes the tape ONCE and calls this
    * per stage, narrowing the stream inside `f` (e.g. a broadcast id-join
    * against the previous stage's keepers) instead of re-writing a
    * filtered tape per stage.
    */
  def drainTape[O](spark: SparkSession, root: String,
      statePartitions: Int = 8, mode: OutputMode = OutputMode.Append())(
      f: DataFrame => Dataset[O]): DataFrame =
    drain(spark,
      f(spark.readStream.format("graftlog").load(root).drop("tape_b")),
      statePartitions, mode)

  /** Delete a scratch tape table. */
  def dropTape(root: String): Unit = {
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    rm(new java.io.File(root))
  }

  /** [[replay]] with the tape in a LOGGED TABLE instead of driver memory
    * (round 16 — no driver-side tape build): [[writeTape]] then
    * [[drainTape]], scratch table deleted after the drain.
    */
  def replayLogged[O](spark: SparkSession, frame: DataFrame,
      orderCol: String, nBatches: Int, statePartitions: Int = 8,
      mode: OutputMode = OutputMode.Append())(
      f: DataFrame => Dataset[O]): DataFrame = {
    val root = writeTape(spark, frame, orderCol, nBatches)
    try drainTape(spark, root, statePartitions, mode)(f)
    finally dropTape(root)
  }

  /** Two-stream replay for stream-stream operators (interval join): both
    * tapes advance in index-lockstep chunks — for time-sorted tapes of the
    * same span that keeps the two event-time fronts roughly aligned, and
    * the global watermark (the MIN across sources) trails the slower side,
    * so join state is never evicted ahead of a still-arriving match.
    */
  def replay2[L: Encoder, R: Encoder, O: Encoder](spark: SparkSession,
      tapeL: Seq[L], tapeR: Seq[R], nBatches: Int, statePartitions: Int = 8)(
      f: (Dataset[L], Dataset[R]) => Dataset[O]): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inL = MemoryStream[L]
    val inR = MemoryStream[R]
    val name = s"graft_replay_${runId.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val query =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
        f(inL.toDS(), inR.toDS()).writeStream
          .format("memory")
          .queryName(name)
          .outputMode(OutputMode.Append())
          .start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try {
      val chunkL = math.max(1, (tapeL.size + nBatches - 1) / nBatches)
      val chunkR = math.max(1, (tapeR.size + nBatches - 1) / nBatches)
      tapeL.grouped(chunkL).toSeq.zipAll(
          tapeR.grouped(chunkR).toSeq, Seq.empty[L], Seq.empty[R])
        .foreach { case (cl, cr) =>
          if (cl.nonEmpty) inL.addData(cl)
          if (cr.nonEmpty) inR.addData(cr)
          query.processAllAvailable()
        }
      captureState(query)
    } finally query.stop()
    detach(spark, name)
  }
}
