package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.TableLog

/** Tail a [[graft.sources.TableLog]] table's COMMIT STREAM as micro-batches
  * — the consumer half of the in-engine loop
  * ingest → curate → commit → consume: an upstream job commits batches
  * through [[TableLog.appendStream]] (exactly-once epochs), and a
  * downstream training-data job processes ONLY what each new version added,
  * in commit order, without ever rescanning the base table.
  *
  * Offsets are VERSIONS: a consumer's position is the last version it
  * processed — restartable by persisting one long, and each version's rows
  * form exactly one micro-batch, so batch boundaries coincide with the
  * log's atomic commit points (a half-consumed version cannot exist).
  * Reading a version's delta is [[TableLog.readAppended]] — O(new data)
  * file reads planned from O(commits) manifest deltas; the head probe is
  * the `_last_checkpoint` pointer path, so an idle poll costs a couple of
  * metadata existence checks, never a listing.
  *
  * The streaming integration is `spark.readStream.format("graftlog")` —
  * [[graft.sources.GraftLogSource]], the versions-as-offsets micro-batch
  * source whose `latestOffset` is [[TableLog.headVersion]] and whose
  * `getBatch(start, end)` plans [[TableLog.fileChanges]]' added files as
  * one native parquet relation (the Delta-source shape; rows never touch
  * the driver). [[consumeVersions]] drives a stateful operator through it.
  * The [[Tail]] below is the same offset logic as a pull-style API — a
  * positioned poll() for consumers that want frames, not a query.
  */
object LogTail {

  /** What [[Tail.poll]] does with a version that REWROTE files
    * (compact/delete/merge/overwrite) — not an append, so "what did it
    * add" is not a file-level question. The three stances every log
    * streaming source ends up offering (Delta's fail /
    * ignoreDeletes-style skip / ignoreChanges-style redelivery):
    *  - [[Fail]] (default): throw the typed [[NonAppendVersionException]]
    *    WITHOUT advancing — nothing silently dropped; the consumer
    *    decides (full reprocess from the snapshot, or a
    *    [[TableLog.readChanges]] over the window).
    *  - [[Skip]]: advance past the version delivering NOTHING — for
    *    retention/maintenance-only rewrites (vacuum-adjacent compaction,
    *    forget-deletes). Rows a rewrite commit ADDED (e.g. a merge's new
    *    keys) are NOT delivered — this is weaker than Delta's
    *    ignoreChanges, stated plainly.
    *  - [[DeliverAdds]]: deliver the rows of the version's added files —
    *    Delta's ignoreChanges semantics: a merge's inserts arrive, at the
    *    cost of AT-LEAST-ONCE redelivery of every row the rewrite
    *    carried along (a compaction redelivers everything it compacted);
    *    the consumer must be idempotent/deduping.
    */
  sealed trait RewritePolicy
  case object Fail extends RewritePolicy
  case object Skip extends RewritePolicy
  case object DeliverAdds extends RewritePolicy

  /** A positioned consumer of one logged table. `position` is the last
    * version already consumed (0 = from the beginning). See
    * [[RewritePolicy]] for non-append versions.
    */
  final class Tail(spark: SparkSession, root: String, startAfter: Long,
      onRewrite: RewritePolicy = Fail) {
    private var pos = startAfter

    def position: Long = pos

    /** New committed versions since the last poll, each as (version, its
      * delivered rows) in commit order; advances the position. Empty when
      * idle. Cost when idle: one pointer read + one existence probe; per
      * version: ONE manifest delta read + one snapshot-state read for the
      * schema at that version.
      */
    def poll(): Seq[(Long, DataFrame)] = {
      val head = TableLog.headVersion(spark, root).getOrElse(pos)
      var out = Vector.empty[(Long, DataFrame)]
      var v = pos + 1
      var stopped = false
      while (v <= head && !stopped) {
        val (adds, removes) = TableLog.fileChanges(spark, root, v - 1, v)
        def deliver(): Unit = if (adds.nonEmpty) {
          val st = TableLog.state(spark, root, Some(v))
          out :+= (v -> TableLog.readEntrySet(spark, root, adds,
            st.schemaJson, colmap = TableLog.colmapOf(st)))
        }
        if (removes.isEmpty) { deliver(); pos = v }
        else onRewrite match {
          case Skip => pos = v
          case DeliverAdds => deliver(); pos = v
          case Fail if out.isEmpty =>
            // the rewrite is the first thing this poll would deliver:
            // surface it, position unchanged (nothing dropped)
            throw new NonAppendVersionException(
              s"version $v of $root rewrote files (compaction/delete/" +
                "merge); an append tail cannot express it as new rows — " +
                "reprocess from the snapshot, use readChanges, or tail " +
                "with onRewrite = Skip/DeliverAdds")
          case Fail =>
            // appends were collected before the rewrite: deliver them
            // now; the NEXT poll starts exactly at the rewrite and throws
            stopped = true
        }
        if (!stopped) v += 1
      }
      out
    }
  }

  /** [[Tail.poll]] met a version that rewrote files. `position` stays
    * BEFORE that version — nothing was silently dropped.
    */
  final class NonAppendVersionException(msg: String)
    extends IllegalStateException(msg)

  def tail(spark: SparkSession, root: String, startAfter: Long = 0L,
      onRewrite: RewritePolicy = Fail): Tail =
    new Tail(spark, root, startAfter, onRewrite)

  /** Drive a REAL streaming operator over the table's committed versions
    * `(startAfter, head]`: each version's appended rows become one ordered
    * micro-batch of `op`'s input stream (state carries across versions),
    * and the materialized output is returned. The input is the `graftlog`
    * streaming source ([[graft.sources.GraftLogSource]]) paced at ONE
    * VERSION PER MICRO-BATCH, so batch boundaries coincide with the log's
    * atomic commit points and each batch plans a native parquet scan of
    * exactly that version's appended files — rows never touch the driver
    * (the round-14 MemoryStream bridge is retired). `decode` maps the
    * streaming change frame to the operator's typed input; it must be a
    * streaming-legal transform (no sort — a stateful op that needs
    * within-batch order sorts its group iterator, as exactKeepStream does).
    */
  def consumeVersions[I: Encoder, O: Encoder](spark: SparkSession,
      root: String, startAfter: Long, decode: DataFrame => Dataset[I],
      statePartitions: Int = 8, mode: OutputMode = OutputMode.Append())(
      op: Dataset[I] => Dataset[O]): DataFrame = {
    val src = spark.readStream.format("graftlog")
      .option("startingVersion", startAfter.toString)
      .load(root)
    MemoryReplay.drain(spark, op(decode(src)), statePartitions, mode)
  }
}
