package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The narrowest possible bridge into Spark's `private[sql]` surface —
  * the same package-nesting access route Delta takes (its code lives under
  * `org.apache.spark.sql.delta` for exactly this reason). Two entry points,
  * both needed ONLY by the `graftlog` streaming source
  * ([[graft.sources.GraftLogSource]]): a V1 `Source.getBatch` must return a
  * DataFrame whose leaf relation is flagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructors of such
  * frames are `private[sql]`. Nothing else in the engine goes through
  * here — keep it that way.
  */
object Internals {

  /** `Dataset.ofRows` — wrap an analyzed/resolvable [[LogicalPlan]] as a
    * DataFrame (the FileStreamSource.getBatch shape:
    * `LogicalRelation(relation, isStreaming = true)`).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** A batch [[org.apache.spark.sql.sources.BaseRelation]] wrapped as a
    * STREAMING-flagged leaf — exactly FileStreamSource.getBatch's
    * construction. This is what lets a V1 streaming source plan each
    * micro-batch as a native (codegen'd, filter-pushed) file scan.
    */
  def streamingRelationFrame(spark: SparkSession,
      relation: org.apache.spark.sql.sources.BaseRelation): DataFrame =
    ofRows(spark, org.apache.spark.sql.execution.datasources.LogicalRelation(
      relation, isStreaming = true))

  /** An EMPTY streaming-flagged frame of `schema` — what a streaming
    * source's getBatch returns for a window that delivered nothing (e.g.
    * every version in it was skipped under a rewrite policy).
    */
  def emptyStreamingFrame(spark: SparkSession, schema: StructType): DataFrame = {
    val s = spark.asInstanceOf[ClassicSession]
    s.internalCreateDataFrame(
      s.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }

  /** The inverse direction, for a streaming SINK: rebind a micro-batch's
    * DataFrame (whose leaves are streaming-flagged — no batch action can
    * plan it) onto its already-incremental RDD as a plain BATCH frame —
    * exactly `ForeachBatchSink.addBatch`'s construction. The rows stay
    * executor-side; only the plan is re-rooted.
    */
  def asBatchFrame(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
