package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.Internals
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The MANIFEST-FED Spark relation over a [[TableLog]] snapshot — the
  * production integration point that retires the two documented seams of
  * the pre-round-15 read path:
  *
  *  - a partitioned snapshot used to plan ONE UNION BRANCH PER DISTINCT
  *    PARTITION VALUE (each branch a separate parquet relation with the
  *    value attached as a literal). Sound, but a 10k-partition table built
  *    a 10k-way union plan. Now every snapshot — flat or partitioned — is
  *    ONE [[HadoopFsRelation]] whose [[GraftLogFileIndex]] is fed straight
  *    from manifest entries: partition values become real partition
  *    columns of the scan (typed from the recorded schema), so Catalyst's
  *    own partition pruning, filter pushdown and whole-stage codegen all
  *    engage exactly as on a native parquet table.
  *  - file listing is GONE from the read path entirely: the index answers
  *    `listFiles` from the manifest (zero filesystem calls — sizes ride in
  *    the entries), which at 100 TB is the difference between planning a
  *    scan in manifest-read time and stat-ing a million files.
  *
  * Both pruning layers run INSIDE `listFiles`, invisible to the user:
  * partition filters are evaluated against the typed partition row
  * (Catalyst `Predicate` over the manifest values — no directory walked),
  * and data filters are turned into per-column bounds by the SAME
  * conservative walker the delete triage uses ([[TableLog.predicateBounds]])
  * and matched against the manifest's per-file min/max stats. A plain
  * `df.filter(col("n_chars") > 150)` therefore skips whole files at the
  * PLANNING layer — [[TableLog.readPruned]]'s explicit API became implicit.
  *
  * Registered as `format("graftlog")` ([[GraftLogSourceProvider]]): batch
  * reads via `spark.read.format("graftlog").option("version", v).load(root)`,
  * incremental consumption via `spark.readStream.format("graftlog")` —
  * [[GraftLogSource]], the versions-as-offsets micro-batch source that
  * retired the driver-side MemoryStream bridge.
  */
/** The DELETION-VECTOR literal triple an inline-eligible snapshot ships to
  * its scan filter: sorted file keys, per-file run-pair offsets, flat
  * [start, endExclusive) row-index runs — [[graft.functions.DvLive]]'s
  * argument shape.
  */
private[graft] final case class DvSpec(files: Array[String],
  offsets: Array[Long], runs: Array[Long])

private[graft] class GraftLogFileIndex(
    spark: SparkSession, val root: String, entries: Seq[TableLog.Entry],
    dataSchema: StructType, override val partitionSchema: StructType,
    val pendingDv: Option[DvSpec] = None)
  extends FileIndex {

  /** The same index with the DV marker CONSUMED — what
    * [[GraftLogDvRewrite]] substitutes once it has injected the run filter
    * (the marker must not survive or the rewrite would never reach a fixed
    * point).
    */
  def withoutDv: GraftLogFileIndex =
    new GraftLogFileIndex(spark, root, entries, dataSchema, partitionSchema)

  private val hadoopConf = spark.sessionState.newHadoopConf()
  private val rootPath = {
    val p = new Path(root)
    p.getFileSystem(hadoopConf).makeQualified(p)
  }
  private lazy val fs = rootPath.getFileSystem(hadoopConf)

  override def rootPaths: Seq[Path] = Seq(rootPath)

  /** One group per distinct partition value: the typed partition row plus
    * the group's (entry, status) pairs. Built ONCE from the manifest —
    * statuses come from manifest bytes (the only filesystem touch is a
    * one-time size lookup for legacy entries missing bytes), so repeated
    * listFiles calls across plannings never stat a file again.
    */
  private lazy val groups
      : Seq[(InternalRow, Seq[(TableLog.Entry, FileStatus)])] =
    entries.groupBy(_.partition).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (pvals, es) =>
        val row = InternalRow.fromSeq(
          partitionSchema.fields.toSeq.map(f => typedValue(pvals(f.name), f.dataType)))
        (row, es.map(e => (e, status(e))))
      }

  private def typedValue(raw: String, dt: DataType): Any =
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else {
      val s = UTF8String.fromString(TableLog.unescapePath(raw))
      if (dt == StringType) s
      else Cast(Literal(s, StringType), dt,
        Option(spark.sessionState.conf.sessionLocalTimeZone)).eval()
    }

  private def status(e: TableLog.Entry): FileStatus = {
    val p = new Path(rootPath, e.path)
    val len = e.bytes.getOrElse(fs.getFileStatus(p).getLen)
    new FileStatus(len, false, 1, 128L << 20, 0L, p)
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) groups
      else boundPredicate(partitionFilters) match {
        case None => groups
        case Some(pred) => groups.filter { case (row, _) => pred.eval(row) }
      }
    // manifest-stat skipping: conservative per-column bounds implied by the
    // pushed data filters vs each file's recorded (min, max) — long stats
    // for integral columns, TYPED stats (string/double/timestamp/date) for
    // the rest. A file with no stats on a bounded column is always read —
    // skipping stays sound.
    val (bounds, tbounds) = dataFilters.reduceOption(And) match {
      case None => (Map.empty[String, (Option[Long], Option[Long])],
        Map.empty[String, (String, Option[String], Option[String])])
      case Some(e) =>
        (try TableLog.predicateBounds(e) catch { case NonFatal(_) => Map.empty },
         try TableLog.predicateTypedBounds(e) catch { case NonFatal(_) => Map.empty })
    }
    kept.map { case (row, es) =>
      val live =
        if (bounds.isEmpty && tbounds.isEmpty) es
        else es.filterNot { case (e, _) =>
          bounds.exists { case (c, b) =>
            e.stats.get(c).exists(TableLog.statDisjoint(_, b)) } ||
          tbounds.exists { case (c, b) =>
            e.tstats.get(c).exists(TableLog.typedStatDisjoint(_, b)) } }
      PartitionDirectory(row, live.map(_._2).toArray)
    }.filter(_.files.nonEmpty)
  }

  /** Bind the filters' attributes to partition-row ordinals and build an
    * interpreted predicate; None (no pruning — sound) when a filter holds
    * anything unbindable (e.g. a runtime subquery this index never sees).
    */
  private def boundPredicate(filters: Seq[Expression]) =
    try {
      val fields = partitionSchema.fields
      val bound = filters.reduce(And).transform {
        case a: AttributeReference =>
          val i = fields.indexWhere(_.name == a.name)
          require(i >= 0, s"partition filter references non-partition column ${a.name}")
          BoundReference(i, fields(i).dataType, nullable = true)
      }
      val p = Predicate.createInterpreted(bound)
      p.initialize(0)
      Some(p)
    } catch { case NonFatal(_) => None }

  override def inputFiles: Array[String] =
    entries.map(e => new Path(rootPath, e.path).toString).toArray

  override def refresh(): Unit = ()

  /** True bytes, NEVER an undercount: legacy bare-manifest entries carry no
    * recorded size, so summing only `entries.flatMap(_.bytes)` reported ~0
    * for a legacy-heavy table and the join planner could auto-BROADCAST a
    * huge graftlog side. `groups` already resolves a FileStatus per entry
    * (manifest bytes when recorded, one lazy stat for legacy), so the size
    * the planner sees is the size the scan will read.
    */
  override def sizeInBytes: Long =
    math.max(1L, groups.iterator.flatMap(_._2).map(_._2.getLen).sum)
}

private[graft] object GraftLog {

  /** The one-relation read over an entry subset: partition schema split
    * from the table schema by `partCols`, manifest-fed index, native
    * parquet format — Catalyst sees exactly a parquet table.
    */
  def relation(spark: SparkSession, root: String,
      entries: Seq[TableLog.Entry], tableSchema: StructType,
      partCols: Seq[String], pendingDv: Option[DvSpec] = None)
      : HadoopFsRelation = {
    val partitionSchema = StructType(partCols.map(c =>
      tableSchema.find(_.name == c).getOrElse(StructField(c, StringType))))
    val index = new GraftLogFileIndex(spark, root, entries,
      StructType(tableSchema.filterNot(f => partCols.contains(f.name))),
      partitionSchema, pendingDv)
    // dataSchema is the FULL table schema: partition columns ride as
    // OVERLAPPED partition columns (HadoopFsRelation serves them from the
    // partition values, and the planner never asks the files for them), so
    // the relation's output order IS the recorded schema order — a
    // format("graftlog") read needs no projection to match the table.
    HadoopFsRelation(index, partitionSchema, tableSchema, None,
      new GraftLogParquetFormat, Map.empty)(spark)
  }

  /** The batch relation `format("graftlog")` serves: the snapshot at
    * `version` (default head) as a [[HadoopFsRelation]]. A snapshot
    * carrying DELETION VECTORS stays NATIVE when the sidecars fit the
    * inline bound and [[GraftLogDvRewrite]] is installed: the relation
    * ships the run-set triple on its index, and the rewrite injects the
    * scan-side `graft_dv_live` filter at analysis — file scan, pruning and
    * codegen all engage exactly as on a DV-free snapshot (round 16; this
    * retired the RDD[Row] seam for the common case). Only snapshots whose
    * vectors exceed the inline caps — or sessions without the extensions
    * rule — fall back to [[GraftLogDvRelation]]'s anti-join.
    */
  def batchRelation(spark: SparkSession, root: String,
      version: Option[Long]): BaseRelation = {
    // ONE state reconstruction serves schema, entries and layout — this is
    // the planning hot path (every format load and every graft_log TVF
    // analysis), so the delta chain replays exactly once
    val st = TableLog.state(spark, root, version)
    val schema = TableLog.tableSchemaFor(spark, root, st.entries, st.schemaJson)
    val dvPaths = st.entries.flatMap(_.dvs).distinct
    def dvRewriteActive: Boolean =
      try spark.sessionState.optimizer.extendedOperatorOptimizationRules
        .exists(_ eq GraftLogDvRewrite)
      catch { case NonFatal(_) => false }
    if (TableLog.colmapOf(st).nonEmpty)
      // COLUMN-MAPPED snapshot: the files carry physical names while the
      // relation must expose logical ones — a V1 relation cannot project,
      // so serve the full aliased read pipeline behind the fallback
      // (renames are metadata-rare; TableLog.read and the graft_log TVF
      // stay fully native via one alias projection)
      new GraftLogDvRelation(spark, root, version.orElse(Some(st.version)),
        schema)
    else if (dvPaths.isEmpty)
      relation(spark, root, st.entries, schema,
        TableLog.partColsOf(st).filter(schema.fieldNames.contains))
    else if (dvRewriteActive && !schema.fieldNames.contains("_metadata") &&
        TableLog.dvInlineEligible(spark, root, dvPaths)) {
      val (files, offsets, runs) = TableLog.collectDvRuns(spark, root, dvPaths)
      relation(spark, root, st.entries, schema,
        TableLog.partColsOf(st).filter(schema.fieldNames.contains),
        pendingDv = Some(DvSpec(files, offsets, runs)))
    } else
      // PIN the snapshot: buildScan must read the version this relation was
      // planned against, never a re-resolved head — two actions on one
      // DataFrame (or a self-join) over a mutating table would otherwise
      // read different versions, and the schema computed here could diverge
      // from the data scanned (the DV-free path pins entries at load).
      new GraftLogDvRelation(spark, root, version.orElse(Some(st.version)), schema)
  }
}

/** OPTIMIZER rule (injected via [[graft.GraftExtensions]]) that turns a
  * DV-marked native graftlog relation into the filtered read it stands
  * for: `Project(table cols, Filter(graft_dv_live(file_key, row_index,
  * <run literals>), relation + _metadata))`. The relation itself cannot
  * carry a row filter (V1 relations only *produce* rows), so the marker
  * rides on [[GraftLogFileIndex.pendingDv]] and this rule expands it at
  * the start of operator optimization — after which filter pushdown,
  * partition pruning and whole-stage codegen around the scan all see the
  * same shape as a hand-written `.filter` over metadata columns, the
  * exact plan [[TableLog.read]] builds for inline-eligible snapshots.
  *
  * Optimization-time (not resolution-time) is deliberate: the ANALYZED
  * plan keeps the bare LogicalRelation, so `CREATE TEMPORARY VIEW`
  * stores an insertable relation (`INSERT INTO` a DV-carrying view works
  * through the normal command path) and schema surfaces stay the plain
  * table schema; every execution then expands the marker here. The
  * marker is consumed in the rewrite (fixed-point safe); the `_metadata`
  * struct is surfaced through the relation's own metadata output.
  */
object GraftLogDvRewrite
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ExtractValue, RegExpExtract}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.LogicalRelation
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case l: LogicalRelation if pending(l).nonEmpty =>
      val rel = l.relation.asInstanceOf[HadoopFsRelation]
      val idx = rel.location.asInstanceOf[GraftLogFileIndex]
      val spec = idx.pendingDv.get
      // consume the marker, then surface the _metadata struct the filter
      // needs through the relation's own metadata output
      val consumed = l.copy(relation =
        rel.copy(location = idx.withoutDv)(rel.sparkSession))
      val withMeta = consumed.withMetadataColumns()
      val meta = withMeta.output.filterNot(l.outputSet.contains)
        .find(_.name == "_metadata").getOrElse(
          throw new IllegalStateException(
            "graftlog DV rewrite: relation exposed no _metadata column"))
      val fileKey = RegExpExtract(
        ExtractValue(meta, Literal("file_path"), conf.resolver),
        Literal(TableLog.FileKeyRegex), Literal(1))
      val rowIdx = ExtractValue(meta, Literal("row_index"), conf.resolver)
      val cond = graft.functions.DvLive(fileKey, rowIdx,
        Literal.create(spec.files.toSeq, ArrayType(StringType)),
        Literal.create(spec.offsets.toSeq, ArrayType(LongType)),
        Literal.create(spec.runs.toSeq, ArrayType(LongType)))
      Project(l.output, Filter(cond, withMeta))
  }

  private def pending(l: LogicalRelation): Option[DvSpec] = l.relation match {
    case r: HadoopFsRelation => r.location match {
      case i: GraftLogFileIndex => i.pendingDv
      case _ => None
    }
    case _ => None
  }
}

/** Fallback relation for snapshots with live DELETION VECTORS: the dead
  * rows are anti-joined away inside [[TableLog.read]], which cannot be
  * expressed as a file relation — so the scan is the full read pipeline
  * behind an RDD boundary. Column pruning and the translatable filters are
  * pushed INSIDE that pipeline (they reach the parquet scan through
  * Catalyst); Spark re-applies every filter above the boundary, so partial
  * translation stays sound. Reads of DV-free snapshots never take this
  * path, and a compaction (which materializes the vectors) restores the
  * native relation.
  */
private[graft] class GraftLogDvRelation(spark: SparkSession, root: String,
    version: Option[Long], override val schema: StructType)
  extends BaseRelation with PrunedFilteredScan
  with org.apache.spark.sql.sources.InsertableRelation {

  override def sqlContext: SQLContext = spark.sqlContext

  /** `INSERT INTO` over a DV-carrying snapshot: the V1 InsertableRelation
    * route (the analyzer plans InsertIntoDataSourceCommand for it — no
    * extension rule needed on this path). Writes go to the HEAD, never the
    * pinned read version: SQL insert semantics mutate the table.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    if (overwrite) TableLog.insertOverwrite(data, root)
    else TableLog.append(data, root)
    ()
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = TableLog.read(spark, root, version)
    val filtered = filters.flatMap(filterToColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    filtered.select(requiredColumns.toSeq.map(col): _*).rdd
  }

  /** Top-level (relaxed) translation: an AND may keep just one translated
    * side — applying a SUPERSET of the pushed filter is sound because
    * Spark re-applies every filter above the relation boundary. Anything
    * under Or/Not goes through [[exactCol]]: negating or disjoining a
    * PARTIAL translation would apply a predicate the original does not
    * imply and silently drop matching rows.
    */
  private[graft] def filterToColumn(f: Filter): Option[Column] = f match {
    case sources.And(l, r) =>
      (filterToColumn(l), filterToColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b)
      }
    case other => exactCol(other)
  }

  /** Complete-or-nothing translation — None unless EVERY leaf translated. */
  private[graft] def exactCol(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) => for { a <- exactCol(l); b <- exactCol(r) } yield a && b
    case sources.Or(l, r) => for { a <- exactCol(l); b <- exactCol(r) } yield a || b
    case sources.Not(c) => exactCol(c).map(!_)
    case _ => None
  }
}

/** `format("graftlog")` — the [[TableLog]] data source:
  *
  *  - BATCH READ: `spark.read.format("graftlog").option("version", v)
  *    .load(root)` plans straight from the manifest
  *    ([[GraftLog.batchRelation]]) with partition pruning + manifest-stat
  *    skipping inside the index.
  *  - STREAMING READ: `spark.readStream.format("graftlog")
  *    .option("startingVersion", v).load(root)` tails the commit stream
  *    with VERSIONS AS OFFSETS ([[GraftLogSource]]).
  *  - BATCH WRITE: `df.write.format("graftlog").mode(...).save(root)` —
  *    manifest-committing Append/Overwrite/ErrorIfExists/Ignore; options
  *    `partitionBy` + `stats` (comma-separated) set a NEW table's layout
  *    and stat columns (see [[GraftLogWrite]] scaladoc).
  *  - STREAMING WRITE: `df.writeStream.format("graftlog").start(root)` —
  *    one atomic exactly-once snapshot commit per micro-batch
  *    ([[GraftLogSink]]).
  */
class GraftLogSourceProvider extends DataSourceRegister
  with RelationProvider with StreamSourceProvider
  with org.apache.spark.sql.sources.CreatableRelationProvider
  with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graftlog"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftlog needs a table root: .load(<path>)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val version = parameters.get("version")
      .orElse(parameters.get("versionAsOf")).map(_.toLong)
    GraftLog.batchRelation(sqlContext.sparkSession, rootOf(parameters), version)
  }

  /** The batch WRITER (`df.write.format("graftlog")`). Append is the blind
    * rebasing append (concurrent writers both land); Overwrite preserves an
    * existing table's recorded partition layout and tracked stat columns
    * unless `partitionBy`/`stats` name a new layout; ErrorIfExists/Ignore
    * follow their SaveMode contracts against log existence (a committed
    * version, not a directory).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val exists = TableLog.headVersion(spark, root).nonEmpty
    val statCols = GraftLogWrite.csv(parameters, "stats")
    val partCols = GraftLogWrite.csv(parameters, "partitionBy")
    (partCols ++ statCols).foreach(c => require(data.columns.contains(c),
      s"option column '$c' is not in the written schema ${data.columns.toSeq}"))
    def create(): Unit = {
      if (partCols.nonEmpty)
        TableLog.overwritePartitioned(data, root, partCols, statCols: _*)
      else TableLog.overwriteWithStats(data, root, statCols: _*)
      ()
    }
    mode match {
      case SaveMode.Append =>
        if (!exists && (partCols.nonEmpty || statCols.nonEmpty)) create()
        else { TableLog.append(data, root, statCols = statCols); () }
      case SaveMode.Overwrite =>
        if (exists && partCols.isEmpty && statCols.isEmpty)
          TableLog.insertOverwrite(data, root) // keep the recorded layout
        else create()
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graftlog table at $root already exists (SaveMode.ErrorIfExists)")
        create()
      case SaveMode.Ignore => if (!exists) create()
    }
    GraftLog.batchRelation(spark, root, None)
  }

  /** The streaming SINK: exactly-once micro-batch appends (epoch token in
    * the manifest — [[TableLog.appendBatch]]). Append-only by construction:
    * each batch is one atomic snapshot commit, so update/complete modes
    * (which retract rows) cannot be expressed. A partitioned layout comes
    * from the TABLE (create it partitioned first); `partitionBy` on the
    * stream would race the first batch against table creation.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graftlog sink is append-only (atomic snapshot commit per batch); " +
        s"got $outputMode")
    require(partitionColumns.isEmpty,
      "partition the TABLE, not the stream: create it partitioned first " +
        "(df.write.format(\"graftlog\").option(\"partitionBy\", ...)) — the " +
        "sink adopts the table's recorded layout")
    new GraftLogSink(sqlContext.sparkSession, rootOf(parameters), parameters)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      GraftLogSource.tableSchema(sqlContext.sparkSession, rootOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new GraftLogSource(sqlContext.sparkSession, rootOf(parameters), schema,
      parameters)
}

/** Versions-as-offsets micro-batch source over a [[TableLog]] commit log —
  * the Delta-source shape, and the retirement of [[graft.streaming.LogTail]]
  * 's driver-side MemoryStream bridge: `getBatch` plans the window's
  * APPENDED FILES as one native parquet relation
  * ([[GraftLog.relation]] flagged streaming), so a version's rows flow
  * executor-to-executor and NEVER touch the driver.
  *
  * Offsets are committed table versions: `latestOffset` is the
  * `_last_checkpoint`-pointer head probe (an idle poll costs a couple of
  * metadata existence checks), `getBatch(start, end)` is
  * [[TableLog.fileChanges]] over `(start, end]`. Admission control paces
  * delivery at `maxVersionsPerBatch` (default 1) versions per micro-batch,
  * so BATCH BOUNDARIES COINCIDE WITH COMMIT POINTS — a version's rows never
  * split across batches and stateful operators see state carry over at
  * exactly the log's atomic commits (what the q219 gate pins). Works under
  * Trigger.AvailableNow via [[prepareForTriggerAvailableNow]] (the head is
  * fixed once; pacing still applies).
  *
  * Options: `startingVersion` (consume strictly AFTER this version;
  * default 0 = since inception), `maxVersionsPerBatch` (default 1),
  * `onRewrite` ∈ fail | skip | deliverAdds — the [[graft.streaming.LogTail
  * .RewritePolicy]] stances for versions that REWROTE files (fail throws
  * the typed error without advancing; skip delivers nothing; deliverAdds
  * delivers the rewrite's added files raw — at-least-once redelivery,
  * and a DV commit's re-added files are delivered WITHOUT the vector
  * applied, Delta's ignoreChanges contract).
  *
  * The recorded table schema at the window's END governs each read
  * (additive evolution NULL-fills older batches); output is aligned to the
  * source's declared schema.
  */
class GraftLogSource(spark: SparkSession, root: String,
    userSchema: Option[StructType], parameters: Map[String, String])
  extends org.apache.spark.sql.execution.streaming.Source
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}
  import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  private val startingVersion =
    parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
  private val maxVersionsPerBatch =
    parameters.get("maxVersionsPerBatch").map(_.toLong).getOrElse(1L)
  private val onRewrite =
    parameters.getOrElse("onRewrite", "fail").toLowerCase match {
      case "fail" => graft.streaming.LogTail.Fail
      case "skip" => graft.streaming.LogTail.Skip
      case "deliveradds" => graft.streaming.LogTail.DeliverAdds
      case other => throw new IllegalArgumentException(
        s"onRewrite must be fail | skip | deliverAdds, got $other")
    }
  require(maxVersionsPerBatch >= 1, "maxVersionsPerBatch must be >= 1")

  override val schema: StructType =
    userSchema.getOrElse(GraftLogSource.tableSchema(spark, root))

  /** LOGICAL → PHYSICAL mapping resolved ONCE at stream construction:
    * physical identities never change (a rename only re-points the logical
    * name), so every window's files — before or after any rename — read
    * correctly under the mapping of the head the stream started from; a
    * rename DURING the stream is invisible by the fixed-schema contract.
    */
  private val colmap: Map[String, String] =
    TableLog.headVersion(spark, root).map(h =>
      TableLog.colmapOf(TableLog.state(spark, root, Some(h))))
      .getOrElse(Map.empty)

  /** Furthest version handed out via getBatch this run; latestOffset also
    * honors the engine-provided start offset, which wins after a restart
    * recovery where getBatch was never called.
    */
  private var deliveredTo: Long = startingVersion
  private var availableNowCap: Option[Long] = None

  private def verOf(o: AnyRef): Long = o match {
    case l: LongOffset => l.offset
    case o: OffsetV2 => o.json.trim.toLong
    case o: OffsetV1 => o.json.trim.toLong
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = TableLog.headVersion(spark, root).orElse(Some(startingVersion))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val cur = math.max(deliveredTo,
      Option(start).map(verOf).getOrElse(startingVersion))
    val head = TableLog.headVersion(spark, root).getOrElse(cur)
    val capped = availableNowCap.fold(head)(math.min(head, _))
    val next = math.min(cur + maxVersionsPerBatch, capped)
    if (next <= cur) null else LongOffset(next)
  }

  // the legacy V1 polling path has no start-offset parameter, so after a
  // restart it could only answer from deliveredTo = startingVersion and
  // would REGRESS a committed offset (redelivering versions). This source
  // declares SupportsAdmissionControl, so the engine always drives it
  // through latestOffset(start, limit) — FileStreamSource's contract.
  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val vFrom = start.map(o => verOf(o)).getOrElse(startingVersion)
    val vTo = verOf(end)
    deliveredTo = math.max(deliveredTo, vTo)
    // per-version policy walk over (vFrom, vTo] — LogTail semantics
    val adds = Vector.newBuilder[TableLog.Entry]
    var v = vFrom + 1
    while (v <= vTo) {
      val (a, r) = TableLog.fileChanges(spark, root, v - 1, v)
      if (r.isEmpty) adds ++= a
      else onRewrite match {
        case graft.streaming.LogTail.Skip => ()
        case graft.streaming.LogTail.DeliverAdds => adds ++= a
        case graft.streaming.LogTail.Fail =>
          throw new graft.streaming.LogTail.NonAppendVersionException(
            s"version $v of $root rewrote files (compaction/delete/merge); " +
              "an append tail cannot express it as new rows — reprocess " +
              "from the snapshot, use readChanges, or set onRewrite = " +
              "skip/deliverAdds")
      }
      v += 1
    }
    val entries = adds.result()
    if (entries.isEmpty) Internals.emptyStreamingFrame(spark, schema)
    else {
      // the SOURCE schema reads every window: a streaming query's output
      // schema is fixed at start anyway, additive columns a window's
      // older files lack NULL-fill under it, and columns added to the
      // table AFTER the stream started are invisible by definition — so
      // no per-batch snapshot-state reconstruction (which would replay
      // the delta chain from the last checkpoint on EVERY micro-batch of
      // a hot tail) is ever needed; getBatch's metadata cost is exactly
      // the window's own manifests.
      val partCols = entries.head.partition.keys.toSeq.sorted
      require(entries.forall(_.partition.keys.toSeq.sorted == partCols),
        "mixed partition layouts in one change window are not readable")
      val physSchema = TableLog.physicalSchema(schema, colmap)
      val rel = GraftLog.relation(spark, root, entries, physSchema,
        partCols.filter(physSchema.fieldNames.contains))
      Internals.streamingRelationFrame(spark, rel)
        .select(schema.fieldNames.toSeq.map(n =>
          col(colmap.getOrElse(n, n)).as(n)): _*)
    }
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftLogSource[$root]"
}

private[graft] object GraftLogSource {
  def tableSchema(spark: SparkSession, root: String): StructType =
    TableLog.schemaOf(spark, root).getOrElse(throw new IllegalArgumentException(
      s"graftlog stream over $root needs a table with a recorded schema " +
        "(any data commit records one); pass .schema(...) to override"))
}
