package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Minimal manifest COMMIT LOG — the "metastore pointer swap" seam that
  * [[Warehouse.compact]]'s two-rename visibility caveat and
  * [[Warehouse.mergeUpsertPartitioned]]'s same-path-checkpoint note both
  * punt to. This is the protocol core Delta/Iceberg are built on, reduced
  * to its invariant: a table IS the file list named by its newest
  * committed manifest, and the COMMIT POINT is one atomic
  * rename-if-absent of `_graft_log/v<N>.manifest` — readers either see
  * version N complete or not at all, never a half-written directory.
  *
  * What the log buys at 100 TB, concretely:
  *  - ATOMIC maintenance: compaction/merge write NEW files next to the old
  *    ones and publish by committing a new manifest — no window where the
  *    directory half-exists (the hole [[Warehouse.compact]] documents),
  *    and a crashed rewrite leaves unreferenced files, never a broken
  *    table.
  *  - KEEP-BY-REFERENCE: a compaction's keep set changes manifests, not
  *    bytes — zero IO for the files already at target size (compare
  *    [[Warehouse.compactByPlan]]'s copy, which must move keeps because a
  *    directory IS its listing).
  *  - PLANNING WITHOUT LISTING: readers plan from one manifest read
  *    instead of a recursive directory walk — object-store listing is the
  *    scan-planning bottleneck the real formats exist to remove.
  *  - TIME TRAVEL: old manifests stay; `read(root, Some(v))` is a
  *    consistent snapshot for audits/reproducible training runs (the q211
  *    gate reads three versions of one table in one query).
  *  - OPTIMISTIC CONCURRENCY: two writers racing to version N both
  *    attempt the same rename; exactly one wins (rename-if-absent is the
  *    CAS), the loser throws and must re-plan against the new head —
  *    Delta's conflict protocol, at file granularity.
  *
  * Deliberately NOT here (documented scope, not oversight): per-file
  * column stats / data skipping, manifest checkpointing (listing stays
  * O(versions)), schema evolution, and row-level deletes — each layers on
  * the same commit primitive without changing it.
  *
  * Manifest format: UTF-8, one data-file path per line, relative to the
  * table root. Data files land under unique `c<uuid>/` dirs per commit, so
  * concurrent writers never collide on data paths — only on the manifest
  * rename, which is the point.
  */
object TableLog {

  private def logDir(root: String) = new Path(s"$root/_graft_log")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private val ManifestName = "v(\\d+)\\.manifest".r

  /** Committed versions, ascending. In-flight `.tmp` files and anything
    * else in the log dir are ignored — only a completed rename commits.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = logDir(root)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestName(n) if s.isFile => Some(n.toLong)
      case _ => None
    }).sorted
  }

  /** The file list of `version` (default: newest committed) — stats
    * columns, when present, are stripped (see [[manifestEntries]]).
    */
  def manifest(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[String] =
    manifestEntries(spark, root, version).map(_._1)

  /** Manifest rows of `version` with their optional per-file (min, max)
    * stats — the DATA-SKIPPING surface: a stats-bearing line is
    * `path\tmin\tmax` (LONG stats, engine-portable integers), a plain line
    * is just the path (no stats → the file can never be skipped).
    */
  def manifestEntries(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[(String, Option[(Long, Long)])] = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed under $root (have $vs)")
    val p = new Path(s"$root/_graft_log/v$v.manifest")
    val in = fsOf(spark, p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty)
      .map { line =>
        line.split('\t') match {
          case Array(f, lo, hi) => (f, Some((lo.toLong, hi.toLong)))
          case _ => (line, None)
        }
      }
      .toList
    finally in.close()
  }

  /** Read the table at `version` (default: newest committed snapshot). */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame =
    spark.read.parquet(manifest(spark, root, version)
      .map(f => s"$root/$f"): _*)

  /** Commit `files` (paths relative to root) as version `basedOn + 1` —
    * `basedOn` is the head version the writer PLANNED against (0 for an
    * empty table; default: re-read the current head). The rename of the
    * fully-written `.tmp` manifest IS the commit point: rename-if-absent
    * either installs the version atomically or returns false because a
    * concurrent writer already committed it — the optimistic-concurrency
    * CAS. The loser THROWS and must re-plan against the new head (its
    * snapshot may be stale), exactly the Delta conflict protocol. Returns
    * the committed version number.
    */
  def commit(spark: SparkSession, root: String, files: Seq[String],
      basedOn: Option[Long] = None): Long = {
    val dir = logDir(root)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val next =
      basedOn.getOrElse(versions(spark, root).lastOption.getOrElse(0L)) + 1L
    val tmp = new Path(dir, s"v$next.manifest.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(files.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, s"v$next.manifest")
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"commit of version $next lost the race (manifest exists); " +
          "re-plan against the new head and retry")
    }
    next
  }

  /** Write `df`'s rows as new data files under a unique commit dir and
    * return their root-relative paths — no manifest is committed yet, so
    * the files are invisible until the caller commits.
    */
  def writeData(df: DataFrame, root: String): Seq[String] = {
    val spark = df.sparkSession
    val sub = s"c${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.write.parquet(s"$root/$sub")
    val p = new Path(s"$root/$sub")
    fsOf(spark, p).listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$sub/${s.getPath.getName}").sorted
  }

  /** Commit `df` as a full-snapshot REPLACE (the initial write, or an
    * overwrite). A blind replace depends on no prior state, so it commits
    * against whatever head it finds (last-write-wins); state-derived
    * commits ([[append]]/[[compact]]/[[mergeUpsert]]) pin the head they
    * read instead. Returns the new version.
    */
  def overwrite(df: DataFrame, root: String): Long =
    commit(df.sparkSession, root, writeData(df, root))

  /** Commit `df` APPENDED to the current snapshot: the new manifest is the
    * old file list plus the new files — existing data is referenced, never
    * rewritten or copied. Commits `basedOn` the head it read, so a
    * concurrent commit in between surfaces as the CAS conflict.
    */
  def append(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val head = versions(spark, root).lastOption
    val prev = head.fold(Seq.empty[String])(v =>
      manifest(spark, root, Some(v)))
    commit(spark, root, prev ++ writeData(df, root),
      basedOn = Some(head.getOrElse(0L)))
  }

  /** Log-published compaction: files already ≥ `targetBytes` are kept BY
    * REFERENCE (same path in the new manifest — zero IO), the small tail
    * is read once and rewritten into ~target-sized files, and the swap is
    * one manifest commit — a reader mid-scan on the old version is
    * untouched, the next reader plans from the new one. Old versions stay
    * readable (vacuuming unreferenced files is a separate retention pass,
    * as in the real formats). Manifest STATS are dropped by this op (the
    * rewritten files' ranges changed; re-collect with
    * [[overwriteWithStats]] when skipping matters). Returns the new
    * version.
    */
  def compact(spark: SparkSession, root: String, targetBytes: Long): Long = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val head = versions(spark, root).last
    val cur = manifest(spark, root, Some(head))
    val fs = fsOf(spark, new Path(root))
    val sized = cur.map { f =>
      (f, fs.getFileStatus(new Path(s"$root/$f")).getLen)
    }
    val (keeps, smalls) = sized.partition(_._2 >= targetBytes)
    val newFiles =
      if (smalls.isEmpty) Seq.empty
      else {
        val totalSmall = smalls.map(_._2).sum
        val nBins = math.max(1L, (totalSmall + targetBytes - 1) / targetBytes).toInt
        writeData(spark.read.parquet(smalls.map(f => s"$root/${f._1}"): _*)
          .repartition(nBins), root)
      }
    commit(spark, root, keeps.map(_._1) ++ newFiles, basedOn = Some(head))
  }

  /** Log-published CDC MERGE: read the current snapshot, apply
    * [[Warehouse.mergeUpsert]], commit the merged state as a new version —
    * the atomic form of the read-modify-write that
    * [[Warehouse.mergeUpsertPartitioned]] performs in place (there the
    * checkpoint-then-overwrite seam is the documented trade; here the old
    * snapshot is immutable so no materialization barrier is needed at
    * all). Returns the new version.
    */
  def mergeUpsert(spark: SparkSession, root: String, updates: DataFrame,
      keyCols: Seq[String], seqCol: String): Long = {
    val head = versions(spark, root).last
    val merged = Warehouse.mergeUpsert(read(spark, root, Some(head)),
      updates, keyCols, seqCol)
    commit(spark, root, writeData(merged, root), basedOn = Some(head))
  }

  /** [[overwrite]] with PER-FILE (min, max) STATS on `statCol` collected
    * into the manifest — data skipping at the PLANNING layer: a later
    * [[readPruned]] drops whole files from the plan by comparing the
    * predicate range against manifest stats, before any footer is opened
    * or any task scheduled. At 100 TB this is the layer above parquet
    * min/max skipping (which still costs a footer read per file and a
    * listed directory): one manifest read plans the whole scan. Stats are
    * collected by one aggregation over the just-written (page-cached)
    * files — the real formats fold this into the write itself; the write-
    * time cost buys every future read's pruning. Cluster the data on the
    * stat column first (`repartitionByRange`) or the per-file ranges
    * overlap and nothing skips — the same locality contract as parquet
    * footer skipping ([[Warehouse.compact]]'s sortCol note).
    */
  def overwriteWithStats(df: DataFrame, root: String, statCol: String): Long = {
    val spark = df.sparkSession
    val files = writeData(df, root)
    import org.apache.spark.sql.functions._
    val rel = concat(element_at(split(input_file_name(), "/"), -2),
      lit("/"), element_at(split(input_file_name(), "/"), -1))
    val stats = spark.read.parquet(files.map(f => s"$root/$f"): _*)
      .groupBy(rel.as("f"))
      .agg(min(col(statCol)).cast("long").as("lo"),
        max(col(statCol)).cast("long").as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lines = files.map(f => stats.get(f) match {
      case Some((lo, hi)) => s"$f\t$lo\t$hi"
      case None => f // zero-row file: no stats, never skippable
    })
    commit(spark, root, lines)
  }

  /** Read `version` (default head) PRUNED to the files whose manifest
    * [min, max] stats intersect `[lo, hi]` — files without stats are
    * always read (skipping must be sound, never guessed). This prunes the
    * FILE SET; the caller still applies the row-level predicate (exactly
    * parquet footer skipping's contract, one layer earlier).
    */
  def readPruned(spark: SparkSession, root: String, lo: Long, hi: Long,
      version: Option[Long] = None): DataFrame = {
    val cand = manifestEntries(spark, root, version).collect {
      case (f, None) => f
      case (f, Some((mn, mx))) if mx >= lo && mn <= hi => f
    }
    if (cand.isEmpty)
      read(spark, root, version).limit(0) // schema-preserving empty
    else spark.read.parquet(cand.map(f => s"$root/$f"): _*)
  }

  /** Retention pass (the real formats' VACUUM): keep the newest
    * `keepVersions` manifests, delete the older manifests and every data
    * file they alone referenced, and sweep ORPHANS — data files referenced
    * by NO manifest (a crashed [[writeData]] before its commit) — older
    * than `orphanMinAgeMs` (the age guard protects a writer that has
    * staged files but not yet committed; production retention uses hours,
    * tests pass 0). Time travel older than the horizon is gone after this
    * by design — that is what the op is for (unbounded history is
    * unbounded storage). Driver-side, manifest-sized.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1,
      orphanMinAgeMs: Long = 7L * 24 * 3600 * 1000): Unit = {
    require(keepVersions >= 1, "must keep at least the head version")
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val (old, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val referenced = keep.flatMap(v => manifest(spark, root, Some(v))).toSet
    val oldRefs = old.flatMap(v => manifest(spark, root, Some(v))).toSet
    (oldRefs -- referenced).foreach(f =>
      fs.delete(new Path(s"$root/$f"), false))
    old.foreach(v =>
      fs.delete(new Path(s"$root/_graft_log/v$v.manifest"), false))
    // orphan sweep: commit-dir data files no manifest references, past the
    // in-flight-writer age guard
    val now = System.currentTimeMillis()
    // exactly the commit-dir shape writeData produces — never sweep
    // unrelated directories a user parked under the root
    fs.listStatus(rootP).filter(s =>
        s.isDirectory && s.getPath.getName.matches("c[0-9a-f]{32}")).foreach { d =>
      fs.listStatus(d.getPath).foreach { f =>
        val rel = s"${d.getPath.getName}/${f.getPath.getName}"
        if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
            !referenced.contains(rel) && !oldRefs.contains(rel) &&
            now - f.getModificationTime >= orphanMinAgeMs)
          fs.delete(f.getPath, false)
      }
      if (fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, false)
    }
  }

  /** One micro-batch of [[appendStream]] — epoch-ledger idempotence (the
    * [[Warehouse.mergeUpsertBatch]] pattern, markers under the log dir) so
    * a crash-replayed epoch appends once, plus a bounded retry on the
    * commit CAS: appends COMMUTE, so losing the race to an unrelated
    * writer just means re-reading the head and appending after it.
    */
  def appendBatch(batch: DataFrame, batchId: Long, root: String,
      casRetries: Int = 5): Unit = {
    val spark = batch.sparkSession
    val marker = new Path(s"$root/_graft_log/epochs/epoch-$batchId")
    val fs = fsOf(spark, marker)
    if (!fs.exists(marker)) {
      var attempt = 0
      var done = false
      while (!done) {
        try { append(batch, root); done = true }
        catch {
          case e: java.io.IOException if attempt < casRetries =>
            attempt += 1
            org.slf4j.LoggerFactory.getLogger("graft.sources.TableLog")
              .warn(s"append epoch $batchId lost the commit CAS " +
                s"(attempt $attempt/$casRetries), re-reading head: $e")
        }
      }
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
  }

  /** Continuous micro-batch APPEND into a logged table — the streaming
    * sink whose every batch becomes one atomic snapshot commit (readers
    * see whole batches or nothing; no in-progress files ever visible,
    * unlike a raw parquet directory sink).
    */
  def appendStream(updates: DataFrame, root: String, checkpointDir: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch, id, root)
      }
      .start()
}
