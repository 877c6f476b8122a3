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
  *    instead of a recursive directory walk, and manifest entries carry
  *    the file SIZE (so maintenance never issues per-file status RPCs)
  *    and optionally per-file column stats (so range scans prune whole
  *    files before any footer is opened) — object-store listing and
  *    footer fetches are the scan-planning bottlenecks the real formats
  *    exist to remove.
  *  - TIME TRAVEL: old manifests stay; `read(root, Some(v))` is a
  *    consistent snapshot for audits/reproducible training runs (the q211
  *    gate reads three versions of one table in one query).
  *  - OPTIMISTIC CONCURRENCY: two writers racing to version N both
  *    attempt the same rename; exactly one wins (rename-if-absent is the
  *    CAS), the loser gets a typed [[TableLog.CommitConflictException]]
  *    and must re-plan against the new head — Delta's conflict protocol,
  *    at file granularity.
  *
  * Deliberately NOT here (documented scope, not oversight): manifest
  * checkpointing (version listing stays O(versions)), schema evolution,
  * and row-level deletes — each layers on the same commit primitive
  * without changing it.
  *
  * Manifest format, line by line (UTF-8):
  *  - `#<key>:<value>` — commit METADATA (e.g. `#epoch:<id>`, the
  *    streaming sink's exactly-once token — committed ATOMICALLY with the
  *    file list, which is what closes the marker-after-commit crash
  *    window a side-file ledger alone would leave);
  *  - `<path>\t<bytes>` — a data file, path relative to the table root;
  *  - `<path>\t<bytes>\t<min>\t<max>` — a data file with LONG column
  *    stats ([[overwriteWithStats]]);
  *  - bare `<path>` — tolerated (size unknown: maintenance falls back to
  *    one status call; never skippable).
  * Data files land under unique `c<uuid>/` dirs per commit, so concurrent
  * writers never collide on data paths — only on the manifest rename,
  * which is the point. The rename-is-atomic assumption holds on
  * filesystems with atomic rename (local, HDFS); S3-style stores need a
  * coordination service here, exactly as the real formats do.
  */
object TableLog {

  /** The commit CAS was lost: another writer committed the version this
    * writer planned against. Re-read the head and re-plan; for commuting
    * operations (appends) a bounded retry is safe.
    */
  final class CommitConflictException(msg: String)
    extends java.io.IOException(msg)

  /** One manifest data-file entry. `bytes` is None only for legacy bare
    * lines; `stats` is the optional (min, max) of the stats column.
    */
  final case class Entry(path: String, bytes: Option[Long],
    stats: Option[(Long, Long)])

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

  private def manifestLines(spark: SparkSession, root: String,
      version: Option[Long]): Seq[String] = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed under $root (have $vs)")
    val p = new Path(s"$root/_graft_log/v$v.manifest")
    val in = fsOf(spark, p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The file list of `version` (default: newest committed) — paths only. */
  def manifest(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[String] =
    manifestEntries(spark, root, version).map(_.path)

  /** Data-file entries of `version` (default head) with sizes and the
    * optional per-file (min, max) stats — the data-skipping surface.
    */
  def manifestEntries(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[Entry] =
    manifestLines(spark, root, version)
      .filterNot(_.startsWith("#"))
      .map(_.split('\t') match {
        case Array(f, b, lo, hi) => Entry(f, Some(b.toLong),
          Some((lo.toLong, hi.toLong)))
        case Array(f, b) => Entry(f, Some(b.toLong), None)
        case other => Entry(other.mkString("\t"), None, None)
      })

  /** Commit metadata lines of `version` (default head), `#` stripped —
    * e.g. `epoch:<id>` from the streaming sink.
    */
  def manifestMeta(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[String] =
    manifestLines(spark, root, version)
      .filter(_.startsWith("#")).map(_.stripPrefix("#"))

  /** Commit `entries` as version `basedOn + 1` — `basedOn` is the head
    * version the writer PLANNED against (0 for an empty table; default:
    * re-read the current head). `meta` lines are committed ATOMICALLY with
    * the file list. The rename of the fully-written `.tmp` manifest IS the
    * commit point: rename-if-absent either installs the version atomically
    * or fails because a concurrent writer already committed it — the
    * optimistic-concurrency CAS. The loser gets
    * [[CommitConflictException]] and must re-plan against the new head
    * (its snapshot may be stale), exactly the Delta conflict protocol.
    * Returns the committed version number.
    */
  def commit(spark: SparkSession, root: String, entries: Seq[Entry],
      basedOn: Option[Long] = None, meta: Seq[String] = Nil): Long = {
    val dir = logDir(root)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val next =
      basedOn.getOrElse(versions(spark, root).lastOption.getOrElse(0L)) + 1L
    val lines = meta.map("#" + _) ++ entries.map { e =>
      (Seq(e.path) ++ e.bytes.map(_.toString).toSeq ++
        e.stats.toSeq.flatMap { case (lo, hi) => Seq(lo.toString, hi.toString) })
        .mkString("\t")
    }
    val tmp = new Path(dir, s"v$next.manifest.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, s"v$next.manifest")
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new CommitConflictException(
        s"commit of version $next lost the race (manifest exists); " +
          "re-plan against the new head and retry")
    }
    next
  }

  /** Read the table at `version` (default: newest committed snapshot). */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame =
    spark.read.parquet(manifest(spark, root, version)
      .map(f => s"$root/$f"): _*)

  /** Write `df`'s rows as new data files under a unique commit dir and
    * return their entries (root-relative path + size) — no manifest is
    * committed yet, so the files are invisible until the caller commits.
    */
  def writeData(df: DataFrame, root: String): Seq[Entry] = {
    val spark = df.sparkSession
    val sub = s"c${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.write.parquet(s"$root/$sub")
    val p = new Path(s"$root/$sub")
    fsOf(spark, p).listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => Entry(s"$sub/${s.getPath.getName}", Some(s.getLen), None))
      .sortBy(_.path)
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
    * old entry list plus the new files — existing data is referenced,
    * never rewritten or copied. Commits `basedOn` the head it read, so a
    * concurrent commit in between surfaces as the CAS conflict.
    */
  def append(df: DataFrame, root: String, meta: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    appendEntries(spark, root, writeData(df, root), meta)
  }

  private def appendEntries(spark: SparkSession, root: String,
      entries: Seq[Entry], meta: Seq[String]): Long = {
    val head = versions(spark, root).lastOption
    val prev = head.fold(Seq.empty[Entry])(v =>
      manifestEntries(spark, root, Some(v)))
    commit(spark, root, prev ++ entries,
      basedOn = Some(head.getOrElse(0L)), meta = meta)
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
    *
    * NULL `statCol` rows: a file whose values are ALL NULL aggregates to
    * NULL stats and is written WITHOUT stats (always read — sound); a
    * mixed file's stats cover its non-null values only, which is still
    * sound for [[readPruned]]'s contract because a NULL can never satisfy
    * the range predicate the caller re-applies row-level.
    */
  def overwriteWithStats(df: DataFrame, root: String, statCol: String): Long = {
    val spark = df.sparkSession
    val files = writeData(df, root)
    val stats = collectStats(spark, root, files, statCol)
    commit(spark, root,
      files.map(e => e.copy(stats = stats.get(e.path))))
  }

  /** Per-file (min, max) stats of `statCol` for just-written `files` —
    * the collection pass [[overwriteWithStats]] and [[deleteRange]] share.
    * All-NULL files yield no entry (written without stats — always read).
    */
  private def collectStats(spark: SparkSession, root: String,
      files: Seq[Entry], statCol: String): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty) Map.empty
    else {
      val rel = concat(element_at(split(input_file_name(), "/"), -2),
        lit("/"), element_at(split(input_file_name(), "/"), -1))
      spark.read.parquet(files.map(f => s"$root/${f.path}"): _*)
        .groupBy(rel.as("f"))
        .agg(min(col(statCol)).cast("long").as("lo"),
          max(col(statCol)).cast("long").as("hi"))
        .collect()
        .flatMap(r =>
          if (r.isNullAt(1) || r.isNullAt(2)) None
          else Some(r.getString(0) -> (r.getLong(1), r.getLong(2))))
        .toMap
    }
  }

  /** Row-level DELETE of `statCol ∈ [lo, hi]` — the compliance/forget
    * path a training-data platform needs, made SURGICAL by the manifest
    * stats: files whose stats PROVE no row is in range are kept BY
    * REFERENCE (same entry, stats intact, zero IO — the skipping
    * machinery running in reverse), and only the intersecting files (plus
    * stats-less ones, which might hold anything) are read, filtered and
    * rewritten with fresh stats. One atomic manifest commit publishes the
    * deletion. At 100 TB with a well-clustered delete key, a forget
    * request rewrites a handful of files, not the table.
    *
    * COMPLIANCE CAVEAT, stated loudly: the commit log keeps OLD SNAPSHOTS
    * readable by design, so the deleted rows still exist in prior
    * versions' files until a [[vacuum]] ages them out — a real forget
    * pipeline is deleteRange + vacuum past the retention horizon, exactly
    * as in the production formats (Delta VACUUM after DELETE).
    *
    * Returns the new version.
    */
  def deleteRange(spark: SparkSession, root: String, lo: Long, hi: Long,
      statCol: String): Long = {
    val head = versions(spark, root).last
    val entries = manifestEntries(spark, root, Some(head))
    val (touched, untouched) = entries.partition(_.stats
      .forall { case (mn, mx) => mx >= lo && mn <= hi })
    val rewritten =
      if (touched.isEmpty) Seq.empty
      else {
        import org.apache.spark.sql.functions.col
        val kept = spark.read
          .parquet(touched.map(f => s"$root/${f.path}"): _*)
          .filter(!(col(statCol).isNotNull &&
            col(statCol).cast("long").between(lo, hi)))
        val files = writeData(kept, root)
        val stats = collectStats(spark, root, files, statCol)
        files.map(e => e.copy(stats = stats.get(e.path)))
      }
    commit(spark, root, untouched ++ rewritten, basedOn = Some(head))
  }

  /** Read `version` (default head) PRUNED to the files whose manifest
    * [min, max] stats intersect `[lo, hi]` — files without stats are
    * always read (skipping must be sound, never guessed). This prunes the
    * FILE SET for a RANGE predicate on the stats column; the caller still
    * applies the row-level predicate (exactly parquet footer skipping's
    * contract, one layer earlier). NULL stat-column rows never satisfy a
    * range predicate, so a pruned file's NULL rows are not a loss.
    */
  def readPruned(spark: SparkSession, root: String, lo: Long, hi: Long,
      version: Option[Long] = None): DataFrame = {
    val cand = manifestEntries(spark, root, version).collect {
      case Entry(f, _, None) => f
      case Entry(f, _, Some((mn, mx))) if mx >= lo && mn <= hi => f
    }
    if (cand.isEmpty)
      read(spark, root, version).limit(0) // schema-preserving empty
    else spark.read.parquet(cand.map(f => s"$root/$f"): _*)
  }

  /** Log-published compaction: files already ≥ `targetBytes` are kept BY
    * REFERENCE (same entry in the new manifest — zero IO), the small tail
    * is read once and rewritten into ~target-sized files, and the swap is
    * one manifest commit — a reader mid-scan on the old version is
    * untouched, the next reader plans from the new one. Old versions stay
    * readable (vacuuming unreferenced files is a separate retention pass,
    * as in the real formats). Sizes come FROM the manifest (legacy bare
    * entries fall back to one status call each) — no per-file metadata
    * walk. Stats on rewritten files are dropped (their ranges changed;
    * re-collect with [[overwriteWithStats]] when skipping matters); kept
    * entries retain theirs. Returns the new version.
    */
  def compact(spark: SparkSession, root: String, targetBytes: Long): Long = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val head = versions(spark, root).last
    val fs = fsOf(spark, new Path(root))
    val sized = manifestEntries(spark, root, Some(head)).map(e =>
      e.copy(bytes = e.bytes.orElse(
        Some(fs.getFileStatus(new Path(s"$root/${e.path}")).getLen))))
    val (keeps, smalls) = sized.partition(_.bytes.get >= targetBytes)
    val newFiles =
      if (smalls.isEmpty) Seq.empty
      else {
        val totalSmall = smalls.map(_.bytes.get).sum
        val nBins = math.max(1L, (totalSmall + targetBytes - 1) / targetBytes).toInt
        writeData(spark.read.parquet(smalls.map(f => s"$root/${f.path}"): _*)
          .repartition(nBins), root)
      }
    commit(spark, root, keeps ++ newFiles, basedOn = Some(head))
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

  /** Retention pass (the real formats' VACUUM): keep the newest
    * `keepVersions` manifests, delete the older manifests and every data
    * file they alone referenced, and sweep ORPHANS — commit-dir files
    * referenced by NO kept manifest (a crashed [[writeData]] before its
    * commit, a CAS loser's staging, or write markers like `_SUCCESS`) —
    * older than `orphanMinAgeMs` (the age guard protects a writer that
    * has staged files but not yet committed; production retention uses
    * hours, tests pass 0). Emptied commit dirs are removed. Time travel
    * older than the horizon is gone after this by design — that is what
    * the op is for (unbounded history is unbounded storage). Driver-side,
    * manifest-sized.
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
    old.foreach(v =>
      fs.delete(new Path(s"$root/_graft_log/v$v.manifest"), false))
    // sweep: any commit-dir file no kept manifest references, past the
    // in-flight-writer age guard (this covers old-version-only files,
    // crashed stagings AND non-data markers like _SUCCESS, so emptied
    // commit dirs actually empty out and get removed)
    val now = System.currentTimeMillis()
    // exactly the commit-dir shape writeData produces — never sweep
    // unrelated directories a user parked under the root
    fs.listStatus(rootP).filter(s =>
        s.isDirectory && s.getPath.getName.matches("c[0-9a-f]{32}")).foreach { d =>
      fs.listStatus(d.getPath).foreach { f =>
        val rel = s"${d.getPath.getName}/${f.getPath.getName}"
        if (f.isFile && !referenced.contains(rel) &&
            now - f.getModificationTime >= orphanMinAgeMs)
          fs.delete(f.getPath, false)
      }
      if (fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, false)
    }
  }

  /** One micro-batch of [[appendStream]] — EXACTLY-ONCE by committing the
    * epoch token ATOMICALLY with the file list (`#epoch:<id>` manifest
    * metadata): a replayed epoch is detected from the committed manifests
    * themselves, so the crash window a side-file marker would leave
    * (commit lands, marker doesn't, replay re-appends) cannot duplicate
    * rows — appends are NOT idempotent, so the token must ride in the
    * commit. A marker file is still written as a fast-path cache of "this
    * epoch committed"; losing it merely costs the manifest scan. The
    * batch's data files are staged ONCE; only the manifest commit retries
    * on [[CommitConflictException]] (appends commute, and re-staging
    * would orphan the first attempt's files).
    */
  def appendBatch(batch: DataFrame, batchId: Long, root: String,
      casRetries: Int = 5): Unit = {
    val spark = batch.sparkSession
    val marker = new Path(s"$root/_graft_log/epochs/epoch-$batchId")
    val fs = fsOf(spark, marker)
    val token = s"epoch:$batchId"
    def alreadyCommitted: Boolean =
      versions(spark, root).exists(v =>
        manifestMeta(spark, root, Some(v)).contains(token))
    if (!fs.exists(marker) && !alreadyCommitted) {
      val staged = writeData(batch, root)
      var attempt = 0
      var done = false
      while (!done) {
        try {
          appendEntries(spark, root, staged, meta = Seq(token)); done = true
        } catch {
          case e: CommitConflictException if attempt < casRetries =>
            attempt += 1
            org.slf4j.LoggerFactory.getLogger("graft.sources.TableLog")
              .warn(s"append epoch $batchId lost the commit CAS " +
                s"(attempt $attempt/$casRetries), re-reading head: $e")
        }
      }
    }
    fs.mkdirs(marker.getParent)
    if (!fs.exists(marker)) fs.create(marker, true).close()
  }

  /** Continuous micro-batch APPEND into a logged table — the streaming
    * sink whose every batch becomes one atomic snapshot commit (readers
    * see whole batches or nothing; no in-progress files ever visible,
    * unlike a raw parquet directory sink), with the epoch-in-manifest
    * exactly-once contract of [[appendBatch]].
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
