package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Bucketed warehouse tables — the co-located-join path for keys that are
  * joined repeatedly (SURVEY §4: orders⋈customer, fold tables keyed by
  * hub/account). Writing both sides bucketed on the join key by the same
  * bucket count lets every subsequent equi-join run with ZERO exchanges:
  * each bucket pair joins in place, which at 100 TB removes the dominant
  * shuffle from every repeat of the join. The cost is paid once at write
  * time (the bucket spec hashes rows to files).
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted managed table (parquet). Sorting
    * within buckets additionally enables sort-merge joins without a sort
    * step.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Write `df` hive-partitioned by `partCols`. At scale the win is
    * partition pruning: a filter on a partition column prunes whole
    * directories at planning time, so a hub- or day-scoped query reads
    * only its slice of a 100 TB table — the scan's `PartitionFilters`
    * (asserted in WarehouseSpec) instead of a post-scan row filter.
    * Partition columns must be coarse (hub, date) — one directory per
    * value; never partition by a high-cardinality key.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Compact a parquet directory's small files — the maintenance pass every
    * streaming sink needs: micro-batch appends (IngestJobs.writeTable et al)
    * leave one file per batch per task, and a 100 TB table fed at a 10 s
    * checkpoint cadence accumulates millions of footer-sized files whose
    * open/seek overhead eventually dominates every scan.
    *
    * `sortCol` picks the layout: None → coalesce-style rewrite into
    * ~`targetBytes` files (no shuffle beyond AQE's rebalance); Some(col) →
    * `repartitionByRange` on that column, so each output file covers a tight
    * key range and min/max footer stats turn point/range filters into file
    * skips (poor man's clustering).
    *
    * Visibility contract — honest version: the write goes to a temp sibling
    * and is published by a two-rename swap (path→__old, __compacting→path),
    * so a reader never sees a HALF-compacted directory — but between the two
    * renames there is a window where the directory does not exist at all and
    * a concurrent reader errors, and `java.io.File.renameTo` limits this
    * implementation to the local filesystem. On a real deployment the flip
    * belongs behind a metastore/table-format pointer swap (the atomic-commit
    * problem Iceberg/Delta exist to solve); this local form is the
    * maintenance pass for the sandbox warehouse. A crash between the renames
    * leaves only `__old`; the next compact run recovers it (restore-then-
    * compact) and clears any stale `__compacting`/`__old` leftovers.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20,
      sortCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    recoverSwap(path)
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1, (bytes / BigInt(targetBytes)).toInt +
      (if (bytes % BigInt(targetBytes) > 0) 1 else 0))
    val arranged = sortCol.fold(df.repartition(n))(c => df.repartitionByRange(n, col(c)))
    publishSwap(arranged, path)
  }

  /** Write `arranged` to the temp sibling and publish via the two-rename
    * swap (see [[compact]]'s scaladoc for the visibility contract).
    */
  private def publishSwap(arranged: DataFrame, path: String): Unit = {
    val tmp = path + "__compacting"
    arranged.write.mode("overwrite").parquet(tmp)
    val fs = new java.io.File(path)
    val bak = new java.io.File(path + "__old")
    if (!fs.renameTo(bak)) throw new java.io.IOException(s"cannot swap $path")
    if (!new java.io.File(tmp).renameTo(fs)) {
      bak.renameTo(fs) // roll back visibility before failing
      throw new java.io.IOException(s"cannot publish compacted $path")
    }
    rmTree(bak)
  }

  /** Crash recovery from a previous interrupted swap: if only the __old
    * backup survives, restore it; clear stale temp/backup dirs so the
    * renames can't collide.
    */
  private def recoverSwap(path: String): Unit = {
    val cur = new java.io.File(path)
    val oldBak = new java.io.File(path + "__old")
    val stale = new java.io.File(path + "__compacting")
    if (!cur.exists() && oldBak.exists() && !oldBak.renameTo(cur))
      throw new java.io.IOException(s"cannot restore $path from __old backup")
    if (stale.exists()) rmTree(stale)
    if (oldBak.exists() && cur.exists()) rmTree(oldBak)
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** Real file-size manifest of a parquet directory: one row per data file
    * with (file_id, file, bytes) — file_id is the rank in lexicographic
    * name order, so the id is deterministic across runs over the same
    * directory. This is [[compactionPlan]]'s input surface; WarehouseSpec
    * drives it over real written footers. Listing goes through the Hadoop
    * `FileSystem` API resolved from the path — the same resolution Spark's
    * own file index uses — so the manifest works against file://, HDFS and
    * object stores alike (a `java.io.File` listing would silently return
    * nothing for any storage a 100 TB table actually lives on). Driver-
    * side and one small row per FILE, never per row of data: KB-to-MB
    * scale even for a 100 TB table.
    */
  def fileManifest(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .zipWithIndex
      .map { case (s0, i) => (i.toLong, s0.getPath.getName, s0.getLen) }
      .toDF("file_id", "file", "bytes")
  }

  /** Small-files compaction PLAN: given a (file_id, bytes) manifest, emit
    * one row per file with the maintenance decision —
    *   action = 'keep',    bin = −1  for files already ≥ targetBytes
    *            (rewriting them wastes IO: they are the size the rewrite
    *            aims for), and
    *   action = 'rewrite', bin = floor(exclusive-prefix-sum(bytes) /
    *            targetBytes) in file_id order for the small files —
    * budget-quantized next-fit bin packing through the SAME two-pass
    * prefix-sum machinery as training-shard packing
    * ([[graft.operators.Corpus.packShardsByCount]] — files by bytes are
    * just another unit stream with an integer cost). Guarantees: bin ids
    * are dense from 0, the bin count is exactly
    * ⌊(Σbytes − last_file_bytes)/target⌋ + 1 — within one of Σ/target
    * either way (amortized target-sized output) — and no bin exceeds
    * 2·target (a bin spans < 2 target-widths of prefix space and every
    * member is < target); an individual bin can undershoot when file
    * boundaries straddle its prefix range — the quantized-prefix trade
    * that keeps the plan ONE window expression instead of a sequential
    * first-fit fold. All-integer and SQL-expressible, which is what lets
    * the q200 gate hash-match a DuckDB window-sum re-derivation.
    *
    * At 100 TB this is a plan over file METADATA (millions of rows at
    * most); the expensive part — the rewrite — is [[compactByPlan]], and
    * splitting plan from execution is what lets an operator review or
    * throttle the rewrite set before burning cluster IO on it.
    */
  def compactionPlan(files: DataFrame, idCol: Column, bytesCol: Column,
      targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val f = files.select(idCol.cast("long").as("file_id"),
      bytesCol.cast("long").as("bytes"))
    val keeps = f.filter(col("bytes") >= targetBytes)
      .select(col("file_id"), col("bytes"),
        lit("keep").as("action"), lit(-1L).as("bin"))
    val small = f.filter(col("bytes") < targetBytes)
    val packs =
      if (small.isEmpty) // packShardsByCount needs ≥1 unit (max-id seed)
        small.select(col("file_id"), col("bytes"),
          lit("rewrite").as("action"), lit(-1L).as("bin"))
      else
        graft.operators.Corpus.packShardsByCount(small, col("file_id"),
            col("bytes"), targetBytes)
          .select(col("doc_id").as("file_id"), col("n_tok").as("bytes"),
            lit("rewrite").as("action"), col("shard").as("bin"))
    keeps.unionByName(packs)
  }

  /** Execute a [[compactionPlan]] against `path` into `outPath`: the
    * rewrite set is read back ONCE and written one file per bin
    * (`partitionBy(bin)` after a bin-keyed repartition: all of a bin's rows
    * reach one task, which writes exactly one file under `bin=N/`), keeps
    * are passed through by straight file copy. Returns the executed plan.
    * The driver-side pieces are manifest-sized (one element per FILE), so
    * this stays distributed where it matters — the data rewrite is one
    * Spark job whose shuffle carries only the small-file rows.
    */
  def compactByPlan(spark: SparkSession, path: String, targetBytes: Long,
      outPath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val manifest = fileManifest(spark, path)
    val plan = compactionPlan(manifest, col("file_id"), col("bytes"),
      targetBytes).localCheckpoint()
    val named = plan.join(manifest.select(col("file_id"), col("file")), Seq("file_id"))
    val hconf = spark.sessionState.newHadoopConf()
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val outFs = outP.getFileSystem(hconf)
    outFs.mkdirs(outP)
    val binOfFile = named.filter(col("action") === "rewrite")
      .select(col("file"), col("bin")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    if (binOfFile.nonEmpty) {
      import spark.implicits._
      val binMap = binOfFile.toDF("__file", "__bin")
      spark.read.parquet(binOfFile.map(f => s"$path/${f._1}"): _*)
        .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
        .join(broadcast(binMap), Seq("__file"))
        .drop("__file")
        .repartition(col("__bin"))
        .write.mode("overwrite").partitionBy("__bin")
        .parquet(s"$outPath/rewritten")
    }
    // keeps pass through by Hadoop-FS copy (works for file://, HDFS, object
    // stores — same reasoning as fileManifest; at real scale a metastore
    // pointer move replaces the copy, but the op must not silently no-op
    // off the local filesystem)
    named.filter(col("action") === "keep").select(col("file")).collect()
      .map(_.getString(0)).foreach { f =>
        val src = new org.apache.hadoop.fs.Path(s"$path/$f")
        org.apache.hadoop.fs.FileUtil.copy(
          src.getFileSystem(hconf), src, outFs,
          new org.apache.hadoop.fs.Path(s"$outPath/$f"),
          false, true, hconf)
      }
    plan
  }

  /** Morton/Z-value of two columns already scaled to `[0, 2^bits)` ints:
    * interleaves their low `bits` bits (a in the even positions, b in the
    * odd), so sorting by the result gives locality in BOTH dimensions —
    * the standard multi-column clustering key (Delta/Iceberg OPTIMIZE
    * ZORDER) that single-column range clustering can't provide. Pure
    * shift/mask arithmetic — codegen'd, and expressible identically in any
    * engine (the q93 oracle mirrors it).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** Min/max-scale `c` to an integer in `[0, 2^bits)` given the column's
    * (lo, hi) range (one tiny agg to fetch; constant-width buckets — swap
    * in quantile boundaries for heavily skewed columns).
    */
  def scaleToBits(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    import org.apache.spark.sql.functions.{floor, least, lit}
    val span = hi - lo
    if (span <= 0) lit(0L)
    else least(floor((c.cast("double") - lit(lo)) / lit(span) *
      lit((1L << bits).toDouble - 1.0)), lit((1L << bits) - 1L)).cast("long")
  }

  /** [[compact]] with TWO-dimensional clustering: rows are range-partitioned
    * by their z-value, so each output file covers a tight box in (colA,
    * colB) space and parquet footer min/max stats on BOTH columns turn 2-d
    * box predicates into file skips — single-column `sortCol` clustering
    * only ever skips on one axis. WarehouseSpec asserts the skip effect on
    * real footer ranges.
    */
  def compactZOrdered(spark: SparkSession, path: String,
      colA: String, colB: String, targetBytes: Long = 128L << 20,
      bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.{col, max, min}
    recoverSwap(path)
    val df = spark.read.parquet(path)
    val r = df.agg(min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1, (bytes / BigInt(targetBytes)).toInt +
      (if (bytes % BigInt(targetBytes) > 0) 1 else 0))
    val z = zValue(
      scaleToBits(col(colA), r.getDouble(0), r.getDouble(1), bits),
      scaleToBits(col(colB), r.getDouble(2), r.getDouble(3), bits), bits)
    val arranged = df.withColumn("__z", z)
      .repartitionByRange(n, col("__z")).drop("__z")
    publishSwap(arranged, path)
  }
}
