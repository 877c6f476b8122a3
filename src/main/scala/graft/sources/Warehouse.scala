package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * skips (poor man's clustering). Writes to a temp sibling then swaps, so
    * a reader never sees a half-compacted directory; the swap is the same
    * last-wins visibility contract as the dynamic-partition-overwrite sinks.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20,
      sortCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1, (bytes / BigInt(targetBytes)).toInt +
      (if (bytes % BigInt(targetBytes) > 0) 1 else 0))
    val arranged = sortCol.fold(df.repartition(n))(c => df.repartitionByRange(n, col(c)))
    val tmp = path + "__compacting"
    arranged.write.mode("overwrite").parquet(tmp)
    val fs = new java.io.File(path)
    val bak = new java.io.File(path + "__old")
    if (!fs.renameTo(bak)) throw new java.io.IOException(s"cannot swap $path")
    if (!new java.io.File(tmp).renameTo(fs)) {
      bak.renameTo(fs) // roll back visibility before failing
      throw new java.io.IOException(s"cannot publish compacted $path")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(bak)
  }
}
