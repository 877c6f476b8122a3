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
}
