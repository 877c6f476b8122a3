package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the r17 parsed-manifest cache: runs the graftlog-heavy
  * declared queries and the streaming funnel, printing how many log files
  * were READ+PARSED vs served from [[graft.sources.TableLog]]'s cache —
  * the evidence for the "one parse per version per JVM" claim. Args follow
  * KernelProbe's convention: arg 1 = data dir (default $SPARK_GRAFT_SF_DIR
  * or sf0.1); core count from $SPARK_GRAFT_CPUS.
  */
object LogReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.TableLog
    for (q <- Seq("q219_log_tail_funnel", "q214_log_checkpoints",
        "q216_partitioned_log", "q211_time_travel", "q223_log_history",
        "q195_streaming_curation")) {
      val r0 = TableLog.manifestReadTally.get()
      val h0 = TableLog.manifestCacheHitTally.get()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[log-probe] $q%-28s wall=$wall%6.2f s  " +
        s"parses=${TableLog.manifestReadTally.get() - r0}  " +
        s"cacheHits=${TableLog.manifestCacheHitTally.get() - h0}")
    }
    spark.stop()
  }
}
