package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    // keep test-run droppings out of the repo root: Derby (JdbcSinkSpec)
    // writes derby.log to CWD unless told otherwise, and the catalog
    // default warehouse lands at ./spark-warehouse — both belong in target/
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Regular files under the context's EFFECTIVE checkpoint dir. The
    * checkpoint-dir operators follow set-only-when-unset (an earlier
    * operator's dir wins for the whole shared session), so specs asserting
    * "reliable checkpointing wrote data" must look at the dir the context
    * actually points to, not the one they passed.
    */
  def effectiveCheckpointFiles(): Long = {
    val eff = spark.sparkContext.getCheckpointDir.getOrElse(
      throw new IllegalStateException("no checkpoint dir configured"))
    val p = java.nio.file.Paths.get(
      if (eff.startsWith("file:")) new java.net.URI(eff).getPath else eff)
    java.nio.file.Files.walk(p)
      .filter(java.nio.file.Files.isRegularFile(_)).count()
  }
}
