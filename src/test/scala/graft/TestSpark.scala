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
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
