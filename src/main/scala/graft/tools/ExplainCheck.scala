package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or more declared
  * queries — the "is this the plan I'd want at 100 TB" feedback loop.
  * Usage: runMain graft.tools.ExplainCheck q34_asof_join [q38_range_join ...]
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    // withExtensions: without the session extensions the dumped plans lack
    // the injected rules (TopKRewrite, the graftlog insert/DV rules) and
    // would NOT be the plans Bench runs (r16 fix)
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"=== $n ===")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
