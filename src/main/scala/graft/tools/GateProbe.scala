package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print boolean-gate query outputs at a given sf dir. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    args.drop(1).foreach { q =>
      println(s"== $q ==")
      graft.SparkEntry.queries(q)(spark, d).show(50, false)
    }
    spark.stop()
  }
}
