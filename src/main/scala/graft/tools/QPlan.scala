package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a declared query's formatted physical plan — the explain-audit
  * loop the scale review runs after every operator lands. */
object QPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.explain("formatted")
    spark.stop()
  }
}
