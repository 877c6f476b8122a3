package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for quick empirical checks; not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.orderBy(col("event_id")).show(3, truncate = false)
    // ANSI checks
    li.filter(col("l_shipdate") < to_timestamp(lit("1995-09-01 00:00:00")))
      .agg(count(lit(1))).show()
    ev.select(concat(lit("H"), pmod(col("user_id"), lit(4)).cast("string"))).show(2)
    ev.select(unix_timestamp(col("ts"))).show(2)
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    em.printSchema()
    spark.stop()
  }
}
