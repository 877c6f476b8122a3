package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time one query N times warm. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
