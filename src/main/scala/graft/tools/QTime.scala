package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time declared queries `reps` times each in one warm session
  * and print each run + the min (the stable signal — bench-JVM variance at
  * small scale swamps single-shot numbers).
  * Usage: runMain graft.tools.QTime <query> [<query> ...] [reps]
  * (trailing integer arg = reps; every other arg is a query name)
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val (names, reps) =
      if (args.length > 1 && args.last.forall(_.isDigit))
        (args.dropRight(1).toSeq, args.last.toInt)
      else (args.toSeq, 3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm: parquet footers, codegen
      fn(spark, d).write.format("noop").mode("overwrite").save()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: runs=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
