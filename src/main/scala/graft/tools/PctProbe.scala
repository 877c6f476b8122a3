package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PctProbe {
  def main(args: Array[String]): Unit = {
    // args/env like KernelProbe (r16 ADVICE: a probe that hardcodes the
    // data dir and core count measures nothing comparable elsewhere)
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pct-probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).localCheckpoint()
    println(s"[pct-probe] rows = ${li.count()}")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (acc <- Seq(10000, 10000, 1000, 100)) {
      t(s"percentile_approx acc=$acc") {
        noop(li.groupBy(col("l_returnflag")).agg(
          expr(s"percentile_approx(l_extendedprice, array(0.4998D,0.5002D), $acc)")))
      }
    }
    for (acc <- Seq(10000, 1000, 100)) {
      t(s"Percentiles.exact acc=$acc (median per flag)") {
        noop(graft.operators.Percentiles.exact(li, col("l_returnflag"),
          col("l_extendedprice"), Seq(("med", 0.5)), accuracy = acc))
      }
    }
    spark.stop()
  }
}
