package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (r16 optimization): decompose the minhash/LSH
  * scan-side kernel cost — shingles vs lane loop vs bands vs explode — and
  * the effect of scan parallelism. Dev-only; numbers land in
  * OPTIMIZATION_r16.md.
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kernel-probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"[kernel-probe] partitions = ${docs.rdd.getNumPartitions}, rows = ${docs.count()}")
    // warm
    noop(docs)

    t("shingles only")(noop(docs.select(
      call_function("graft_shingles", col("text"), lit(3)).as("sh"))))
    t("shingles only x2")(noop(docs.select(
      call_function("graft_shingles", col("text"), lit(3)).as("sh"))))
    t("minhash32")(noop(docs.select(
      call_function("graft_minhash",
        call_function("graft_shingles", col("text"), lit(3)), lit(32)).as("sig"))))
    t("minhash128")(noop(docs.select(
      call_function("graft_minhash",
        call_function("graft_shingles", col("text"), lit(3)), lit(128)).as("sig"))))
    t("minhash128 x2")(noop(docs.select(
      call_function("graft_minhash",
        call_function("graft_shingles", col("text"), lit(3)), lit(128)).as("sig"))))
    t("minhash128 + bands64")(noop(docs.select(
      graft.functions.Text.bands(
        call_function("graft_minhash",
          call_function("graft_shingles", col("text"), lit(3)), lit(128)),
        64, 2).as("bands"))))
    t("minhash128 + bands64 + explode")(noop(docs.select(col("doc_id"),
      explode(graft.functions.Text.bands(
        call_function("graft_minhash",
          call_function("graft_shingles", col("text"), lit(3)), lit(128)),
        64, 2)).as("band"))))
    val docs32 = docs.repartition(32).localCheckpoint()
    t("minhash128 + bands64 + explode REPART32")(noop(docs32.select(col("doc_id"),
      explode(graft.functions.Text.bands(
        call_function("graft_minhash",
          call_function("graft_shingles", col("text"), lit(3)), lit(128)),
        64, 2)).as("band"))))
    // stage-1 flags: duplication check (graft_stage1 must appear ONCE in
    // the optimized plan) + timing vs the old five-HOF spelling
    val flags = graft.operators.Pipeline.stageOneFlags(
      docs.withColumn("is_bench", col("doc_id") % 10 === 0))
    val plan = flags.queryExecution.optimizedPlan.toString
    val occurrences = "graft_stage1".r.findAllIn(plan).length
    println(s"[kernel-probe] graft_stage1 occurrences in optimized plan = $occurrences")
    t("stageOneFlags native (1 pass)")(noop(flags))
    t("stageOneFlags native x2")(noop(graft.operators.Pipeline.stageOneFlags(
      docs.withColumn("is_bench", col("doc_id") % 10 === 0))))
    val oldFlags = docs
      .withColumn("n_tokens", expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"))
      .withColumn("n_stop", expr("CAST(size(filter(split(text, ' '), x -> array_contains(array('the','a','of','and','to','in','is'), x))) AS BIGINT)"))
      .withColumn("en_hits", expr("CAST(size(filter(split(lower(text), ' '), x -> array_contains(array('the','and','of','is','to'), x))) AS BIGINT)"))
      .withColumn("es_hits", expr("CAST(size(filter(split(lower(text), ' '), x -> array_contains(array('el','la','de','que','y','los'), x))) AS BIGINT)"))
      .withColumn("de_hits", expr("CAST(size(filter(split(lower(text), ' '), x -> array_contains(array('der','die','das','und','ist'), x))) AS BIGINT)"))
    t("stageOneFlags OLD five-HOF spelling")(noop(oldFlags))
    spark.stop()
  }
}
