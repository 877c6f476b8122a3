package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CurationStream, MemoryReplay, StreamingOps}
import graft.operators.Pipeline

/** Per-stage wall breakdown of the q195/q196 funnel gates — where do the
  * 16-19 s go: the streaming replays (gate-contract cost), the batch glue
  * (collect/localCheckpoint/joins), or a fixable hot spot?
  *
  * Usage: FunnelProbe [sfDir]
  */
object FunnelProbe {
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
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[funnel-probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
    // warm the session so stage walls aren't codegen-dominated
    docs.count()

    val base = docs.select(col("doc_id"), col("text"),
      (col("doc_id") % 10 === 0).as("is_bench"))
    val flagged = t("s1: flags + localCheckpoint") {
      Pipeline.stageOneFlags(base).localCheckpoint()
    }
    val candidates = flagged.filter(!col("is_bench"))
    val tape1 = t("s2: tape collect") {
      candidates.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
    }
    val exactFlags = t("s2: exactKeep REPLAY") {
      MemoryReplay.replay(spark, tape1, 4)(ds =>
        CurationStream.exactKeepStream(
          Pipeline.stageOneFlags(ds.toDF("doc_id", "text"))
            .filter(col("lang_ok") && col("quality_ok")),
          "doc_id", "text"))
        .toDF("doc_id", "exact_keep").localCheckpoint()
    }
    val s2 = t("s3: s2 join + localCheckpoint") {
      candidates.join(exactFlags.filter(col("exact_keep")).select("doc_id"),
        Seq("doc_id")).select(col("doc_id"), col("text")).localCheckpoint()
    }
    val tape2 = s2.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val s2Sets = t("s3: shingleStore + localCheckpoint") {
      CurationStream.shingleStore(s2, col("doc_id"), col("text")).localCheckpoint()
    }
    val drops = t("s3: nearDup REPLAY (64 bands)") {
      MemoryReplay.replay(spark, tape2, 4)(ds =>
        CurationStream.nearDupDropsStream(ds.toDF("doc_id", "text"),
            "doc_id", "text", storeSets = s2Sets)
          .select(col("doc_a"), col("doc_b")).as[(Long, Long)])
        .toDF("doc_a", "doc_b").select(col("doc_b").as("doc_id")).distinct()
        .localCheckpoint()
    }
    // how much of the near-dup replay is the BAND STATE OP alone vs the
    // verify join riding the same query?
    t("s3: candidates-only REPLAY (no verify)") {
      MemoryReplay.replay(spark, tape2, 4)(ds =>
        StreamingOps.nearDupCandidatesStream(ds.toDF("doc_id", "text"),
          "doc_id", "text", 3, 128, 64, 10000)).count()
    }
    t("s3: candidates-only, q75 geometry (8 bands)") {
      MemoryReplay.replay(spark, tape2, 4)(ds =>
        StreamingOps.nearDupCandidatesStream(ds.toDF("doc_id", "text"),
          "doc_id", "text", 3, 32, 8, 10000)).count()
    }
    // DECOMPOSE the 128/64 replay: scan-side hash cost vs micro-batch
    // machinery vs the state op itself
    t("s3-x: BATCH minhash128+bands64 explode") {
      s2.select(col("doc_id"),
          explode(graft.functions.Text.bands(
            call_function("graft_minhash",
              call_function("graft_shingles", col("text"), lit(3)),
              lit(128)), 64, 2)).as("band"))
        .write.format("noop").mode("overwrite").save()
    }
    t("s3-x: REPLAY stateless minhash128+bands64") {
      MemoryReplay.replay(spark, tape2, 4)(ds =>
        ds.toDF("doc_id", "text").select(col("doc_id").cast("long").as("d"),
            explode(graft.functions.Text.bands(
              call_function("graft_minhash",
                call_function("graft_shingles", col("text"), lit(3)),
                lit(128)), 64, 2)).as("band"))
          .as[(Long, Long)]).count()
    }
    t("s3-x: REPLAY 128/64 statePartitions=32") {
      MemoryReplay.replay(spark, tape2, 4, statePartitions = 32)(ds =>
        StreamingOps.nearDupCandidatesStream(ds.toDF("doc_id", "text"),
          "doc_id", "text", 3, 128, 64, 10000)).count()
    }
    t("s3-x: REPLAY 128/64 1 batch") {
      MemoryReplay.replay(spark, tape2, 1)(ds =>
        StreamingOps.nearDupCandidatesStream(ds.toDF("doc_id", "text"),
          "doc_id", "text", 3, 128, 64, 10000)).count()
    }
    t("s3-x: REPLAY 128/64 2nd time (warm)") {
      MemoryReplay.replay(spark, tape2, 4)(ds =>
        StreamingOps.nearDupCandidatesStream(ds.toDF("doc_id", "text"),
          "doc_id", "text", 3, 128, 64, 10000)).count()
    }
    val s3 = s2.join(drops.withColumn("_d", lit(true)), Seq("doc_id"), "left")
      .filter(col("_d").isNull).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val tape3 = s3.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val benchHashes = base.filter(col("is_bench"))
      .select(explode(call_function("graft_shingles", col("text"), lit(3))).as("s"))
      .select(xxhash64(col("s")).as("sk")).distinct().localCheckpoint()
    t("s4: decontam REPLAY") {
      MemoryReplay.replay(spark, tape3, 4,
          mode = org.apache.spark.sql.streaming.OutputMode.Update())(ds =>
        CurationStream.decontamHitsStream(ds.toDF("doc_id", "text"),
          "doc_id", "text", benchHashes).as[(Long, Long, Long)]).count()
    }
    t("TOTAL q195 (one rep, via SparkEntry)") {
      graft.SparkEntry.queries("q195_streaming_curation")(spark, sfDir).count()
    }
    t("TOTAL q196 (one rep, via SparkEntry)") {
      graft.SparkEntry.queries("q196_streaming_curation_ttl")(spark, sfDir).count()
    }
    spark.stop()
  }
}
