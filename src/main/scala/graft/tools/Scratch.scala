package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{MarketEvent, Pnl}
import graft.streaming.StreamingOps

/** Dev-only scratch main for quick empirical checks; not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Drive the dual-sink streaming pipeline end-to-end (SURVEY §3 E3)
    val events = Pnl.eventsAsMarket(graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .collect().toSeq.sortBy(e => (e.ts.getTime, e.seq))
    val out = java.nio.file.Files.createTempDirectory("pnl_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pnl_ckpt").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[MarketEvent]
    val q = StreamingOps.writePnlAndExposure(
      StreamingOps.pnlStream(input.toDS()), out, ckpt)
    events.grouped(400).foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    val pnl = spark.read.parquet(s"$out/positions_pnl")
    val exp = spark.read.parquet(s"$out/price_exposure")
    println(s"positions_pnl rows=${pnl.count()} cols=${pnl.columns.mkString(",")}")
    println(s"price_exposure rows=${exp.count()} cols=${exp.columns.mkString(",")}")
    val batch = Pnl.replay(events.toDS()).count()
    println(s"batch replay rows=$batch (must equal positions_pnl)")
    spark.stop()
  }
}
