package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.MemoryReplay

/** Streaming state-store audit (VERDICT r8 Next #7): run every streaming
  * gate query over its tape and record the state operators' final
  * (rows, bytes) from the last `StreamingQueryProgress` — the artifact
  * that says which families carry KEY-BOUNDED state (safe at any tape
  * length) versus CONTENT-GROWING state (the 100 TB watch items: dedup
  * fingerprints, band indexes) at the end of the replay. Per-family rows
  * land in BASELINE.md.
  *
  * Usage: StreamStateProbe [sfDir] — defaults to sf0.1.
  */
object StreamStateProbe {

  /** every MemoryReplay-gated query in SparkEntry */
  val FAMILIES: Seq[String] = Seq(
    "q55_streaming_pnl", "q56_streaming_sma", "q63_streaming_window",
    "q68_streaming_session", "q70_streaming_sliding",
    "q71_streaming_interval_join", "q75_streaming_neardup",
    "q80_streaming_dedup", "q85_streaming_latest",
    "q105_streaming_ewma", "q110_streaming_bars", "q112_streaming_scd2",
    "q122_streaming_anomaly", "q162_streaming_heavy_hitters",
    "q183_streaming_gaps", "q186_streaming_drawdown")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"[state-probe] sf=$sfDir")
    FAMILIES.foreach { name =>
      MemoryReplay.lastStateStats = Nil
      val n =
        try graft.SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          println(s"[state-probe] $name FAILED: ${e.getMessage}"); -1L }
      MemoryReplay.lastStateStats match {
        case Nil =>
          println(f"[state-probe] $name%-32s out=$n%7d  (stateless or no progress captured)")
        case ops => ops.foreach { case (op, rows, bytes) =>
          println(f"[state-probe] $name%-32s out=$n%7d  state: $op rows=$rows bytes=$bytes")
        }
      }
    }
    spark.stop()
  }
}
