package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Scratch probe (r16 optimization): where does the ~2 s fixed cost of a
  * MemoryReplay go — query start, per-micro-batch machinery, state store
  * commits, checkpoint I/O? Variations: stateless vs stateful, batch
  * count, state partitions, checkpoint on /tmp vs /dev/shm.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stream-probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val tape = (1L to 20000L).toSeq

    def run(label: String, nBatches: Int, statePartitions: Int,
        stateful: Boolean, ckptDir: Option[String]): Unit = {
      val chunk = math.max(1, (tape.size + nBatches - 1) / nBatches)
      val chunks = tape.grouped(chunk).toSeq
      val input = MemoryStream[Long]
      val name = s"sp_${System.nanoTime()}"
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      val ds = if (stateful) {
        input.toDS().groupByKey(_ % 997)
          .flatMapGroupsWithState[Long, Long](OutputMode.Append(),
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
            case (_, it, st) =>
              val s = st.getOption.getOrElse(0L) + it.size
              st.update(s); Iterator.single(s)
          }
      } else input.toDS().map(_ + 1)
      val w0 = ds.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
      val w = ckptDir.fold(w0)(d => w0.option("checkpointLocation",
        s"$d/ckpt_$name"))
      val tStart = System.nanoTime()
      val query = w.start()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val startS = (System.nanoTime() - tStart) / 1e9
      val batchTimes = chunks.map { c =>
        val t0 = System.nanoTime()
        input.addData(c)
        query.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      val tStop = System.nanoTime()
      query.stop()
      val stopS = (System.nanoTime() - tStop) / 1e9
      spark.catalog.dropTempView(name)
      println(f"[stream-probe] $label%-52s start $startS%5.2f  batches ${batchTimes.map(x => f"$x%.2f").mkString(" ")}  stop $stopS%5.2f")
      ckptDir.foreach { d =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); () }
        rm(new java.io.File(s"$d/ckpt_$name"))
      }
    }

    // warm the streaming machinery once
    run("warmup stateless 4b/8p", 4, 8, stateful = false, None)
    run("stateless 4 batches, 8 parts, tmp ckpt", 4, 8, stateful = false, None)
    run("stateful  4 batches, 8 parts, tmp ckpt", 4, 8, stateful = true, None)
    run("stateful  4 batches, 8 parts, tmp ckpt (x2)", 4, 8, stateful = true, None)
    run("stateful  4 batches, 8 parts, shm ckpt", 4, 8, stateful = true, Some("/dev/shm"))
    run("stateful  4 batches, 2 parts, tmp ckpt", 4, 2, stateful = true, None)
    run("stateful  4 batches, 32 parts, tmp ckpt", 4, 32, stateful = true, None)
    run("stateful  1 batch,   8 parts, tmp ckpt", 1, 8, stateful = true, None)
    run("stateful  8 batches, 8 parts, tmp ckpt", 8, 8, stateful = true, None)
    for (i <- 1 to 3) {
      run(s"stateful  4 batches, 4 parts, tmp ckpt (#$i)", 4, 4, stateful = true, None)
      run(s"stateful  4 batches, 2 parts, tmp ckpt (#$i)", 4, 2, stateful = true, None)
      run(s"stateful  4 batches, 8 parts, tmp ckpt (#$i)", 4, 8, stateful = true, None)
    }
    spark.stop()
  }
}
