package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe for the q192 TTL gate design: per sf, the LSH band-join
  * candidate pairs' id-POSITION distance distribution under the natural
  * id-order tape (ts = position · 1 s), so the gate's TTL can be fixed
  * where BOTH regimes are non-empty at every scale — pairs inside the TTL
  * window (the stream must emit them) and pairs beyond it (the stream must
  * NOT emit them, proving eviction engaged).
  */
object TtlProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val docs = graft.Tables.load(spark, s"/root/testdata/$sf", "documents")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val pairs = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
          threshold = 0.0)
        .select(col("doc_a"), col("doc_b"))
      // position = rank of doc_id ascending (ids may be non-contiguous)
      val pos = docs.select(col("doc_id"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id")) - 1)
      val withPos = pairs
        .join(pos.select(col("doc_id").as("doc_a"), col("pos").as("pa")), Seq("doc_a"))
        .join(pos.select(col("doc_id").as("doc_b"), col("pos").as("pb")), Seq("doc_b"))
        .select(abs(col("pa") - col("pb")).as("dpos"))
      val q = withPos.agg(count(lit(1)).as("n_pairs"),
        min("dpos").as("min"), max("dpos").as("max"),
        expr("percentile_approx(dpos, array(0.1,0.25,0.5,0.75,0.9))").as("pcts"),
        count(when(col("dpos") <= n / 4, 1)).as("n_within_q"),
        count(when(col("dpos") > n / 4, 1)).as("n_beyond_q"),
        count(when(col("dpos") <= n / 8, 1)).as("n_within_8th"),
        count(when(col("dpos") > n / 8, 1)).as("n_beyond_8th")).collect().head
      println(s"[ttlprobe] $sf n_docs=$n $q")
    }
    spark.stop()
  }
}
