package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only scratch main for quick empirical checks; not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // simhash-vs-minhash cross-sketch stats per sf: how many verified
    // near-dup pairs exist at J>=0.5 / J>=0.9, and what fraction of each
    // simhash (hamming<=3) recovers — to set q44's gate floors.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val docs = graft.Tables.load(spark, d, "documents")
      val mh = Dedup.minhashNearDups(docs, col("doc_id"), col("text")).cache()
      val sp = Dedup.simhashPairs(docs, col("doc_id"), col("text")).cache()
      val n5 = mh.count()
      val n9 = mh.filter(col("jaccard") >= 0.9).count()
      val spN = sp.count()
      val hit5 = mh.join(sp, Seq("doc_a", "doc_b"), "left_semi").count()
      val hit9 = mh.filter(col("jaccard") >= 0.9)
        .join(sp, Seq("doc_a", "doc_b"), "left_semi").count()
      // simhash pairs that are true near-dups at J>=0.5
      val spTrue = sp.join(mh, Seq("doc_a", "doc_b"), "left_semi").count()
      println(s"[scratch] $sf: mhJ05=$n5 mhJ09=$n9 simhash=$spN " +
        s"hitJ05=$hit5 hitJ09=$hit9 spTrue=$spTrue")
      mh.unpersist(); sp.unpersist()
    }
    spark.stop()
  }
}
