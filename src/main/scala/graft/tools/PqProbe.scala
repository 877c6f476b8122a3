package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}

/** Dev-only: measure PQ recall@10 across sf to set the q86 gate floor. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val emb = graft.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val bf = Similarity.bruteForceKnn(emb, col("vec_id") < 5, k = 10)
        .select(col("qid"), col("vec_id"))
      for ((cb, os, ti) <- Seq((256, 16, 0), (256, 16, 5), (256, 8, 5))) {
        val pq = Quantize.pqKnn(emb, col("vec_id") < 5, k = 10, codebookSize = cb, oversample = os, trainIters = ti)
          .select(col("qid"), col("vec_id"))
        val n = bf.count(); val hit = bf.join(pq, Seq("qid", "vec_id")).count()
        println(f"$sf cb=$cb os=$os ti=$ti recall@10 = ${hit.toDouble / n}%.3f ($hit/$n)")
      }
      for ((cells, np) <- Seq((64, 8), (64, 16))) {
        val ivfpq = Quantize.ivfPqKnn(emb, col("vec_id") < 5, k = 10,
            cells = cells, nprobe = np).select(col("qid"), col("vec_id"))
        val n = bf.count(); val hit = bf.join(ivfpq, Seq("qid", "vec_id")).count()
        println(f"$sf ivfpq cells=$cells nprobe=$np recall@10 = ${hit.toDouble / n}%.3f ($hit/$n)")
      }
    }
    spark.stop()
  }
}
