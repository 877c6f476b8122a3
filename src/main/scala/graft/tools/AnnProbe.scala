package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dev-only probe: prints ANN recall numbers per scale factor so the q44
  * quality-gate floors are set from measurements, not guesses.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def topk(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getAs[Long]("qid"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val exact = topk(Similarity.bruteForceKnn(emb, col("vec_id") < 5, k = 10))
      def recall(m: Map[Long, Set[Long]]): Double = {
        val rs = exact.map { case (q, ids) =>
          m.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size }
        rs.sum / rs.size
      }
      val lsh = recall(topk(Similarity.lshKnn(emb, col("vec_id") < 5, k = 10)))
      val ivf = recall(topk(Similarity.ivfKnn(emb, col("vec_id") < 5, k = 10)))
      val exactPairs = Similarity.cosineDupPairs(emb, threshold = 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshPairs = Similarity.cosineDupPairsLsh(emb, threshold = 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dupRecall = lshPairs.intersect(exactPairs).size.toDouble / math.max(1, exactPairs.size)
      val docs = graft.Tables.load(spark, dir, "documents")
      val mh = Dedup.minhashNearDups(docs, col("doc_id"), col("text")).count()
      println(f"$sf: lsh_knn=$lsh%.3f ivf_knn=$ivf%.3f dup_recall=$dupRecall%.3f " +
        f"(exact_pairs=${exactPairs.size} lsh_pairs=${lshPairs.size}) minhash_verified_pairs=$mh")
    }
    spark.stop()
  }
}
