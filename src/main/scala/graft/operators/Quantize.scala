package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns — the memory/bandwidth
  * rung below exact doubles on the similarity ladder: a 64-dim float vector
  * (256 B) becomes 64 int8 codes + one scale (~72 B at rest), and candidate
  * scoring becomes an exact integer dot (associative, overflow-free — see
  * [[graft.functions.DotProductL]]) times two scales. At 100 TB this is the
  * difference between shuffling/caching the corpus' vectors and a ~4×
  * smaller sketch of them; rescoring the surviving candidates with the
  * full-precision vectors (fetched by id) recovers exact ordering.
  *
  * Codec (deterministic, engine-portable — mirrored op-for-op by the q78
  * DuckDB oracle):
  *   amax  = max_j |v_j|            (exact float→double casts)
  *   scale = amax / 127.0
  *   code_j = floor(v_j / scale + 0.5)   ∈ [-127, 127]   (zero vector → 0s)
  * `floor(x + 0.5)` (round-half-up) rather than `round()`: both engines
  * floor identically on doubles, while round()'s half-case convention is
  * library-defined. Codes ride as array<bigint> in-plan (Spark's floor
  * type); at rest a writer would pack them to tinyint/binary.
  */
object Quantize {

  /** (vec_id, scale, codes) for every row of `emb`. Pure codegen'd column
    * map over the scan — no shuffle, no driver probe.
    */
  def quantize(emb: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    val v = Similarity.toDouble(vecCol)
    val amax = array_max(transform(v, abs(_)))
    val scale = amax / lit(127.0)
    emb.select(
      idCol.as("vec_id"),
      when(amax === 0.0, lit(0.0)).otherwise(scale).as("scale"),
      when(amax === 0.0, transform(v, _ => lit(0L)))
        .otherwise(transform(v, x => floor(x / scale + lit(0.5)).cast("long")))
        .as("codes"))
  }

  /** Approximate top-k by quantized score, exact-rescored: per query, the
    * top `k·oversample` candidates by `scale_q·scale_v·graft_doti(codes)`
    * (integer dot — exact, order-independent) survive to an exact cosine
    * rescore over the full-precision vectors, fetched by id. Output shape
    * matches [[Similarity.bruteForceKnn]]: (qid, vec_id, score, rn) with
    * bit-identical scores on every returned pair (the rescore runs the same
    * [[graft.functions.DotProductD]] arithmetic).
    *
    * Scale shape: the corpus is scanned once through the quantized
    * projection (≈4× less data than the double vectors); the candidate
    * top-k·oversample runs through the bounded graft_topk aggregate
    * (map-side partial, ≤ k·oversample rows per query per partition on the
    * exchange); only candidates' full vectors are fetched for the rescore.
    * Quality contract: recall@k vs brute force is gated in q79 (the int8
    * approximation's rank error is what oversampling absorbs).
    */
  def quantizedKnn(emb: DataFrame, queryPred: Column, k: Int,
      oversample: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val quant = quantize(emb, col("vec_id"), col("embedding"))
    val q = quant.where(queryPred)
      .select(col("vec_id").as("qid"), col("scale").as("q_scale"),
        col("codes").as("q_codes"))
    // broadcast the (few) quantized queries; the corpus side never shuffles
    // until the bounded per-query top-k aggregate
    val approx = broadcast(q).join(quant, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (col("q_scale") * col("scale") *
          call_function("graft_doti", col("q_codes"), col("codes"))
            .cast("double")).as("score"))
    val cand = approx
      .groupBy(col("qid"))
      .agg(call_function("graft_topk",
        struct(col("score"), (-col("vec_id")).as("nid"), col("vec_id").as("vec_id")),
        lit(k * oversample)).as("top"))
      .select(col("qid"), explode(col("top.vec_id")).as("vec_id"))
    // exact rescore of the surviving sliver only
    val e = emb.select(col("vec_id"),
        Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val qe = e.where(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    Similarity.topkOf(cand
      .join(broadcast(qe), Seq("qid"))
      .join(e, Seq("vec_id"))
      .withColumn("score", Similarity.cosine(col("qv"), col("v"),
        col("qnrm"), col("nrm"))), k)
  }
}
