package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Keyword retrieval scoring — the search-side face of the corpus: BM25,
  * the bag-of-words ranking function every lexical retrieval stack (Lucene,
  * Elasticsearch, training-data quality filters that score against a seed
  * query set) computes. Pure composed aggregates: one token explode for tf,
  * one tiny df/corpus-stats aggregate broadcast back — no per-doc state, no
  * shuffle wider than the (doc, term) tf rows.
  *
  * Determinism contract (the driver gate hashes doubles at 6 dp): corpus
  * stats avoid float summation order — `avgdl` is an exact BIGINT token sum
  * cast to double over an exact count; per-(doc, term) scores are pure
  * scalar arithmetic on (tf, df, len) integers, identical op-for-op in the
  * DuckDB oracle; nothing ranks by a double (callers order by doc_id or
  * feed [[Similarity.topkOf]] whose tie-break is the id).
  */
object Retrieval {

  /** Per-(doc, term) BM25 partial scores for `terms`. Output:
    * (doc_id, term, tf, df, n_tok, score) — one row per doc × matching
    * term; docs matching no term are absent (callers left-join a doc list
    * to zero-fill, as q81 does).
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (the Lucene/Robertson form —
    * always positive, unlike the raw log-odds which goes negative for terms
    * in more than half the corpus)
    * score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
    */
  def bm25(docs: DataFrame, idCol: Column, textCol: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val base = docs.select(idCol.as("doc_id"), Text.tokens(textCol).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tok"))
    // corpus stats: exact integer sums, one broadcast row
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("sum_tok"))
    val termSet = array(terms.map(lit): _*)
    val tf = base
      .select(col("doc_id"), col("n_tok"), explode(col("toks")).as("term"))
      .filter(array_contains(termSet, col("term")))
      .groupBy(col("doc_id"), col("n_tok"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_tok").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("n_tok"),
        (idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("n_tok").cast("double") / avgdl)))
          .as("score"))
  }
}
