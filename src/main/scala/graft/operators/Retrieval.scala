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
    *
    * Shape: the token explode feeds a per-doc conditional-sum aggregate
    * (tf per query term + n_tok in one pass, map-side combined — the
    * exchange carries ~one row per doc, never the token stream). The
    * corpus stats (N, Σlen, per-term df) are a second aggregate over the
    * same frame; Spark's column pruning gives the two branches different
    * canonical forms, so the inline composition pays a second tokenize
    * pass — which is the honest cost of a one-shot query. At scale the
    * stats ARE the index (Lucene stores df/avgdl; they change only on
    * ingest): build them once per corpus and every query's plan is the
    * single scoring pass.
    */
  def bm25(docs: DataFrame, idCol: Column, textCol: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val tfCols = terms.zipWithIndex.map { case (tm, i) =>
      sum(when(col("term") === tm, 1L).otherwise(0L)).as(s"tf$i")
    }
    // explode_outer keeps zero-token docs in N/Σlen (as the doc-level
    // aggregate would); their null term matches no query term. The explicit
    // isNotNull mirrors the filter a downstream equi-join would INFER into
    // its branch — with it already in the shared subtree, both the tf
    // branch and the stats branch canonicalize identically and the per-doc
    // exchange is computed once (ReusedExchange), not per consumer.
    val perDoc = docs.select(idCol.as("doc_id"), Text.tokens(textCol).as("toks"))
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
        explode_outer(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("n_tok"))
      .agg(tfCols.head, tfCols.tail: _*)
    val statCols = count(lit(1)).as("n_docs") +: sum(col("n_tok")).as("sum_tok") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sum_tok").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("n_tok"), col("n_docs"), col("sum_tok"),
        explode(array(terms.zipWithIndex.map { case (tm, i) =>
          struct(lit(tm).as("term"), col(s"tf$i").as("tf"), col(s"df$i").as("df"))
        }: _*)).as("e"))
      .select(col("doc_id"), col("n_tok"), col("n_docs"), col("sum_tok"),
        col("e.term").as("term"), col("e.tf").as("tf"), col("e.df").as("df"))
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("n_tok"),
        (idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("n_tok").cast("double") / avgdl)))
          .as("score"))
  }
}
