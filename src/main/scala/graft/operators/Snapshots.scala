package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset snapshot diff — the data-versioning audit between two cuts of a
  * corpus: which documents were added, removed, changed, or untouched. A
  * curation pipeline re-runs; before the new cut replaces the old one, the
  * diff is the blast-radius report (a "changed" count spiking to the whole
  * corpus usually means an upstream normalizer changed, not the data).
  *
  * Shape: each side reduces to (id, content-hash) on the scan — MD5 of the
  * UTF-8 payload, 32 hex chars, so the exchange carries ~48 B/doc
  * regardless of document size (the Dedup.exact fingerprint discipline) —
  * then one full-outer equi-join on id classifies every row. At 100 TB
  * both sides shuffle-partition by id; with both snapshots bucketed by id
  * the join is co-located and shuffle-free.
  */
object Snapshots {

  /** (doc_id, status) for every id present in either snapshot:
    * `added` (new only), `removed` (old only), `changed` (both, hash
    * differs), `unchanged`. MD5 is content-defined and engine-portable
    * (identical in Spark and any SQL oracle over the same UTF-8 bytes).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: Column,
      payloadCol: Column): DataFrame = {
    val o = oldSnap.select(idCol.cast("long").as("doc_id"),
      md5(payloadCol.cast("binary")).as("h_old"))
    val n = newSnap.select(idCol.cast("long").as("doc_id"),
      md5(payloadCol.cast("binary")).as("h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
