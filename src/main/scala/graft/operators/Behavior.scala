package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user_id, event_type, ts, seq) stream —
  * the funnel / cohort-retention pair every product-analytics warehouse
  * ships. Both are fully declarative relational plans (no per-user folds):
  * Catalyst sees ordinary aggregates and equi-joins, so partial
  * aggregation, AQE, and join planning all apply unchanged at any scale.
  *
  * Ordering is the pinned `(ts, seq)` arrival order carried as a
  * lexicographic struct — `min(struct(ts, seq))` is a partial-aggregatable
  * arg-min and struct `<`/`>` comparisons give strict "later than" without
  * a window sort anywhere.
  */
object Behavior {

  private def key(ts: Column, seq: Column): Column =
    struct(ts.as("ts"), seq.as("seq"))

  /** Ordered conversion funnel stage1 → stage2 → stage3 per user: the
    * earliest stage-1 event, the earliest stage-2 event strictly after it,
    * and the earliest stage-3 event strictly after THAT. One row per user
    * (left joins keep non-converting users with NULL stages).
    *
    * Scale shape: three hash aggregates on user_id + two equi-joins on
    * user_id — every exchange is keyed by user_id, so AQE can reuse one
    * partitioning end-to-end; per-stage frames carry (user_id, 12-byte
    * key), never events. The strictly-after predicate rides the struct
    * comparison, not a per-user sort.
    *
    * `events` must have columns (user_id, event_type, ts, seq).
    */
  def funnel(events: DataFrame, s1: String, s2: String, s3: String): DataFrame = {
    val k = key(col("ts"), col("seq"))
    val base = events.select(col("user_id")).distinct()
    val v = events.filter(col("event_type") === s1)
      .groupBy(col("user_id")).agg(min(k).as("k1"))
    val c = events.filter(col("event_type") === s2)
      .join(v, Seq("user_id"))
      .filter(k > col("k1"))
      .groupBy(col("user_id")).agg(min(k).as("k2"))
    val p = events.filter(col("event_type") === s3)
      .join(c, Seq("user_id"))
      .filter(k > col("k2"))
      .groupBy(col("user_id")).agg(min(k).as("k3"))
    base
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        col("k1.ts").as("s1_ts"), col("k1.seq").as("s1_seq"),
        col("k2.ts").as("s2_ts"), col("k2.seq").as("s2_seq"),
        col("k3.ts").as("s3_ts"), col("k3.seq").as("s3_seq"))
  }

  /** Weekly cohort retention: users bucketed by the epoch-aligned week of
    * their first event; for every (cohort, week-offset ≥ 0) the count of
    * cohort members active that week and the retention rate. Epoch-aligned
    * `floor(epoch/604800)` buckets make the cohort key engine-portable
    * (the q14 window-bucketing contract).
    *
    * Scale shape: first-event election is one partial-aggregated min per
    * user; activity is a (user, week) distinct — both exchanges keyed by
    * user_id; the final rollup exchanges one row per (cohort, offset).
    */
  def retention(events: DataFrame): DataFrame = {
    val week = (floor(unix_timestamp(col("ts")) / 604800L)).cast("long")
    val firstWeek = events
      .groupBy(col("user_id"))
      .agg(min(week).as("cohort_week"))
    val active = events
      .select(col("user_id"), week.as("active_week")).distinct()
    val sizes = firstWeek.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(firstWeek, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("active_week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"), (col("n_active") / col("n_cohort")).as("retention"))
  }
}
