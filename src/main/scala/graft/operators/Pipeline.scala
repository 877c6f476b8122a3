package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the composition every
  * stage in this library exists for, run as ONE declarative plan:
  *
  *   lang-id filter → quality filter → exact dedup → near-dup dedup
  *   (keep-best) → benchmark decontamination
  *
  * Mirrors the standard C4/Gopher/GPT-3-style curation recipe: heuristic
  * language ID and quality screens first (cheap scan-side maps eliminate
  * most rows before anything shuffles), content-fingerprint exact dedup
  * next (collapses the copy mass), MinHash-LSH near-dup clustering with a
  * keep-the-best-quality policy on the survivors, and an n-gram-overlap
  * decontamination pass against a held-out benchmark split last (the
  * smallest input, the most expensive per-doc check).
  *
  * Scale shape, stage by stage: the lang/quality flags are pure
  * whole-stage-codegen column maps over the scan (no exchange); exact
  * dedup shuffles `(doc_id, 48-byte fingerprint)` once (a window min over
  * the fingerprint — never the text); the near-dup stage runs only on
  * exact-canonical survivors (band-bucket joins, ids-only exchanges,
  * capped buckets — see [[Dedup.minhashNearDups]]); decontamination is an
  * inverted-index semi-join on 8-byte hashed shingles ([[Corpus.decontaminate]]).
  * No stage ever exchanges document text, and each stage's input is the
  * previous stage's (strictly smaller) survivor set.
  */
object Pipeline {

  /** Stage 1 of the curation funnel — the scan-side lang-id + quality
    * flags (q19's stopword-hit language ID, q18's token-count/stop-ratio
    * screen, op-for-op), appended as columns to a frame carrying
    * (`doc_id`, `text`, ...). Pure whole-stage-codegen column maps with no
    * exchange, so the SAME function runs unchanged on a batch frame
    * ([[curate]]) and on a streaming one
    * ([[graft.streaming.CurationStream]]) — stream ≡ batch for this stage
    * by construction, not by test.
    */
  def stageOneFlags(docs: DataFrame): DataFrame = {
    // ONE pass over the text (native graft_stage1 — r16 optimization):
    // the original five size(filter(split(...), lambda)) HOF chains each
    // re-split the document inside an interpreted lambda walk; the kernel
    // computes the same five counters (NativeExprSpec pins count-for-count
    // equality against the HOF spelling) in a single scan-side expression.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val s1 = call_function("graft_stage1", col("text"))
    docs
      .withColumn("_s1", s1)
      .withColumn("n_tokens", col("_s1").getItem(0))
      .withColumn("n_stop", col("_s1").getItem(1))
      .withColumn("en_hits", col("_s1").getItem(2))
      .withColumn("es_hits", col("_s1").getItem(3))
      .withColumn("de_hits", col("_s1").getItem(4))
      .drop("_s1")
      .withColumn("stop_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_stop").cast("double") / col("n_tokens")))
      .withColumn("lang_ok",
        col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") &&
          col("en_hits") > 0)
      .withColumn("quality_ok",
        col("n_tokens") >= 5 && col("n_tokens") <= 10000 &&
          col("stop_ratio") >= 0.01)
  }

  /** Run the full curation pipeline over `docs`. `benchPred` marks the
    * held-out benchmark/eval split: those rows are excluded from the
    * output and serve as the decontamination index.
    *
    * Output: one row per NON-benchmark doc —
    * `(doc_id, lang_ok, quality_ok, exact_keep, neardup_keep, decontam_ok,
    * kept)` — where each stage flag is NULL if the doc was eliminated
    * before that stage ran (the stage never saw it), and
    * `kept = every flag true`. The flags make the funnel auditable:
    * `count(*) FILTER (lang_ok)` etc. is the per-stage survival curve.
    *
    * Heuristics are pinned to the library's gated primitives: q19's
    * stopword-hit language ID, q18's token-count/stop-ratio quality
    * screen, [[Dedup.exact]]'s fingerprint dedup, q99's
    * [[Dedup.dupGroupsBest]] with token count as the quality score, and
    * q58's shingle-containment decontamination at `contamThreshold`.
    *
    * Stage outputs are MATERIALIZED (`localCheckpoint`, or a reliable
    * `checkpoint()` when `checkpointDir` is set — the
    * [[Dedup.connectedComponents]] contract): a lazily-composed funnel
    * re-derives the whole upstream lineage inside every downstream flag
    * join — the unpinned plan read the corpus 70× and ran the dedup
    * window 12× (measured, sf0.001) — exactly what a production pipeline
    * avoids by writing each stage's (tiny) keep-set to storage. The flag
    * frames are ids + booleans, ~1/1000th the corpus bytes; the survivor
    * frames (id, text, n_tokens) are what the next stage reads anyway.
    */
  def curate(docs: DataFrame, idCol: Column, textCol: Column,
      benchPred: Column, contamThreshold: Double = 0.5,
      checkpointDir: Option[String] = None): DataFrame = {
    // Materialize a stage boundary: reliable checkpoint when a dir is
    // given (multi-executor deploys), RDD-block localCheckpoint otherwise.
    // Set-only-when-unset with a WARN when ignored (Graph.ensureCheckpointDir).
    checkpointDir.foreach(
      Graph.ensureCheckpointDir(docs.sparkSession.sparkContext, _))
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val base = docs.select(idCol.as("doc_id"), textCol.as("text"),
      benchPred.as("is_bench"))
    val flagged = stageOneFlags(base)
    val candidates = flagged.filter(!col("is_bench"))

    // Stage 2 — exact dedup among stage-1 survivors: min id per content
    // fingerprint. The fingerprint is PROJECTED before the window so the
    // exchange carries (doc_id, 48-byte fingerprint) — never the text
    val s1 = candidates.filter(col("lang_ok") && col("quality_ok"))
    val exactFlags = pin(s1
      .select(col("doc_id"), xxhash64(col("text")).as("_h"),
        length(col("text")).as("_len"), sha2(col("text"), 256).as("_fp"))
      .withColumn("exact_keep", col("doc_id") === min(col("doc_id")).over(
        Window.partitionBy(col("_h"), col("_len"), col("_fp"))))
      .select(col("doc_id"), col("exact_keep")))

    // Stage 3 — near-dup clusters among exact-canonical survivors; keep
    // the highest-token-count member of each cluster (ties → min id).
    // s2 is pinned: three consumers (band join, argmax, stage 4) would
    // otherwise each re-run the scan + dedup window.
    // The flag-frame joins here and below carry SIZE-GATED broadcast
    // hints ([[Joins.hintSmall]]): pinned frames have no statistics, so
    // the planner SMJs both sides of every assembly join; the hint fires
    // only when the materialized flag frame COUNTS small (r17 — above the
    // cap, e.g. a 100 TB corpus' flags, the plan is unchanged).
    // one size probe (count of the pinned stage-2 flags) gates every
    // hint below: the later flag frames are doc_id-keyed subsets of it
    val nS1 = exactFlags.count()
    def hb(df: DataFrame): DataFrame = Joins.hintSmallBounded(df, nS1)
    val s2 = pin(s1.select(col("doc_id"), col("text"), col("n_tokens"))
      .join(hb(exactFlags.filter(col("exact_keep")).select("doc_id")),
        Seq("doc_id")))
    val pairs = Dedup.minhashNearDups(s2, col("doc_id"), col("text"))
    val nearFlags = pin(
      Dedup.dupGroupsBest(s2, col("doc_id"), col("n_tokens"), pairs)
        .select(col("doc_id"), col("keep").as("neardup_keep")))

    // Stage 4 — decontamination: survivors scored against the benchmark
    // split's shingle set (inverted index on hashed shingles, no doc×doc)
    val s3 = s2.join(hb(nearFlags.filter(col("neardup_keep"))
      .select("doc_id")), Seq("doc_id"))
    val deconFrame = base.filter(col("is_bench"))
      .select(col("doc_id"), col("text"), col("is_bench"))
      .unionByName(s3.select(col("doc_id"), col("text"), lit(false).as("is_bench")))
    val deconFlags = pin(Corpus.decontaminate(deconFrame, col("doc_id"),
        col("text"), evalPred = !col("is_bench"), threshold = contamThreshold)
      .select(col("doc_id"), (!col("contaminated")).as("decontam_ok")))

    candidates.select(col("doc_id"), col("lang_ok"), col("quality_ok"))
      .join(hb(exactFlags), Seq("doc_id"), "left")
      .join(hb(nearFlags), Seq("doc_id"), "left")
      .join(hb(deconFlags), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang_ok"), col("quality_ok"),
        col("exact_keep"), col("neardup_keep"), col("decontam_ok"),
        coalesce(col("lang_ok") && col("quality_ok") && col("exact_keep") &&
          col("neardup_keep") && col("decontam_ok"), lit(false)).as("kept"))
  }

  /** [[curate]] fed from RAW WEB MARKUP — the full funnel as a real
    * pipeline runs it: [[Corpus.extractMainText]] is stage 0 (scan-side
    * tag/entity/boilerplate extraction, zero shuffle), and its `main_text`
    * becomes the `text` every downstream stage ([[stageOneFlags]], dedup,
    * decontamination) consumes. Same output schema as [[curate]]; docs
    * whose markup extracts to an empty string flow through and fail the
    * quality screen naturally (n_tokens = 0), mirroring what a 0-content
    * page should do.
    */
  def curateFromHtml(docs: DataFrame, idCol: Column, htmlCol: Column,
      benchPred: Column, contamThreshold: Double = 0.5,
      checkpointDir: Option[String] = None,
      maxLinkDensity: Double = 1.0 / 3): DataFrame = {
    val extracted = Corpus.extractMainText(docs, idCol, htmlCol,
        maxLinkDensity)
      .join(docs.select(idCol.as("doc_id"), benchPred.as("__bench")),
        Seq("doc_id"))
    curate(extracted, col("doc_id"), col("main_text"), col("__bench"),
      contamThreshold, checkpointDir)
  }

  /** Leakage-free train/val/test split — [[Corpus.splitAssign]]'s
    * deterministic hash split HARDENED against near-duplicate leakage: an
    * eval document whose near-duplicate landed in train measures
    * memorization, not generalization, so any non-train document adjacent
    * (in the verified MinHash-LSH dup graph, [[Dedup.minhashNearDups]]) to
    * a train document is reassigned to `leak` and excluded from both
    * sides. Train docs stay train (their dups in train are ordinary
    * duplication, handled by the dedup stages); val/test docs adjacent
    * only to each other stay where they are (they leak nothing across the
    * train boundary).
    *
    * Scale shape: the split is scan-side hash arithmetic; leak detection
    * is the LSH band join (bucketed, never all-pairs) + one semi join of
    * the undirected edge list against the train-id frame + one distinct —
    * all id-sized exchanges. Output (id, split) with split ∈ {train, val,
    * test, leak} — hash-gate types.
    */
  def leakFreeSplit(docs: DataFrame, idCol: Column, textCol: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    val assign = Corpus.splitAssign(docs, idCol, fractions)
      .select(col("id"), col("split"))
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol)
    val und = pairs.select(col("doc_a").as("id"), col("doc_b").as("other"))
      .unionAll(pairs.select(col("doc_b").as("id"), col("doc_a").as("other")))
    val trainIds = assign.filter(col("split") === "train")
      .select(col("id").as("other"))
    val leaky = und.join(trainIds, Seq("other"), "left_semi")
      .select(col("id")).distinct().withColumn("adj_train", lit(true))
    assign.join(leaky, Seq("id"), "left")
      .select(col("id"),
        when(col("split") === "train", lit("train"))
          .when(coalesce(col("adj_train"), lit(false)), lit("leak"))
          .otherwise(col("split")).as("split"))
  }
}
