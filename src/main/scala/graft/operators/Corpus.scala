package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-hygiene operators a large-scale training-data pipeline runs after
  * dedup: benchmark decontamination, deterministic stratified sampling, and
  * repetition-based quality scoring. All three are pure composed Spark plans
  * — codegen'd column maps, inverted-index joins, partial-aggregated counts
  * — with DuckDB-expressible semantics so the driver gate hash-checks them
  * (SparkEntry q58/q59/q60).
  */
object Corpus {

  /** The portable multiplicative hash `(id·2654435761 + 40503) mod 2³²`,
    * computed WITHOUT 64-bit overflow for any id: the naive `id * b`
    * overflows Long for ids ≳ 2⁶³/b ≈ 3.47e9 — ANSI engines (Spark 4
    * default, DuckDB) raise on it, and non-ANSI `%` of the wrapped negative
    * silently breaks the keep filter. The 16-bit split works mod 2³²:
    *   a = id mod 2³²,  a = aHi·2¹⁶ + aLo
    *   h = (aLo·b mod 2³² + (aHi·b mod 2³²)·2¹⁶ + 40503) mod 2³²
    * every intermediate < 2⁴⁹, so the SAME spelling runs exactly in any
    * 64-bit engine. For ids < 2³² this equals the one-multiply form the
    * fixture oracles use.
    */
  private[graft] def portableHash(idCol: Column): Column = {
    val m = lit(4294967296L)
    val b = lit(2654435761L)
    val a = pmod(idCol.cast("long"), m)
    val aHi = shiftright(a, 16)
    val aLo = a.bitwiseAND(lit(65535L))
    pmod(pmod(aLo * b, m) + pmod(aHi * b, m) * lit(65536L) % m + lit(40503L), m)
  }

  /** HTML/markup MAIN-CONTENT extraction — stage 0 of the curation funnel:
    * every real 100 TB text pipeline starts from raw web markup (C4 and
    * RefinedWeb begin at WARC/WET records), and this turns a markup column
    * into the clean `text` the downstream stages
    * ([[graft.operators.Pipeline.curate]]) consume. Three moves, all
    * scan-side column maps — zero shuffle, zero state, linear-time
    * regexes (no nested quantifiers, so no catastrophic backtracking on
    * adversarial markup — the RIFF-walk lesson applied to HTML):
    *
    *  1. strip non-content subtrees: closed `<script>`/`<style>` blocks
    *     (lazy single-pass match), then any UNCLOSED `<script>`/`<style>`
    *     open tag to end-of-input (the browser rule: script content runs
    *     to the first close tag or EOF — a nested `<script>` inside
    *     script content terminates at the FIRST close, like a browser),
    *     then the `<head>` subtree;
    *  2. segment into blocks at block-level tag boundaries (`p`, `div`,
    *     `li`, headings, table rows, `br`, …), strip the remaining inline
    *     tags, decode the five core entities (`&lt; &gt; &quot; &#39;
    *     &nbsp;` then `&amp;` LAST — the decode order that makes
    *     escape∘decode the identity on arbitrary text), normalize
    *     whitespace;
    *  3. drop BOILERPLATE-DENSITY blocks: a block whose link density
    *     (anchor count / token count) exceeds `maxLinkDensity` is chrome
    *     (nav bars, footers, link farms — the boilerpipe signal), and
    *     empty blocks vanish.
    *
    * Malformed-markup contract (spec-pinned): unclosed inline tags are
    * stripped by the generic tag regex; a trailing unterminated `<…` (no
    * closing `>`) is dropped; stray close tags strip to nothing; nothing
    * hangs, nothing throws — extraction is total on arbitrary bytes.
    *
    * Output: (doc_id, main_text, n_kept, n_dropped) — kept/dropped counts
    * over NON-EMPTY blocks, the audit surface for extraction quality.
    */
  def extractMainText(docs: DataFrame, idCol: Column, htmlCol: Column,
      maxLinkDensity: Double = 1.0 / 3): DataFrame = {
    // 1. non-content subtrees
    val noClosedScript = regexp_replace(htmlCol,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noClosedStyle = regexp_replace(noClosedScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noOpenDangling = regexp_replace(noClosedStyle,
      "(?is)<(script|style)\\b[^>]*>.*$", " ")
    val noHead = regexp_replace(noOpenDangling,
      "(?is)<head\\b[^>]*>.*?</head\\s*>", " ")
    // strip non-whitespace CONTROL bytes (scraped pages carry binary
    // contamination; 0x01 doubles as the block sentinel below, so a
    // pre-existing one would forge block boundaries) — extraction hygiene
    // and sentinel safety in one pass
    val noCtl = regexp_replace(noHead, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", " ")
    // 2. block segmentation on block-level tag boundaries
    val blockified = regexp_replace(noCtl,
      "(?i)</?(p|div|li|ul|ol|h[1-6]|table|tr|td|th|br|hr|section|article|" +
        "header|footer|nav|aside|blockquote|pre|html|body)\\b[^>]*>",
      "")
    val blocks = split(blockified, "")
    // per block: count anchors BEFORE stripping, then strip inline tags,
    // decode entities, normalize whitespace, tokenize
    // TWO nested transforms (r16 optimization): with `toks` derived from
    // `norm` inside one lambda, the normalize/decode regex chain was
    // spelled (and interpreted) three times per block — once for txt,
    // twice inside the token count. The inner transform binds the
    // normalized text as a struct field; the outer derives the token
    // count from the BOUND field, so the 9-regexp chain runs once per
    // block. Same values by construction.
    val normed = transform(blocks, b => {
      val anchors = (size(split(b, "(?i)<a[\\s>/]", -1)) - 1).cast("long")
      val stripped = regexp_replace(
        regexp_replace(b, "<[^>]*>", " "), "<[^>]*$", " ")
      val decoded = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(regexp_replace(stripped,
          "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
          "&nbsp;", " "), "&amp;", "&")
      val norm = trim(regexp_replace(decoded, "\\s+", " "))
      struct(norm.as("txt"), anchors.as("anchors"))
    })
    val scored = transform(normed, s => {
      val txt = s.getField("txt")
      val toks = when(txt === "", lit(0L))
        .otherwise(size(split(txt, " ", -1)).cast("long"))
      struct(txt.as("txt"), toks.as("toks"),
        s.getField("anchors").as("anchors"))
    })
    // STAGED projections (r16 optimization): the original single select
    // referenced `kept` three times and `nonEmpty` twice, textually
    // duplicating the whole regex-bank transform chain into four output
    // expressions — ~4 evaluations of the heavy lambda per row. Binding
    // each stage to a column alias evaluates the chain once;
    // CollapseProject cannot re-inline a non-cheap alias consumed more
    // than once, so the staging survives optimization.
    val nonEmpty = filter(scored, s => s.getField("toks") > 0L)
    docs
      .select(idCol.as("doc_id"), nonEmpty.as("_ne"))
      .select(col("doc_id"), col("_ne"),
        filter(col("_ne"), s =>
          s.getField("anchors").cast("double") <=
            lit(maxLinkDensity) * s.getField("toks").cast("double"))
          .as("_kept"))
      .select(col("doc_id"),
        array_join(transform(col("_kept"), _.getField("txt")), " ")
          .as("main_text"),
        size(col("_kept")).cast("long").as("n_kept"),
        (size(col("_ne")) - size(col("_kept"))).cast("long").as("n_dropped"))
  }

  /** Benchmark decontamination: for every eval doc (rows where `evalPred`),
    * the fraction of its distinct `shingleN`-gram shingles that appear in
    * ANY train doc (the rest of the corpus) — the GPT-3/C4-style n-gram
    * overlap check that keeps eval answers out of training data.
    *
    * Scale shape: inverted-index containment, never doc×doc. Train shingles
    * collapse to a distinct set (map-side partial), the eval side explodes
    * its shingles once, and the semi join runs on `xxhash64(shingle)` — an
    * 8-byte key — so the exchange never carries shingle text (a cross-doc
    * false hit needs an xxhash64 collision between two distinct shingles:
    * ~2⁻⁶⁴ per pair, the content-hashing trade documented at Dedup.exact).
    *
    * Output: (doc_id, n_sh, n_hit, frac, contaminated), one row per eval doc.
    */
  def decontaminate(docs: DataFrame, idCol: Column, textCol: Column,
      evalPred: Column, shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh = docs.select(idCol.as("doc_id"), evalPred.as("is_eval"),
      call_function("graft_shingles", textCol, lit(shingleN)).as("sh"))
    val evalDocs = sh.filter(col("is_eval"))
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n_sh"))
    val evalSh = evalDocs.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("sk"))
    val trainSh = sh.filter(!col("is_eval"))
      .select(explode(col("sh")).as("s"))
      .select(xxhash64(col("s")).as("sk")).distinct()
    val hits = evalSh.join(trainSh, Seq("sk"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val frac = when(col("n_sh") === 0, lit(0.0))
      .otherwise(col("n_hit").cast("double") / col("n_sh"))
    evalDocs.select(col("doc_id"), col("n_sh"))
      .join(hits, Seq("doc_id"), "left").na.fill(0L, Seq("n_hit"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        frac.as("frac"), (frac >= threshold).as("contaminated"))
  }

  /** [[decontaminate]] with the train side collapsed to a Bloom filter
    * (graft_bloom — functions/Bloom.scala) instead of a distinct-key
    * semi-join table: the sketch is nBits/8 bytes REGARDLESS of corpus
    * size (512 KB at the 2²² default), so the eval side needs no join at
    * all — membership is a pure broadcast-constant map over its exploded
    * shingles. At 100 TB that replaces a billions-row distinct build +
    * shuffle join with one mergeable aggregate (bitwise-OR merge —
    * order-independent) and a scan.
    *
    * Error contract (q92 gates it): one-sided. A shingle the train set
    * contains is NEVER missed, so `frac` ≥ the exact fraction and every
    * exactly-contaminated doc is flagged — false positives only inflate,
    * at ≈ (1 − e^(−k·n/m))^k. Size nBits ≈ 10× the expected distinct
    * shingle count for ~1% fpp.
    */
  def decontaminateBloom(docs: DataFrame, idCol: Column, textCol: Column,
      evalPred: Column, shingleN: Int = 3, threshold: Double = 0.5,
      nBits: Int = 1 << 22, numHashes: Int = 7): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh = docs.select(idCol.as("doc_id"), evalPred.as("is_eval"),
      call_function("graft_shingles", textCol, lit(shingleN)).as("sh"))
    // collect the sketch once (nBits/8 bytes — THE point of the sketch) and
    // inline it as a literal, the ivfKnn-centroid pattern: a literal's eval
    // returns the same object every row, so BloomContains' decoded-sketch
    // cache hits and the 512 KB decode happens once per task. The
    // crossJoin-a-1-row-frame alternative re-copies the binary out of the
    // row per probe (UnsafeRow.getBinary copies) — measured 7.9 s vs 0.9 s
    // at sf0.1. Plan-build cost: one eager aggregate job over the train
    // side, amortized in production by materializing the sketch next to
    // the corpus.
    val bfBytes: Array[Byte] = sh.filter(!col("is_eval"))
      .select(explode(col("sh")).as("s"))
      .agg(call_function("graft_bloom", xxhash64(col("s")),
        lit(nBits), lit(numHashes)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val evalDocs = sh.filter(col("is_eval"))
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n_sh"))
    val hits = evalDocs
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .filter(call_function("graft_bloom_contains", lit(bfBytes), xxhash64(col("s"))))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val frac = when(col("n_sh") === 0, lit(0.0))
      .otherwise(col("n_hit").cast("double") / col("n_sh"))
    evalDocs.select(col("doc_id"), col("n_sh"))
      .join(hits, Seq("doc_id"), "left").na.fill(0L, Seq("n_hit"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        frac.as("frac"), (frac >= threshold).as("contaminated"))
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction of rows
    * chosen by a PORTABLE multiplicative hash of the id — Knuth's 2654435761
    * with an offset, mod 2³², expressible identically in any engine (unlike
    * rand(), which is irreproducible, or xxhash64, which only Spark has).
    * Re-running the pipeline — or running it in another engine — selects the
    * SAME rows, which is what makes downsampled corpora auditable.
    *
    * `rates` maps stratum → keep fraction (broadcast dimension join); rows
    * in strata absent from `rates` are dropped. The hash is a pure codegen'd
    * column map; no shuffle beyond the broadcast.
    */
  def hashSample(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: DataFrame): DataFrame = {
    val h = portableHash(idCol)
    df.select(idCol.as("id"), stratumCol.as("stratum"), h.cast("long").as("h"))
      .join(broadcast(rates.select(col("stratum"), col("rate"))), Seq("stratum"))
      .filter(col("h").cast("double") < col("rate") * 4294967296.0)
      .select(col("id"), col("stratum"), col("h"))
  }

  /** Deterministic train/val/test split: each row's split label comes from
    * its [[portableHash]] against cumulative fraction thresholds, so the
    * assignment is a pure column map — re-running the pipeline, or running
    * it in another engine, puts every document in the SAME split (the
    * property that keeps eval sets stable across corpus rebuilds; rand()
    * splits silently reshuffle). Fractions must sum to ≤ 1; the remainder
    * falls into the last label.
    *
    * Output: (id, h, split).
    */
  def splitAssign(df: DataFrame, idCol: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val h = portableHash(idCol).cast("long")
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    val expr = fractions.zip(cuts).init.foldRight(
        lit(fractions.last._1): Column) { case (((name, _), cut), rest) =>
      when(h.cast("double") < lit(cut * 4294967296.0), lit(name)).otherwise(rest)
    }
    df.select(idCol.as("id"), h.as("h"), expr.as("split"))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-Res): each row gets priority key ln(u)/w with
    * u = (portableHash(id) + 0.5)/2³² standing in for the random draw, and
    * the k LARGEST keys win — inclusion odds scale with the weight
    * (quality score, importance), but the selection is a pure function of
    * the ids: re-runs and other engines pick the SAME sample (rand()-based
    * sampling cannot be audited). Keys are rounded to 6 dp before ranking
    * with an id tie-break, so the order — not just the values — is
    * engine-reproducible under the same 6-dp ln agreement every hashed
    * double in the gate already relies on.
    *
    * Selection runs through the bounded graft_topk aggregate (map-side
    * partial, ≤ k rows per partition on the exchange) — never a full sort.
    * Output: (rank, id, w, key), rank 1..k.
    */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val u = (portableHash(idCol).cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = round(log(u) / weightCol.cast("double"), 6)
    df.select(idCol.as("id"), weightCol.cast("long").as("w"), key.as("key"))
      .agg(call_function("graft_topk",
        struct(col("key"), (-col("id")).as("nid"), col("id").as("id"),
          col("w").as("w")), lit(k)).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rank"), col("col.id").as("id"),
        col("col.w").as("w"), col("col.key").as("key"))
  }

  /** Gopher-style repetition/diversity quality signals per doc:
    * type-token ratio (distinct/total tokens) and top-bigram fraction (most
    * frequent bigram / total bigrams). High repetition → low-quality
    * machine-generated or boilerplate text.
    *
    * Bigram counting explodes (doc_id, bigram) and partial-aggregates — the
    * distributed idiom; nothing is buffered per doc beyond the count rows.
    * All signals are integer-derived, so the division is bit-reproducible.
    *
    * Output: (doc_id, n_tokens, n_distinct, ttr, top_bigram_n, bigram_frac).
    */
  /** Hashing-trick linear quality scorer (the fastText-style model-based
    * filter's scoring pass): score = Σ_tokens weights[h(token) mod dim],
    * mean-normalized, thresholded at 0. The feature map is pure arithmetic
    * — h is the portable token hash (q21/q24 family), so there is NO
    * vocabulary join at any corpus size and an oracle can recompute every
    * feature id — and the trained weight vector ships as one broadcast
    * foldable literal (the PqKernel codebook contract), decoded once per
    * task by the native [[graft.functions.HashFeatScore]] kernel. The
    * left-to-right token fold pins the IEEE sum order, so scores are
    * engine-identical and the keep/drop bit is oracle-gateable.
    *
    * Scale shape: one scan-side map inside the projection, no exchange,
    * no state — the cheapest possible shape for a per-doc model score.
    *
    * Output: (doc_id, n_tokens, score, mean_score, keep).
    */
  def hashedLinearScore(docs: DataFrame, idCol: Column, textCol: Column,
      weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty, "hashedLinearScore needs a non-empty weight vector")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val score = call_function("graft_hashscore", Text.tokens(textCol),
      typedLit(weights).cast("array<double>"))
    docs.select(idCol.as("doc_id"),
        size(Text.tokens(textCol)).cast("long").as("n_tokens"),
        score.as("score"))
      .withColumn("mean_score",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("score") / col("n_tokens")))
      .withColumn("keep", col("mean_score") > 0.0)
  }

  /** Hashing-trick document EMBEDDING: the dim-length integer
    * bag-of-words count vector v[h(token) mod dim] += 1 — raw text turned
    * into the dense vector column the ANN family consumes, with no
    * vocabulary, no training artifact, and no exchange: the native
    * [[graft.functions.HashCountVec]] kernel runs scan-side inside the
    * projection (featurization of 100 TB is a pure map). A learned
    * encoder slots in by replacing this one projection; everything
    * downstream (ivfPqKnn, cosineDupPairs, semDedup) is representation-
    * agnostic.
    *
    * INTEGER counts by design: n2 = ⟨v,v⟩ rides along so consumers can
    * evaluate cosine thresholds as exact cross-multiplied integer
    * predicates (cos ≥ τ ⟺ num > 0 ∧ num² ≥ τ²·n2_a·n2_b — no IEEE
    * ordering anywhere), which is what lets the q197 gate hash-match a
    * DuckDB re-derivation of every count.
    *
    * Overflow bound for consumers of the integer predicate: Spark BIGINT
    * multiplication WRAPS silently in non-ANSI mode, so a scaled form like
    * q197's 100·num² ≥ 81·n2_a·n2_b is exact only while 100·num² < 2⁶³,
    * i.e. num ≤ ~9.6·10⁸ (tighter than the bare num² < 2⁶³ bound of
    * ~3·10⁹) — num is bounded by the doc-pair token-mass product, so this
    * holds to ~30 M-token documents, far above any real document, but a
    * fixture-scale change must re-check it (DuckDB would error loudly on
    * the same overflow; Spark would diverge silently). Computing the
    * predicate via DecimalType removes the bound at ~2× cost if ever
    * needed.
    *
    * Output: (doc_id, vec array<bigint>[dim], n2).
    */
  def hashedEmbedding(docs: DataFrame, idCol: Column, textCol: Column,
      dim: Int = 64): DataFrame = {
    require(dim > 0, "hashedEmbedding dim must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(idCol.as("doc_id"),
        call_function("graft_hashvec", Text.tokens(textCol), lit(dim)).as("vec"))
      .withColumn("n2", call_function("graft_doti", col("vec"), col("vec")))
  }

  /** Text-to-kNN with NO pre-supplied embedding column: query documents
    * retrieve their nearest neighbours by hashed bag-of-words cosine —
    * [[hashedEmbedding]] composed with the bounded top-k machinery
    * ([[Similarity.topkOf]]'s graft_topk partial aggregate, the
    * bruteForceKnn shape: broadcast queries, corpus never shuffles, the
    * exchange carries ≤ k rows per query per partition).
    *
    * Ranking is by score = num²/n2_cand (num = integer dot via
    * graft_doti; num > 0 required) — monotone in cosine for fixed query,
    * computed as ONE BIGINT product cast to double and ONE division, so
    * every engine orders candidates identically (ties break by doc id).
    * num² stays exact below 2⁶³ — num < 3·10⁹ here (scaled threshold
    * predicates like q197's 100·num² tighten that to ~9.6·10⁸; see the
    * overflow-bound note on [[hashedEmbedding]]), far above any real
    * document's token mass.
    *
    * Output: (qid, doc_id, score, rn), rn = 1..k.
    */
  def hashedKnn(docs: DataFrame, idCol: Column, textCol: Column,
      queryPred: Column, k: Int, dim: Int = 64): DataFrame = {
    val e = hashedEmbedding(docs, idCol, textCol, dim).filter(col("n2") > 0)
    val q = e.filter(queryPred)
      .select(col("doc_id").as("qid"), col("vec").as("qv"))
    val cand = broadcast(q).join(e, col("doc_id") =!= col("qid"))
      .withColumn("num", call_function("graft_doti", col("qv"), col("vec")))
      .filter(col("num") > 0)
      .select(col("qid"), col("doc_id").as("vec_id"),
        ((col("num") * col("num")).cast("double") / col("n2")).as("score"))
    Similarity.topkOf(cand, k).withColumnRenamed("vec_id", "doc_id")
  }

  /** TRAINED language ID — the model-based upgrade of the q19 stopword
    * heuristic, built entirely from machinery the engine already gates:
    * [[hashedEmbedding]] featurizes every doc as a dim-length hashed
    * bag-of-words integer vector (scan-side, no vocabulary), TRAINING is
    * one distributed aggregation — the per-language feature CENTROID
    * (element-wise count sum over that language's docs, a nearest-
    * centroid/Rocchio classifier) — and SCORING is a broadcast of the
    * |langs| centroid rows against the corpus with the q198 ranking
    * contract: score = num²/n2_lang (num = integer dot via graft_doti,
    * always ≥ 0 for count vectors, so the square is monotone in cosine
    * for a fixed doc), ONE BigInt product cast to double and ONE division
    * — every engine orders candidates identically; ties break on the
    * language name. Prediction is a map-side-combined min_by over
    * (-score, lang) — the argmax as an AGGREGATE, not a window, so
    * parallelism stays at scan width.
    *
    * Weight-shipping note (the q101 contract): q101 ships its linear
    * weights as one foldable literal; here the weights are TRAINED in the
    * same job, so they travel as a broadcast frame instead — once training
    * freezes, a deploy folds the centroids back into literals and scoring
    * becomes exactly q101's zero-exchange scan.
    *
    * Overflow bound: num ≤ doc-token-mass × language-token-mass; at
    * corpus scale num stays ≲10⁷ per this fixture family, far below the
    * 2⁶³ wrap of num² (~3·10⁹ — [[hashedEmbedding]]'s documented bound);
    * a corpus where one language's token mass approaches 10⁹ needs the
    * DecimalType spelling.
    *
    * Output: one row per doc — (doc_id, lang, pred_lang).
    */
  def langIdTrained(docs: DataFrame, idCol: Column, textCol: Column,
      langCol: Column, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(idCol.as("doc_id"), textCol.as("__text"),
      langCol.as("lang"))
    // pinned (the curate stage-boundary convention): the featurized frame
    // feeds BOTH the centroid aggregation and the scoring cross join —
    // unpinned, each side re-runs the corpus scan + featurization
    val e = hashedEmbedding(base, col("doc_id"), col("__text"), dim)
      .join(base.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .localCheckpoint()
    val centroids = e
      .select(col("lang"), posexplode(col("vec")).as(Seq("pos", "c")))
      .groupBy(col("lang"), col("pos")).agg(sum(col("c")).as("s"))
      .groupBy(col("lang"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        _.getField("s")).as("cv"))
      .select(col("lang").as("cand"), col("cv"))
      .withColumn("n2l", call_function("graft_doti", col("cv"), col("cv")))
    e.crossJoin(broadcast(centroids))
      .withColumn("num", call_function("graft_doti", col("vec"), col("cv")))
      .withColumn("score",
        (col("num") * col("num")).cast("double") / col("n2l"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(min_by(col("cand"),
        struct((lit(-1.0) * col("score")).as("ns"), col("cand")))
        .as("pred_lang"))
  }

  def repetitionStats(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = Text.tokens(textCol)
    val base = docs.select(idCol.as("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        // zip_with over two slices, NOT transform(sequence)+element_at: the
        // optimizer collapses the tokenizing projection into this lambda,
        // and an element_at per iteration would re-run the split per
        // element — O(tokens²) per doc. zip_with references the array a
        // constant number of times. (sequence(1, 0) also counts DOWN in
        // Spark, hence the explicit short-doc guard.)
        when(size(col("toks")) < 2, array().cast("array<string>"))
          .otherwise(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .as("bigrams"))
    // count by (doc_id, xxhash64(bigram)): the exchange carries 16-byte
    // keys instead of bigram strings (an in-doc hash collision merging two
    // bigram counts is ~2⁻⁶⁴ per pair — the content-hashing trade
    // documented at Dedup.exact)
    val top = base.select(col("doc_id"), explode(col("bigrams")).as("bg"))
      .groupBy(col("doc_id"), xxhash64(col("bg")).as("bk")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))
    base.select(col("doc_id"), col("n_tokens"), col("n_distinct"))
      .join(top, Seq("doc_id"), "left").na.fill(0L, Seq("top_bigram_n"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_distinct").cast("double") / col("n_tokens")).as("ttr"),
        col("top_bigram_n"),
        when(col("n_tokens") < 2, lit(0.0))
          .otherwise(col("top_bigram_n").cast("double") / (col("n_tokens") - 1))
          .as("bigram_frac"))
  }

  /** Temperature-based source mixing plan (the "how much of each domain"
    * step of training-data assembly): per-source doc counts reweighted by
    * exponent α — α = 1 keeps natural proportions, α → 0 flattens toward
    * uniform (the multilingual/domain rebalancing everyone does) — then a
    * `budget`-sized allocation per source.
    *
    * α is fixed at 0.5 (√n): sqrt is IEEE-correctly-rounded, so the weights
    * are bit-reproducible in any engine, unlike pow(n, α) whose libm
    * varies. The normalizer Σ√n is summed EXACTLY — each √n rounded to 6 dp
    * and cast DECIMAL(18,6) first — so the result never depends on float
    * aggregation order (the FIXTURES.md decimal-sum rule).
    *
    * Output: (source, n_docs, weight, target_n) — weight = √n/Σ√n,
    * target_n by largest-remainder rounding of weight·budget, so
    * Σ target_n == budget EXACTLY (plain ⌊weight·budget⌋ under-allocates by
    * up to #sources−1 docs): each source gets ⌊weight·budget⌋, and the
    * budget−Σ⌊·⌋ leftover docs go to the largest fractional remainders
    * (ties broken by source name — deterministic, oracle-reproducible).
    * One tiny aggregate; nothing scales with corpus size but the count
    * scan; the windows run over the #sources-row subtotal, not data.
    */
  def mixWeights(docs: DataFrame, sourceCol: Column, budget: Long): DataFrame = {
    val counts = docs.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_raw", round(sqrt(col("n_docs").cast("double")), 6)
        .cast("decimal(18,6)"))
    // the normalizer as a global window over the subtotal frame (DECIMAL →
    // exact in any order); an agg + crossJoin would re-run the corpus
    // count scan once per consumer of its lineage
    val wTot = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val sized = counts
      .withColumn("w_sum", sum(col("w_raw")).over(wTot))
      .select(col("source"), col("n_docs"),
        (col("w_raw").cast("double") / col("w_sum").cast("double")).as("weight"))
      .withColumn("exact", col("weight") * lit(budget.toDouble))
      .withColumn("base", floor(col("exact")).cast("long"))
      .withColumn("rem", col("exact") - col("base").cast("double"))
    // deficit as a global window over the same tiny frame — an agg +
    // crossJoin here would re-run the corpus count scan for its lineage
    val wAll = Window.orderBy(col("rem").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sized
      .withColumn("deficit", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("weight"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("target_n"))
  }

  /** Per-doc mean token surprisal under an add-one-smoothed corpus unigram
    * LM — the cheapest "perplexity-style" quality score (docs of rare or
    * misfit vocabulary score high, repetitive boilerplate scores low), the
    * stand-in for the KenLM pass real pipelines run.
    *
    *   p(t) = (c(t) + 1) / (T + V)   (T = total tokens, V = vocab size)
    *   surprisal(doc) = −Σ ln p(t) / n_tokens
    *
    * The per-token ln is rounded to 6 dp and summed as DECIMAL(18,6) — the
    * sum is exact, so the per-doc mean never depends on aggregation order.
    *
    * Shape: the token explode feeds the (doc, term) tf aggregate (map-side
    * partial); the unigram table derives from that frame (c(t) = Σ_doc tf)
    * and its totals from the table. Column pruning keeps the branches from
    * sharing one scan, so the inline composition re-explodes the corpus —
    * the one-shot-query cost. At scale the unigram table IS the LM (built
    * once per corpus via [[unigramTable]], refreshed on ingest); scoring
    * against the prebuilt table is a single corpus pass. The unigram join
    * runs on the term key (broadcast at sane vocab sizes, shuffle join +
    * AQE beyond); corpus totals are one broadcast row.
    *
    * Output: (doc_id, n_tokens, mean_surprisal), one row per doc with ≥1
    * token.
    */
  def unigramSurprisal(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    unigramSurprisal(docs, idCol, textCol,
      unigramTable(docs, idCol, textCol))

  /** The corpus unigram LM table (term, c): one corpus pass, vocab-sized
    * output — the artifact a production pipeline materializes once and
    * scores every batch against.
    */
  def unigramTable(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(explode(Text.tokens(textCol)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))

  /** Score `docs` against a prebuilt [[unigramTable]] — the amortized
    * production path (one corpus pass per scored batch).
    */
  def unigramSurprisal(docs: DataFrame, idCol: Column, textCol: Column,
      termCounts: DataFrame): DataFrame = {
    val docTf = docs.select(idCol.as("doc_id"),
        explode(Text.tokens(textCol)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val totals = termCounts.agg(
      sum(col("c")).as("t_tok"), count(lit(1)).as("v_size"))
    val logp = round(log((col("c").cast("double") + lit(1.0)) /
      (col("t_tok").cast("double") + col("v_size").cast("double"))), 6)
      .cast("decimal(18,6)")
    docTf.join(termCounts, Seq("term"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * logp).as("sum_logp"))
      .select(col("doc_id"), col("n_tokens"),
        (-col("sum_logp").cast("double") / col("n_tokens").cast("double"))
          .as("mean_surprisal"))
  }

  /** Pack the corpus into token-budgeted shards: docs in `idCol` order are
    * assigned `shard = floor(exclusive-prefix-sum(tokens) / budgetTokens)` —
    * the deterministic sharding that turns a corpus into ~equal training
    * files without a shuffle-the-world sort.
    *
    * The global prefix sum is the textbook two-pass scan, NOT a
    * single-partition window (`Window.orderBy` with no partition key drags
    * the whole corpus through one task):
    *   1. range-partition by id (Spark samples split points, so partitions
    *      are balanced and id-ordered across partition boundaries);
    *   2. one tiny job collects per-partition token subtotals (one row per
    *      partition — KBs on any cluster);
    *   3. the driver prefix-sums those into per-partition offsets
    *      (broadcast back inside the closure);
    *   4. a per-partition running sum + offset emits every doc's exclusive
    *      prefix — pure sequential arithmetic, no further exchange.
    * `mapPartitions` is warranted here: a running sum over an ordered
    * partition is genuine per-partition imperative logic (the same reason
    * the PnL fold uses it).
    *
    * Output: (doc_id, n_tok, cum_tok, shard) where cum_tok is the INCLUSIVE
    * prefix sum — all integers, bit-reproducible in any engine.
    */
  def packShards(docs: DataFrame, idCol: Column, textCol: Column,
      budgetTokens: Long, numParts: Int = 0): DataFrame =
    packShardsByCount(
      docs.select(idCol.cast("long").as("doc_id"),
        size(Text.tokens(textCol)).cast("long").as("n_tok")),
      col("doc_id"), col("n_tok"), budgetTokens, numParts)

  /** [[packShards]] over a PRECOMPUTED (id, count) frame — the composition
    * surface: any unit stream with an integer cost (documents by token
    * count, chunk windows by window length, files by bytes) packs through
    * the same two-pass prefix-sum machinery.
    */
  def packShardsByCount(units: DataFrame, idCol: Column, countCol: Column,
      budgetTokens: Long, numParts: Int = 0): DataFrame = {
    val spark = units.sparkSession
    import spark.implicits._
    val docs = units.select(idCol.cast("long").as("doc_id"),
      countCol.cast("long").as("n_tok"))
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // id-proportional partitioner: DETERMINISTIC (unlike range-partitioner
    // sampling), so pass 1 and pass 2 agree on placement by construction,
    // and the shared RDD object means pass 2 reuses pass 1's shuffle files
    // instead of re-shuffling. Balanced when ids are ~dense (fixture ids
    // are); correctness never depends on balance.
    val nPart = math.max(1, parts)
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nPart
      override def getPartition(key: Any): Int = {
        val id = key.asInstanceOf[Long]
        math.min(nPart - 1, (id * nPart / (maxId + 1)).toInt)
      }
    }
    val parted = docs
      .as[(Long, Long)].rdd
      .map { case (id, n) => (id, n) }
      .repartitionAndSortWithinPartitions(partitioner)
    // pass 1: per-partition subtotals (one row per partition — KBs)
    val subtotals = parted
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _) // exclusive, length parts+1
    // pass 2: running sum + partition offset (shuffle files reused)
    parted.mapPartitionsWithIndex { case (pid, it) =>
      var run = offsets(pid)
      it.map { case (id, n) =>
        val excl = run; run += n; (id, n, run, excl / budgetTokens)
      }
    }.toDF("doc_id", "n_tok", "cum_tok", "shard")
  }

  /** Fair round-robin interleave — a deterministic GLOBAL TRAINING ORDER
    * that alternates sources one document at a time: position
    * `(rn−1)·k + src_idx` where `rn` is the doc's portable-hash rank
    * within its source and `src_idx` the source's alphabetical index.
    * This is the order-aware counterpart to [[mixWeights]] (which decides
    * HOW MANY per source, not WHEN): consecutive training batches see
    * every source before any source repeats — the standard interleaving
    * guard against source-correlated gradient drift.
    *
    * Scale shape: one per-source window (hash exchange on `source`) for
    * `rn`; the source index/count frame is k rows, broadcast; the position
    * arithmetic is scan-side. `budget` caps the emitted prefix; the output
    * sort is the gate's, not the operator's (a training loader range-reads
    * by `pos`).
    */
  def fairInterleave(df: DataFrame, idCol: Column, srcCol: Column,
      budget: Long): DataFrame = {
    val ranked = df.select(idCol.as("doc_id"), srcCol.as("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(portableHash(col("doc_id")), col("doc_id"))))
    val srcIdx = df.select(srcCol.as("source")).distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy(col("source"))) - 1)
      .withColumn("k", count(lit(1)).over(Window.partitionBy(lit(1))))
    ranked.join(broadcast(srcIdx), Seq("source"))
      .select(((col("rn") - 1) * col("k") + col("src_idx")).cast("long").as("pos"),
        col("source"), col("doc_id"))
      .filter(col("pos") < budget)
  }

  /** Passage-level exact dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499 — their ExactSubstr
    * adapted to fixed token windows): every doc splits into consecutive
    * `k`-token passages; a passage that already occurred anywhere in the
    * corpus (first occurrence = lexicographic min (doc_id, pos)) is removed,
    * and each doc is reassembled from its surviving passages. This removes
    * boilerplate repeated ACROSS documents that whole-doc dedup cannot see.
    *
    * Scale shape: the chunk explode is scan-side (sequence + posexplode,
    * no shuffle); the winner election groups by the passage HASH — an
    * 8-byte key with map-side partial `min(struct(doc_id, pos))`, so the
    * election exchange never carries passage text. The join back and the
    * per-doc reassembly shuffle passage text by doc_id — intrinsic to
    * rewriting documents (the output IS the text). The hash is the
    * portable polynomial fingerprint ([[graft.functions.PolyFingerprint]],
    * the q21 family) so the oracle recomputes it; a production run swaps in
    * the 48-byte [[Dedup.exact]] fingerprint — same plan, stronger key
    * (mod-1e9+7 collisions merge passages at ~n²/2e9 odds, which the gate
    * tolerates because both engines hash identically).
    *
    * Output: (doc_id, n_passages, n_dup_passages, text_dedup) — docs with
    * no tokens are dropped (they have no passages).
    */
  def dedupPassages(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val ch = df
      .select(idCol.as("doc_id"), Text.tokens(textCol).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("len"))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0L), expr(s"(len - 1) div $k"))))
      .select(col("doc_id"), col("col").cast("long").as("pos"),
        concat_ws(" ", slice(col("toks"),
          (col("col") * k + 1).cast("int"), lit(k))).as("passage"))
      .withColumn("h", call_function("graft_fp", col("passage"), lit(0)))
    val firstSeen = ch.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("h"), col("w.doc_id").as("w_doc"), col("w.pos").as("w_pos"))
    ch.join(firstSeen, Seq("h"))
      .withColumn("keep",
        col("doc_id") === col("w_doc") && col("pos") === col("w_pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dup_passages"),
        array_join(transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("pos"), col("passage"))))),
          p => p.getField("passage")), " ").as("text_dedup"))
  }

  /** PMI collocations — the top-k word pairs that co-occur far more than
    * chance predicts: lift = p(w1w2) / (p(w1)·p(w2)) = c₁₂·N² / (M·c₁·c₂)
    * with unigram total N and bigram total M. PMI = log(lift), and log is
    * monotone, so ranking by lift IS ranking by PMI while staying in
    * engine-exact arithmetic: counts are integers, the single
    * cast-to-double division is IEEE-identical everywhere, and the result
    * is rounded before the ordering ever matters.
    *
    * Scale shape: one explode→partial-agg for bigram counts, one for
    * unigram counts (vocab-sized frames); the two count lookups are hash
    * joins on the word; N and M ride in on a broadcast 1-row crossJoin;
    * the top-k is a global sort-limit (TakeOrdered — k rows per partition
    * travel, never the vocabulary). `minCount` prunes the noise floor
    * BEFORE the joins — rare bigrams have huge-variance lift and are the
    * bulk of the frame.
    *
    * Output: (w1, w2, c_pair, c_w1, c_w2, lift) — top `k` by
    * (lift desc, w1, w2), lift rounded to 6 dp.
    */
  def pmiCollocations(docs: DataFrame, textCol: Column,
      minCount: Long = 20L, k: Int = 50): DataFrame = {
    val toks = docs.select(Text.tokens(textCol).as("toks"))
    val totals = toks.agg(
      sum(size(col("toks")).cast("long")).as("n_tok"),
      sum(greatest(size(col("toks")) - 1, lit(0)).cast("long")).as("n_bi"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks
      .select(explode(
        when(size(col("toks")) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_w2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_pair"), col("c_w1"), col("c_w2"),
        // per-factor double casts, NOT an integer product: c·N² overflows
        // Long near 10¹³ tokens; the left-assoc double product is
        // IEEE-identical in any engine and the oracle spells it the same
        round(col("c_pair").cast("double") * col("n_tok").cast("double")
            * col("n_tok").cast("double")
          / (col("n_bi").cast("double") * col("c_w1").cast("double")
            * col("c_w2").cast("double")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Text → token-id encoding against a corpus-derived vocabulary — the
    * bridge from curation to training (the batches a trainer reads are ids,
    * not text). Vocabulary = top `vocabSize` tokens by (count desc, token
    * asc) — q53's contract — with ids 1..vocabSize in that order; OOV → 0.
    * Output per doc: (doc_id, n_tok, n_oov, ids) with `ids` the
    * space-joined id sequence in token order (a string, not an array: the
    * driver's canonicalizer compares scalars, and array formatting is
    * engine-specific where a string is neutral). Docs with zero tokens drop
    * out (both engines' unnest semantics).
    *
    * Scale shape: the count frame partial-aggregates map-side (one row per
    * distinct token per partition on the exchange); TakeOrdered picks the
    * top-N with no global sort; the rank window runs over the N-row frame
    * only; the id lookup is a BROADCAST join (N rows); per-doc re-assembly
    * is a bounded collect_list sorted by position inside the doc's own
    * group — nothing corpus-sized is ever windowed or sorted globally.
    */
  /** BPE merge training (Sennrich et al. 2016, arXiv:1508.07909 — public
    * algorithm): learn the first `nMerges` byte-pair merges over the
    * corpus. Start from character-level symbol sequences per word; each
    * round merges the globally most frequent ADJACENT symbol pair
    * (tie-break: count desc, then (left, right) lexicographic — pinned so
    * any engine picks the identical merge), applied greedily
    * left-to-right within each word.
    *
    * Output: one row per learned merge — (step, left_sym, right_sym, cnt).
    *
    * Scale shape — the corpus is scanned ONCE, for word frequencies; BPE
    * statistics are a pure function of the (word, count) frame, whose size
    * is the DISTINCT-word vocabulary (bounded by language, not corpus —
    * ~1e8 rows at 100 TB vs 1e11 docs). Every merge round is then a
    * vocab-frame job: an adjacent-pair explode (zipped slices — scan-side),
    * a partial-aggregated pair count, a 1-row TakeOrdered argmax, and a
    * typed map applying the merge. Rounds persist their frame and
    * unpersist the previous one, so no round recomputes the corpus scan.
    * (The classic single-node optimization — incremental pair-count deltas
    * instead of recounting — trades a full-frame pass for random-access
    * state; at cluster scale the recount IS the cheap shape because it
    * partial-aggregates map-side, while delta state would need a shuffle
    * per merge anyway.)
    */
  /** One greedy left-to-right BPE merge pass (shared by [[bpeTrain]]'s
    * rounds and [[bpeEncode]]'s application of the learned table).
    */
  private[operators] def applyMerge(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  def bpeTrain(docs: DataFrame, textCol: Column, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs
      .select(explode(Text.tokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (w, c, w.map(_.toString): Seq[String]) }
      .persist()
    // one materialization job per round: each round's argmax collect
    // materializes the CURRENT frame into its cache, after which the
    // previous round's cache is dropped — no separate count() job, and
    // nothing ever recomputes back to the corpus scan.
    var prev: Option[org.apache.spark.sql.Dataset[(String, Long, Seq[String])]] = None
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = cur.toDF("word", "c", "syms")
        .select(col("c"),
          explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("c"), col("p.0").as("a"), col("p.1").as("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()
      prev.foreach(_.unpersist()) // cur is materialized now; prev can go
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val a: String = top(0).getString(0)
        val b: String = top(0).getString(1)
        val cnt: Long = top(0).getLong(2)
        merges += ((step, a, b, cnt))
        val next = cur.map { case (w, c, s) => (w, c, applyMerge(s, a, b)) }
          .persist()
        prev = Some(cur) // keep cur cached until next's first job materializes it
        cur = next
        step += 1
      }
    }
    prev.foreach(_.unpersist())
    cur.unpersist()
    merges.toSeq.toDF("step", "left_sym", "right_sym", "cnt")
  }

  /** BPE training, vocabulary-local variant — the SCALE path for real
    * merge counts. [[bpeTrain]]'s one-Spark-job-per-round loop is exact but
    * pays ~0.3 s of scheduling per merge; at a real tokenizer's 10⁴-10⁵
    * merges the driver loop, not the data, is the bottleneck. The
    * observation (same as every production tokenizer trainer): after the
    * ONE distributed corpus scan, the state is a (word, count) frame
    * bounded by VOCABULARY, not corpus — millions of rows at web scale,
    * KBs-MBs in memory — and the merge recurrence is inherently sequential
    * over that frame. So: scan distributed, collect the vocab frame, run
    * the merge loop locally with incremental pair-count bookkeeping
    * (touch only words containing the merged pair, O(affected) per round
    * instead of O(vocab) Spark jobs).
    *
    * Semantics are IDENTICAL to [[bpeTrain]] — same greedy argmax, same
    * (cnt desc, a asc, b asc) tie-break, same exhaustion — asserted
    * row-for-row by CorpusBpeSpec across merge counts, which is what lets
    * q144/q147 use this path with their replay oracles unchanged.
    *
    * `maxVocab` caps the collected frame (top-N words by count,
    * deterministic tie-break) — the standard min-frequency/pruning
    * contract of practical trainers, and the explicit bound that makes
    * "collect the vocabulary" safe at 100 TB.
    */
  def bpeTrainFast(docs: DataFrame, textCol: Column, nMerges: Int,
      maxVocab: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = docs
      .select(explode(Text.tokens(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocab)
      .as[(String, Long)].collect()
    bpeMergeLoop(vocab, nMerges).toDF("step", "left_sym", "right_sym", "cnt")
  }

  /** The local merge recurrence over a collected (word, count) vocabulary:
    * pair counts are maintained incrementally (remove a word's adjacent
    * pairs, apply the merge, re-add) with a pair→words index so each round
    * touches only the words that contain the winning pair. Pure function —
    * unit-testable without Spark.
    */
  private[graft] def bpeMergeLoop(vocab: Array[(String, Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val words: Array[Seq[String]] = vocab.map(_._1.map(_.toString): Seq[String])
    val wCnt: Array[Long] = vocab.map(_._2)
    val pairCnt = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.Set[Int]]()
    def addPairs(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val nc = pairCnt.getOrElse(p, 0L) + sign * wCnt(i)
        if (nc == 0L) { pairCnt.remove(p) } else { pairCnt(p) = nc }
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
      if (sign < 0) {
        // rebuild membership lazily: drop i from every pair of the OLD word
        var k = 0
        while (k + 1 < s.length) {
          pairWords.get((s(k), s(k + 1))).foreach(_ -= i)
          k += 1
        }
      }
    }
    words.indices.foreach(addPairs(_, 1L))
    val out = mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    while (step <= nMerges && pairCnt.nonEmpty) {
      // argmax with bpeTrain's exact tie-break: cnt desc, then a asc, b asc
      var best: ((String, String), Long) = null
      pairCnt.foreach { case e @ (p, c) =>
        if (best == null || c > best._2 ||
            (c == best._2 && (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2)))) best = e
      }
      val ((a, b), cnt) = best
      out += ((step, a, b, cnt))
      val affected = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
      affected.foreach { i =>
        addPairs(i, -1L)
        words(i) = applyMerge(words(i), a, b)
        addPairs(i, 1L)
      }
      step += 1
    }
    out.toSeq
  }

  /** BPE ENCODE — apply a learned merge table (from [[bpeTrain]], collected
    * driver-side: nMerges rows, KBs) to every document: per-doc token count
    * and total post-merge symbol count. Vocabulary-factored like training:
    * the merges fold runs once per DISTINCT word (bounded by language, not
    * corpus), and documents join the applied vocabulary by broadcast — at
    * 100 TB the encode pass is a corpus scan + a broadcast hash join, with
    * all merge work confined to the vocab frame. Docs with zero tokens
    * produce no row (nothing to encode), matching the oracle's unnest.
    */
  def bpeEncode(docs: DataFrame, idCol: Column, textCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val applied = docs.select(explode(Text.tokens(textCol)).as("w")).distinct()
      .as[String]
      .map { w =>
        var s: Seq[String] = w.map(_.toString)
        merges.foreach { case (a, b) => s = applyMerge(s, a, b) }
        (w, s.length.toLong)
      }.toDF("w", "n_syms")
    docs.select(idCol.as("doc_id"), explode(Text.tokens(textCol)).as("w"))
      .join(broadcast(applied), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("n_syms")).as("n_syms"))
  }

  /** Training-window chunk plan — split each document into fixed-token
    * windows with overlap (the context-window packing step between
    * curation and training: long docs become `chunkTokens`-sized training
    * examples, consecutive windows sharing `overlap` tokens so no span
    * loses its left context at a cut).
    *
    * Pure per-document integer arithmetic:
    *   stride = chunkTokens − overlap
    *   n_chunks(n_tok) = 0 if n_tok = 0; 1 + ceil(max(0, n_tok −
    *   chunkTokens) / stride) otherwise  (one chunk covers a short doc;
    *   each extra stride of tokens adds one window)
    *   chunk i spans [i·stride, min(i·stride + chunkTokens, n_tok))
    * emitted by exploding `sequence(0, n_chunks−1)` — scan-side, no
    * shuffle, no window function; at 100 TB this is exactly as parallel
    * as the corpus scan. All integers, bit-reproducible.
    */
  def chunkPlan(docs: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = (chunkTokens - overlap).toLong
    val base = docs.select(idCol.cast("long").as("doc_id"),
      size(Text.tokens(textCol)).cast("long").as("n_tok"))
    // ceil(extra / stride) in INTEGER space: Column `/` is double division
    // (a hashed-output hazard — floor(a/b) can exceed the true quotient
    // once the numerator nears 2^52), so use SQL `div`, which is true
    // integral division at any Long magnitude
    val nChunks = when(col("n_tok") === 0, 0L)
      .otherwise(lit(1L) +
        expr(s"(greatest(n_tok - ${chunkTokens}L, 0L) + ${stride - 1}L)" +
          s" div ${stride}L"))
    base.select(col("doc_id"), col("n_tok"), nChunks.cast("long").as("n_chunks"))
      .select(col("doc_id"), col("n_tok"), col("n_chunks"),
        // sequence(0, -1) counts DOWN (the shingles lesson) — an empty doc
        // must yield zero rows, so guard the n_chunks = 0 case explicitly
        explode(when(col("n_chunks") === 0, array().cast("array<long>"))
          .otherwise(sequence(lit(0L), col("n_chunks") - 1))).as("chunk_idx"))
      .select(col("doc_id"), col("n_tok"), col("n_chunks"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + chunkTokens, col("n_tok"))
          .as("tok_end"))
  }

  /** Boilerplate-prefix detection — per source, the most common leading
    * k-token prefix and how many documents carry it (the crawl-curation
    * audit for injected headers/banners: a prefix shared by a large share
    * of one source is boilerplate, not content, and inflates every
    * dedup/quality statistic downstream).
    *
    * Scale shape: one scan projects (source, prefix) — the prefix is k
    * tokens, so the exchange carries ~bytes(k tokens)/doc, never the text;
    * one partial-agg groupBy counts prefixes; the per-source argmax is a
    * second agg over the PREFIX frame via min(struct(-cnt, prefix))
    * (count-desc, prefix-asc tie-break without a window function); doc
    * totals join in from a |sources|-row broadcast.
    *
    * Output: (source, top_prefix, n_prefix_docs, n_docs) — all
    * BIGINT/STRING (hash-gate type discipline).
    */
  def boilerplatePrefix(docs: DataFrame, srcCol: Column, textCol: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val pref = docs.select(srcCol.as("source"),
      array_join(slice(Text.tokens(textCol), 1, k), " ").as("prefix"))
    val counts = pref.groupBy(col("source"), col("prefix"))
      .agg(count(lit(1)).as("cnt"))
    val top = counts
      .groupBy(col("source"))
      .agg(min(struct((-col("cnt")).as("neg"), col("prefix").as("p")))
        .as("best"))
      .select(col("source"), col("best.p").as("top_prefix"),
        (-col("best.neg")).cast("long").as("n_prefix_docs"))
    val totals = docs.groupBy(srcCol.as("source"))
      .agg(count(lit(1)).as("n_docs"))
    top.join(broadcast(totals), Seq("source"))
      .select(col("source"), col("top_prefix"), col("n_prefix_docs"),
        col("n_docs"))
  }

  def tokenizeIds(docs: DataFrame, idCol: Column, textCol: Column,
                  vocabSize: Int = 100): DataFrame = {
    val toks = docs
      .select(idCol.as("doc_id"), posexplode(Text.tokens(textCol)))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
    val vocab = top
      .withColumn("id",
        row_number().over(Window.orderBy(col("n").desc, col("tok"))).cast("int"))
      .select(col("tok"), col("id"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0)).as("id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        count(when(col("id") === 0, 1)).as("n_oov"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            p => p.getField("id").cast("string")), " ").as("ids"))
  }
}
