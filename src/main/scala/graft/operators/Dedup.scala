package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Near-duplicate detection for document corpora — the operators a
  * large-scale training-data pipeline runs before anything else.
  *
  * Scale design: every variant is sketch → explode block key → shuffle on
  * the block key → within-bucket pair join → exact verify. Never O(n²) over
  * the corpus; the only quadratic step is within a bucket, whose size is
  * controlled by the sketch parameters. Sketches are computed scan-side
  * inside whole-stage codegen (see [[graft.functions.Text]]).
  */
object Dedup {

  /** Exact duplicate groups: canonical (min) id per identical text.
    *
    * Scale shape — the exchange never carries documents. Grouping directly
    * by `text` is correct but ships the corpus as the shuffle key at 100 TB;
    * instead the group key is the 48-byte content fingerprint
    * `(xxhash64(text), length(text), sha2_256(text))`: one pass, map-side
    * partial aggregation collapses duplicates before the exchange, and only
    * fingerprints ever shuffle. Distinct texts get distinct keys under
    * sha2-256 collision-freedom (~2⁻²⁵⁶, with the independent xxhash64+length
    * as defense in depth) — the same assumption content-addressed storage
    * makes, and the one every at-scale dedup pipeline ships with. TRUE
    * text-comparison exactness is information-theoretically inseparable from
    * shipping the texts themselves (a fingerprint collision is undetectable
    * without comparing payloads), i.e. from the exchange this design exists
    * to avoid.
    */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(xxhash64(textCol).as("h"), length(textCol).as("len"),
        sha2(textCol, 256).as("fp"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

  /** Cap hot band buckets at their first `maxBucket` members in doc_id
    * order — the standard "too-common-to-be-informative" guard: one
    * boilerplate cluster of B docs in a single bucket creates B² candidate
    * pairs, and no cap means one hot key can dominate the whole join (AQE
    * skew-split shares the work but cannot shrink it). Keep-first-K (not
    * drop-the-bucket) so the batch cap is the SAME contract as the streaming
    * cold-bucket cap (StreamingOps.nearDupCandidatesStream: a bucket at
    * maxBucket members stops admitting) — when arrival order is id order,
    * stream and batch emit identical capped candidate sets, which is what
    * the q75 gate asserts. Docs beyond the cap still pair through their
    * other, colder bands, so recall loss is bounded by the per-band miss
    * rate. The row_number rides the band partitioning already in place
    * (window over the repartition key — no extra exchange).
    */
  private def capBuckets(banded: DataFrame, maxBucket: Int, keys: Column*): DataFrame =
    banded
      .withColumn("_bn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("doc_id"))))
      .filter(col("_bn") <= maxBucket)
      .drop("_bn")

  /** MinHash + LSH candidate pairs with signature-estimated Jaccard.
    *
    * numHashes-lane signatures over n-token shingles; bands of r lanes; a
    * pair is emitted when it shares ≥1 band bucket, with
    * `est_jaccard` = fraction of equal signature lanes. Output:
    * (doc_a, doc_b, est_jaccard), doc_a < doc_b.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleN: Int = 3,
      numHashes: Int = 32,
      numBands: Int = 8,
      threshold: Double = 0.5,
      maxBucket: Int = 10000): DataFrame = {
    val r = numHashes / numBands
    require(numBands * r == numHashes, "numBands must divide numHashes")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // repartition on the band key: the exchange materializes the (expensive)
    // sketch projection once, and the self-join's two sides become a
    // ReusedExchange instead of recomputing every sketch per side (bench:
    // 100s -> ~3s at sf0.1). Only (band, doc_id) rides the ×numBands
    // explode — signatures are fetched back by id AFTER the candidate
    // dedup, so the band shuffle moves 16-byte rows, not k-lane arrays
    val sigs = df.select(
        idCol.as("doc_id"),
        call_function("graft_minhash",
          call_function("graft_shingles", textCol, lit(shingleN)), lit(numHashes)).as("sig"))
    val bands = capBuckets(sigs
      .withColumn("band", explode(Text.bands(col("sig"), numBands, r)))
      .select(col("band"), col("doc_id"))
      .repartition(col("band")), maxBucket, col("band"))
    val a = bands.select(col("band"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("doc_id").as("doc_b"))
    val cand = a.join(b, Seq("band")) // shuffle on band key only — no corpus cross join
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          e => e === 1)).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** MinHash-LSH near-duplicate pairs, exact-verified: banding proposes
    * candidates, exact n-gram Jaccard (integer set sizes — bit-reproducible
    * in any engine) confirms them. Output: (doc_a, doc_b, jaccard) with
    * jaccard ≥ threshold, doc_a < doc_b — equal to the exact all-pairs
    * answer up to LSH recall.
    *
    * Band geometry is chosen so that recall IS effectively exact: with
    * r = 2 rows/band and b = 64 bands, a pair at J = 0.5 misses every band
    * with probability (1 − 0.5²)⁶⁴ ≈ 1e-8, and shares ≤ 1 band (the
    * `minBandMatches = 2` candidate floor) with probability ≈ 2e-7 — which
    * is why this query can be hash-checked against an exact DuckDB oracle
    * (SparkEntry q23) instead of settling for a rows-only gate. Cost stays
    * LSH-shaped: candidates come from the band equi-join (never
    * all-pairs), the band-match floor strips the accidental single-band
    * collision mass (quadratic in corpus size — the measured 100× probe
    * pathology, BASELINE r10), and the exact verify runs only on the
    * surviving candidates.
    *
    * `minBandMatches` × `maxBucket` interaction (the recall fine print):
    * the floor counts a pair's SURVIVING shared bands — a band whose
    * bucket is over `maxBucket` keeps only its first maxBucket members by
    * id, so a pair meeting there may not register that band. A true pair
    * at J = 0.5 shares ~16 of 64 bands, so it reaches the floor unless
    * ≥ 15 of its shared bands are simultaneously over-cap AND cap-split
    * the pair — only possible for pairs inside a boilerplate cluster of
    * ≥ maxBucket near-identical docs, where dropping intra-cluster pairs
    * is the cap's documented too-common-to-be-informative trade
    * regardless of the floor (at floor 1 the same pair needed all 16
    * bands capped away; the floor moves that from 16 to 15 — not a new
    * regime). Callers screening corpora where hot clusters must stay
    * fully paired should raise `maxBucket`, not lower the floor; the
    * DedupSpec pins that the floor leaves the verified output unchanged
    * on the gate fixtures.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleN: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 64,
      threshold: Double = 0.5,
      maxBucket: Int = 10000,
      minBandMatches: Int = 2): DataFrame = {
    val r = numHashes / numBands
    require(numBands * r == numHashes, "numBands must divide numHashes")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.select(idCol.as("doc_id"),
        call_function("graft_shingles", textCol, lit(shingleN)).as("sh"))
      .withColumn("n", size(col("sh")))
    // project the signature away BEFORE the band shuffle: unlike
    // minhashLsh (whose est_jaccard needs sig on both sides), the verify
    // step only needs ids — carrying the k-lane sig through a ×numBands
    // explode would move ~numBands·k·8 bytes per doc instead of 16
    val sigs = capBuckets(base.select(col("doc_id"),
        call_function("graft_minhash", col("sh"), lit(numHashes)).as("sig"))
      .withColumn("band", explode(Text.bands(col("sig"), numBands, r)))
      .select(col("band"), col("doc_id"))
      .repartition(col("band")), maxBucket, col("band"))
    val a = sigs.select(col("band"), col("doc_id").as("doc_a"))
    val b = sigs.select(col("band"), col("doc_id").as("doc_b"))
    // candidate ids only — the shuffle after the band join moves 16-byte
    // pairs, not signatures; shingle sets are fetched back by id for the
    // (sparse) verify step. The groupBy replaces a bare distinct(): SAME
    // exchange (partial-agg'd map-side), but counting shared bands lets
    // the ≥ minBandMatches floor kill the accidental-collision mass
    // BEFORE the verify joins drag shingle arrays around. The math: at
    // J = threshold = 0.5 a true pair shares Binomial(64, 0.25) ≈ 16
    // bands — P(≤ 1) ≈ 2·10⁻⁷, so recall stays effectively exact — while
    // a background pair (J ≈ 10⁻³) shares ≥ 2 bands with P ≈ 2·10⁻⁹ vs
    // ≥ 1 at 6·10⁻⁵: the floor removes ~99.97 % of false candidates.
    // Measured at the 100× probe (BASELINE r10): the single-band noise
    // candidates were 75 M rows carrying ~2 KB shingle payloads each
    // through the verify — the whole shuffle-exponent-2.2 pathology.
    val cand = a.join(b, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= minBandMatches)
      .select(col("doc_a"), col("doc_b"))
    // one id-partitioned exchange of the shingle sets, reused by BOTH
    // verify joins (the doc_a/doc_b renames are projections on top of the
    // same exchange) — without it each join recomputes every doc's
    // shingles from scratch
    val sets = base.repartition(col("doc_id"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), Seq("doc_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0) // empty shingle sets have no similarity
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("c"), col("n_a"), col("n_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit sketches, 4×16-bit pigeonhole blocking,
    * exact hamming verify ≤ maxHamming (≤ 3 guarantees no false negatives
    * from blocking; a chunk bucket hotter than `maxBucket` keeps only its
    * first maxBucket members by id, which can only lose pairs whose every
    * shared chunk is that hot — the too-common-to-be-informative trade).
    * Output: (doc_a, doc_b, hamming).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    hamming64Pairs(df.select(idCol.as("doc_id"),
        call_function("graft_simhash", Text.tokens(textCol)).as("sk")),
      maxHamming, maxBucket)
  }

  /** Pigeonhole-blocked near-dup pair join over ANY 64-bit sketch column —
    * the shared kernel of [[simhashPairs]] (text) and the perceptual image
    * hash family ([[graft.operators.Multimodal.imageDHash]]): candidates
    * meet through an equi-join on their 4×16-bit sketch chunks (hamming
    * ≤ 3 ⇒ at least one identical chunk, so blocking at maxHamming ≤ 3
    * loses NO pairs and the blocked plan equals the all-pairs answer;
    * beyond 3 the blocking is a recall bet), then the exact 64-bit hamming
    * verifies. Input: (doc_id, sk); output: (doc_a, doc_b, hamming),
    * doc_a < doc_b.
    *
    * Scale shape: the only exchange carries (chunk_i, 16-bit chunk, id,
    * 8-byte sketch) rows ×4 per doc — never payloads, never all-pairs; the
    * within-bucket quadratic is bounded by `maxBucket` (keep-first-K by
    * id, the [[capBuckets]] contract: a pair dropped here shared ONLY
    * over-cap chunks — the too-common-to-be-informative trade).
    */
  def hamming64Pairs(
      sketches: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    val sk = capBuckets(sketches.select(col("doc_id"), col("sk"))
      .withColumn("chunk_i", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", element_at(Text.chunks16(col("sk")), col("chunk_i") + 1))
      // materialize sketches once; self-join reuses the exchange
      .repartition(col("chunk_i"), col("chunk")), maxBucket, col("chunk_i"), col("chunk"))
    val a = sk.select(col("chunk_i"), col("chunk"), col("doc_id").as("doc_a"), col("sk").as("sk_a"))
    val b = sk.select(col("chunk_i"), col("chunk"), col("doc_id").as("doc_b"), col("sk").as("sk_b"))
    a.join(b, Seq("chunk_i", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Text.hamming64(col("sk_a"), col("sk_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over an undirected near-duplicate edge list —
    * the step that turns pairwise candidates (minhashNearDups, simhashPairs,
    * cosineDupPairs) into dedup GROUPS: every doc gets the min doc id of its
    * component as `component_id`, so "keep one per cluster" is a single
    * equality test. Input: (doc_a, doc_b); output: (doc_id, component_id),
    * one row per node that appears in ≥ 1 pair.
    *
    * Algorithm: iterative min-label propagation with pointer jumping
    * (hash-to-min family — Rastogi et al., "Finding Connected Components in
    * Map-Reduce in Logarithmic Rounds"). Each round every node takes
    *   lbl ← min(lbl, min over neighbors' lbl, lbl(lbl))
    * The neighbor step moves the min one hop; the lbl(lbl) jump doubles the
    * path already covered, so rounds are O(log diameter), not O(diameter) —
    * a chain of n docs converges in ~log₂ n rounds. Labels only decrease and
    * are bounded below by the component min, so the fixpoint is exact.
    *
    * Scale shape: the edge list is symmetrized, pre-partitioned on the join
    * key, and materialized ONCE. Materialization is localCheckpoint by
    * default (single-JVM stand-in) or a RELIABLE `checkpoint()` when
    * `checkpointDir` is given — the multi-executor deploy path; identical
    * labels either way (asserted in DedupSpec). Per round: one equi-join
    * edges⋈labels + partial-aggregated min
    * (never materializes neighborhoods), one labels self-join, one bounded
    * label table rewrite. Everything that shuffles is pairs of 8-byte ids.
    * Near-dup graphs are additionally benign: components are boilerplate
    * clusters whose size the LSH bucket caps already bound, so 2-3 rounds is
    * typical. Convergence is checked (cheap agg on the checkpointed result)
    * and non-convergence throws rather than returning a wrong partition.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    // Materialization per round: with `checkpointDir` set, a RELIABLE
    // checkpoint (survives executor loss — the multi-executor deploy path:
    // point it at HDFS/S3); default is localCheckpoint, the single-JVM
    // stand-in (blocks cached on the one executor — fine on local[n],
    // lost-block-fatal on a real cluster). Both cut the growing lineage
    // that would otherwise re-run all prior rounds each iteration.
    val sc = pairs.sparkSession.sparkContext
    // set-only-when-unset with a WARN when ignored (Graph.ensureCheckpointDir)
    checkpointDir.foreach(Graph.ensureCheckpointDir(sc, _))
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val edges = materialize(
      pairs.select(col("doc_a").as("id"), col("doc_b").as("nbr"))
        .union(pairs.select(col("doc_b").as("id"), col("doc_a").as("nbr")))
        .distinct()
        .repartition(col("nbr"))) // the per-round join key: edges side never re-shuffles
    var labels = materialize(
      edges.groupBy(col("id")).agg(min(col("nbr")).as("nmin"))
        .select(col("id"), least(col("id"), col("nmin")).as("lbl")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label over direct neighbors (partial agg before the exchange)
      val viaNbr = edges
        .join(labels.select(col("id").as("nbr"), col("lbl").as("nlbl")), Seq("nbr"))
        .groupBy(col("id")).agg(min(col("nlbl")).as("nbr_min"))
      // pointer jump: my label's label (labels are always node ids, so the
      // self-join always hits)
      val step = materialize(labels
        .join(labels.select(col("id").as("lbl"), col("lbl").as("jump")), Seq("lbl"))
        .join(viaNbr, Seq("id"))
        .select(col("id"), col("lbl"),
          least(col("lbl"), col("jump"), col("nbr_min")).as("next"))
        .select(col("id"), col("next").as("lbl"), (col("next") < col("lbl")).as("chg")))
      converged = step.filter(col("chg")).isEmpty
      labels = step.drop("chg")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id").as("doc_id"), col("lbl").as("component_id"))
  }

  /** Full dedup-group assignment: every doc of `docs` mapped to its near-dup
    * component (singletons map to themselves) plus the `keep` flag a
    * training-data pipeline filters on — `keep` ⇔ the doc IS its component's
    * canonical (min-id) member. One broadcast-or-shuffle left join over the
    * (small) component table; `docs` itself is never shuffled wide.
    */
  def dupGroups(docs: DataFrame, idCol: Column, pairs: DataFrame): DataFrame =
    docs.select(idCol.as("doc_id"))
      .join(connectedComponents(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component_id"), col("doc_id")).as("component_id"))
      .withColumn("keep", col("doc_id") === col("component_id"))

  /** [[dupGroups]] with a QUALITY keep policy — the production variant:
    * each component keeps its highest-`quality` member (ties → min doc id)
    * instead of the min-id one — the "keep the longest / highest-scoring
    * copy" rule training-data dedup actually applies (quality is any
    * per-doc score: length, LM surprisal, a classifier). Output:
    * (doc_id, component_id, canonical_id, keep); singletons keep
    * themselves.
    *
    * Scale shape: everything [[dupGroups]] does plus one per-component
    * argmax — `max_by(doc_id, (quality, -doc_id))` partial-aggregates
    * map-side, so the extra exchange carries one row per component; the
    * canonical table joins back on component_id (broadcast at sane
    * cluster sizes). Deterministic: the (quality, -doc_id) order key is
    * unique per doc.
    */
  def dupGroupsBest(docs: DataFrame, idCol: Column, qualityCol: Column,
      pairs: DataFrame): DataFrame = {
    val comp = docs.select(idCol.as("doc_id"), qualityCol.as("q"))
      .join(connectedComponents(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"), col("q"),
        coalesce(col("component_id"), col("doc_id")).as("component_id"))
    val canon = comp.groupBy(col("component_id"))
      .agg(max_by(col("doc_id"),
        struct(col("q"), (-col("doc_id")).as("nid"))).as("canonical_id"))
    comp.join(canon, Seq("component_id"))
      .select(col("doc_id"), col("component_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** Exact n-gram Jaccard similarity for pairs blocked on `blockCol` (e.g.
    * `source`): |A∩B| / |A∪B| over distinct n-token shingle sets. All-integer
    * set sizes make the score reproducible bit-for-bit in any engine.
    * Output: (doc_a, doc_b, jaccard).
    *
    * Scale design — inverted-index similarity join, NOT within-block
    * pairwise scans (a popular block made the old plan quadratic):
    *   - explode distinct shingles, shuffle on (block, shingle)
    *   - the equi self-join meets a pair once per *shared* shingle, so
    *     count(*) per pair IS |A∩B| — exact, with no pairwise
    *     array_intersect anywhere
    *   - every pair with jaccard ≥ t > 0 shares ≥1 shingle, so no
    *     candidate is missed (exactness, not an LSH bet)
    *   - size prefilter: jaccard ≥ t ⇒ |A|/|B| ∈ [t, 1/t]; out-of-band
    *     pairs are cut before the aggregation
    *   - |A∪B| = |A| + |B| - |A∩B| — sizes ride along, no union built
    * The remaining hotspot is a single shingle shared by many docs of one
    * block (stopword-only n-grams); shingleN ≥ 3 keeps that rare, and AQE
    * skew-join splits such keys at runtime.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      blockCol: Column,
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sh = df.select(blockCol.as("blk"), idCol.as("doc_id"),
        call_function("graft_shingles", textCol, lit(shingleN)).as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("s", explode(col("sh")))
      .drop("sh")
      .repartition(col("blk"), col("s")) // materialize shingles once; self-join reuses the exchange
    val a = sh.select(col("blk"), col("s"), col("doc_id").as("doc_a"), col("n").as("n_a"))
    val b = sh.select(col("blk"), col("s"), col("doc_id").as("doc_b"), col("n").as("n_b"))
    a.join(b, Seq("blk", "s"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("n_b").cast("double") >= col("n_a") * threshold
        && col("n_a").cast("double") >= col("n_b") * threshold)
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
