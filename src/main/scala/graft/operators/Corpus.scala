package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * pmod, NOT `%`: for ids ≳ 3.47e9 the product wraps Long negative, and
    * `%` of a negative is negative — the keep filter `h < rate·2³²` would
    * then pass EVERY high-id row regardless of rate. Because 2³² divides
    * 2⁶⁴, pmod of the wrapped product still equals the true mathematical
    * hash, so the sampled set is unchanged for small ids and correct for
    * large ones. (Oracle-side caveat: DuckDB raises on the BIGINT overflow
    * instead of wrapping — any-engine reproducibility of the SQL spelling
    * holds for ids < 2⁶³/2654435761 ≈ 3.47e9; beyond that, engines need the
    * 128-bit or wrapped-arithmetic spelling of the same hash.)
    */
  def hashSample(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: DataFrame): DataFrame = {
    val h = pmod(idCol * lit(2654435761L) + lit(40503L), lit(4294967296L))
    df.select(idCol.as("id"), stratumCol.as("stratum"), h.cast("long").as("h"))
      .join(broadcast(rates.select(col("stratum"), col("rate"))), Seq("stratum"))
      .filter(col("h").cast("double") < col("rate") * 4294967296.0)
      .select(col("id"), col("stratum"), col("h"))
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
      budgetTokens: Long, numParts: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val maxId = docs.agg(max(idCol.cast("long"))).head().getLong(0)
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
      .select(idCol.cast("long").as("doc_id"),
        size(Text.tokens(textCol)).cast("long").as("n_tok"))
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
}
