package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Dedup.connectedComponents]] — the
  * Pregel-shaped fixed-point loop (PageRank here) expressed as per-round
  * join + aggregate plans.
  *
  * Determinism contract: ranks are FIXED-POINT BIGINTs (initial mass
  * `scale` = 10¹² per node), every step is integer arithmetic —
  * `share = rank div deg`, `rank' = (15·scale) div 100 + (85·inflow) div
  * 100` — so sums are order-independent and every engine reproduces the
  * exact same integers (no float summation order, no decimal division
  * scale rules). This is the same move as the k-means DECIMAL sums and the
  * q78 integer codes: make the arithmetic exact, then hash-gate it.
  */
object Graph {

  /** Configure the session's reliable-checkpoint dir set-only-when-unset
    * (the dir is GLOBAL SparkContext state: two jobs passing different
    * dirs must not clobber each other), but NEVER silently: when a
    * different dir already owns the session, the caller's dir is ignored
    * for materialization — correctness is unaffected (checkpoint() needs
    * SOME dir) but its reliability class is whatever the session dir is,
    * so a WARN records the decision. Shared by every checkpoint-dir
    * operator (pagerank, kCore, connectedComponents, curate).
    */
  private[operators] def ensureCheckpointDir(
      sc: org.apache.spark.SparkContext, d: String): Unit =
    sc.getCheckpointDir match {
      case None => sc.setCheckpointDir(d)
      case Some(cur) =>
        // normalization tolerance: getCheckpointDir returns the RESOLVED
        // URI (fully-qualified scheme + a generated suffix dir), so
        // qualify the caller's dir through the same FileSystem resolution
        // and compare path prefixes — raw substring containment would let
        // short or relative dirs ('/a', 'ckpt') false-positive against
        // unrelated resolved paths and silently suppress the WARN
        val qualified =
          try {
            val p = new org.apache.hadoop.fs.Path(d)
            p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
          } catch { case _: Exception => d }
        val same = cur == d || cur == qualified ||
          cur.startsWith(qualified.stripSuffix("/") + "/")
        if (!same)
          org.slf4j.LoggerFactory.getLogger("graft.operators.Graph").warn(
            s"checkpointDir '$d' ignored: session already checkpoints to " +
              s"'$cur' (set-only-when-unset; reliable materialization uses " +
              "the session dir)")
    }

  /** Damped PageRank over an UNDIRECTED edge list, `iters` synchronous
    * rounds of the fixed-point integer recurrence. `nodes` = (doc_id) —
    * every node appears in the output; isolated nodes hold the teleport
    * mass. Dangling nodes (none on an undirected graph with degree ≥ 1)
    * would simply leak their mass — the standard simplification.
    *
    * Scale shape, per round: one equi-join of the edge list against the
    * (node, rank) table on src — both shuffled by src, and AQE reuses the
    * edge side's exchange across all rounds since the edge list never
    * changes — then one partial-aggregated sum by dst; the exchange
    * carries (id, 8-byte rank) only. Degrees are computed once. Rounds are
    * a driver loop over lazy plans (the Pregel superstep barrier); the
    * rank frame is MATERIALIZED every `checkpointEvery` rounds (the
    * [[kCore]] pattern — localCheckpoint, or a reliable `checkpoint()`
    * via `checkpointDir` on a cluster) so plan depth, and with it
    * Catalyst's per-round analysis cost, stays O(checkpointEvery) at any
    * iteration count. The default is MEASURED, not guessed (ScaleProbe
    * --pagerank-only, BASELINE.md r10): the uncut lineage's per-round
    * cost grows ~linearly in round number (0.040 → 0.080 s/round from 30
    * to 90 rounds — the O(iters²) analysis tax) while one localCheckpoint
    * costs ~1.8 s at probe scale, so cutting every ~24 rounds keeps
    * per-round cost flat for deep runs without taxing shallow ones (the
    * q111 gate's iters = 5 pays zero checkpoints). The tax is driver-side
    * and data-size-independent; the checkpoint is executor-side and tiny
    * ((id, 8-byte rank) rows), so at cluster scale the cut also caps
    * stage-retry lineage depth — the failure-recovery argument that
    * matters more than wall at 100 TB.
    *
    * Output: (doc_id, rank) — fixed-point BIGINT, Σ ≈ n·scale minus
    * rounding drift.
    */
  def pagerank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L, checkpointEvery: Int = 24,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0 && checkpointEvery > 0,
      "need iters >= 0 and checkpointEvery > 0")
    // set-only-when-unset with a WARN when ignored — see ensureCheckpointDir
    checkpointDir.foreach(ensureCheckpointDir(nodes.sparkSession.sparkContext, _))
    def mat(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val dir = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val dirDeg = dir.join(deg, Seq("src"))
    val base = nodes.select(col("doc_id"))
    var rank = base.select(col("doc_id"), lit(scale).as("rank"))
    val teleport = 15L * scale / 100L
    for (i <- 1 to iters) {
      val inflow = dirDeg
        .join(rank.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), expr("rank div deg").as("share"))
        .groupBy(col("doc_id"))
        .agg(sum(col("share")).as("inflow"))
      rank = base.join(inflow, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(teleport) +
            expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100")).as("rank"))
      if (i % checkpointEvery == 0 && i < iters) rank = mat(rank)
    }
    rank
  }

  /** Exact triangle count over an UNDIRECTED edge list (doc_a, doc_b) —
    * the clustering-density audit of the near-dup graph (many triangles =
    * tight dup clusters, few = chains the keep-best pass should treat
    * differently).
    *
    * Algorithm: DEGREE-ORDERED orientation (Chiba-Nishizeki / the
    * vertex-ordering trick every distributed triangle counter uses).
    * Every edge is directed from its (degree, id)-smaller endpoint to the
    * larger; a triangle {x, y, z} then materializes as exactly ONE wedge
    * (s → b, s → c with rank(b) < rank(c)) plus the closing edge b → c —
    * counted once, no post-hoc distinct. The orientation is the scale
    * story: out-degrees under it are bounded by O(√m) on any graph (a
    * node keeps only neighbors of larger degree), so the wedge join's
    * per-key fan-out — the quadratic danger on skewed graphs, where a
    * hub's D² wedges explode — is capped at √m per node instead of
    * max-degree. Two self-joins of the oriented edge list, both
    * shuffle-partitioned on their equi keys; the count is
    * orientation-invariant, so any engine's ID-ordered 3-way join
    * (the oracle spelling) reproduces it exactly.
    *
    * Output: one row, `n_triangles` BIGINT.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
    val deg = und.select(col("u").as("n"))
      .unionByName(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // orient by the (deg, id) total order; carry the target's rank for the
    // wedge ordering below
    val oriented = und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    val w1 = oriented.select(col("s").as("a"), col("t").as("b"),
      col("dt").as("db"))
    val w2 = oriented.select(col("s").as("a2"), col("t").as("c"),
      col("dt").as("dc"))
    // wedge (a; b, c) with rank(b) < rank(c): the closing edge, if it
    // exists, is oriented b → c by the same total order
    val wedges = w1.join(w2, col("a") === col("a2")
      && struct(col("db"), col("b")) < struct(col("dc"), col("c")))
    wedges
      .join(oriented, col("s") === col("b") && col("t") === col("c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** `rounds`-round k-core peel of an UNDIRECTED edge list: each round
    * drops every node whose current degree is < k, then every edge touching
    * a dropped node — the iterative-DELETE fixpoint loop (third loop shape
    * beside [[pagerank]]'s fixed-point recurrence and
    * [[Dedup.connectedComponents]]'s pointer jumping). The 2-core of the
    * near-dup graph separates tight template clusters from pendant chains —
    * the structures [[Dedup.dupGroupsBest]] should treat differently.
    *
    * `rounds` is part of the operator contract (like pagerank's `iters`):
    * a chain of length L needs L rounds to peel fully, but real dup graphs
    * converge in a handful — callers probe convergence by checking the
    * round-over-round edge count. Scale shape per round: one partial-agg
    * degree count (exchange carries (node, count)) and two semi joins of
    * the SHRINKING edge list on its endpoints — work is monotonically
    * non-increasing. Each round's edge list is MATERIALIZED
    * (localCheckpoint, or a reliable `checkpoint()` via `checkpointDir` —
    * the [[Dedup.connectedComponents]] pattern): the round body references
    * its input ~5×, so lazy lineage would grow ~5^rounds plan nodes and
    * stall Catalyst long before any data moved.
    *
    * Output: (doc_id, deg) — surviving nodes with their in-core degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k > 0 && rounds > 0, "k and rounds must be positive")
    // set-only-when-unset with a WARN when ignored — see ensureCheckpointDir
    checkpointDir.foreach(ensureCheckpointDir(edges.sparkSession.sparkContext, _))
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    var e = materialize(edges.select(col("doc_a"), col("doc_b")))
    for (_ <- 1 to rounds) {
      val deg = e.select(col("doc_a").as("n"))
        .unionByName(e.select(col("doc_b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k)
      e = materialize(
        e.join(keep.select(col("n").as("doc_a")), Seq("doc_a"), "left_semi")
          .join(keep.select(col("n").as("doc_b")), Seq("doc_b"), "left_semi"))
    }
    e.select(col("doc_a").as("doc_id"))
      .unionByName(e.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
  }
}
