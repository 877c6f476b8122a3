package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) building blocks over an embedding
  * table — the clustering pass a training-data pipeline runs for corpus
  * mixing / domain discovery (cluster-then-sample curation).
  *
  * Scale shape, per iteration:
  *   - ASSIGN: centroids are a k-row broadcast; distance is the codegen'd
  *     expansion ‖v‖² − 2·v·c + ‖c‖² ([[Similarity.dot]]) and the argmin is
  *     a partial-aggregated `min(struct(dist, cid))` — one scan, no shuffle
  *     of the vectors, exchange carries one row per vector.
  *   - UPDATE: per-dimension sums go through `posexplode` + `groupBy
  *     (cluster, pos)` — the explode is map-side only, partial aggregation
  *     collapses it to k·dim rows per input partition before the exchange,
  *     so the shuffle is O(k·dim·partitions) regardless of corpus size. The
  *     new centroid table (k·dim rows) is reassembled with
  *     `array_sort(collect_list(struct(pos, c)))` — deterministic because
  *     `pos` is a total order within each cluster.
  *
  * Determinism (the driver gate hashes doubles at 6 dp): per-dimension sums
  * are DECIMAL(28,12) — exact, order-independent — so centroids are
  * bit-identical to the oracle's; distances then reuse the same sequential
  * dot product on both sides ([[graft.functions.DotProductD]] vs DuckDB's
  * `list_dot_product`), and inertia is a DECIMAL(28,6) sum. Nothing depends
  * on float summation order anywhere in the loop.
  */
object Kmeans {

  /** Scaled-long (×10¹²) value of Spark's double→DECIMAL(28,12) cast of
    * `x` — i.e. of `BigDecimal.valueOf(x).setScale(12, HALF_UP)` — or
    * `Long.MinValue` when the fast path cannot PROVE the rounding, in
    * which case the caller must run the BigDecimal spelling itself
    * (r17 covariance fast path; the sentinel is unreachable as a result
    * because provable values are capped at |x|·10¹² < 4·10¹⁸).
    *
    * Proof obligation: the target rounds the SHORTEST-REPR decimal of
    * `x` (what `BigDecimal.valueOf` parses) half-up at 12 dp, while the
    * fast path rounds `y = |x|·1e12` computed in doubles. The two can
    * only differ when the true scaled value sits within
    * eps = ulp(|x|)/2·1e12 + ulp(y) of a k+0.5 rounding boundary
    * (shortest-repr error + multiply rounding + the y+0.5 addition
    * rounding, each ≤ ulp(y)/2); the fast path therefore
    * REFUSES (returns the sentinel) whenever y is within eps of such a
    * boundary, and for y ≥ 2⁵² (where eps ≥ 0.5 covers every boundary)
    * it refuses always. KmeansSpec pins fast ≡ BigDecimal over random
    * magnitudes and adversarial boundary values.
    */
  private[graft] def q12Fast(x: Double): Long = {
    if (x == 0.0) return 0L // covers -0.0: valueOf(-0.0) is decimal 0
    val ax = math.abs(x)
    val y = ax * 1e12
    if (!(y < 4.0e18)) return Long.MinValue // also rejects NaN/Inf
    val eps = Math.ulp(ax) * 5e11 + Math.ulp(y)
    val fl = Math.floor(y)
    if (math.abs((y - fl) - 0.5) <= eps) return Long.MinValue
    val l = Math.floor(y + 0.5).toLong
    if (x > 0) l else -l
  }

  /** Nearest-centroid assignment: (vec_id, v, cluster, dist2), ties broken
    * by smallest centroid id. `cents` must be (cid, cv) and small (k rows).
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val dist2 = (Similarity.dot(col("v"), col("v"))
      - lit(2.0) * Similarity.dot(col("v"), col("cv"))) +
      Similarity.dot(col("cv"), col("cv"))
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"),
        struct(dist2.as("d"), col("cid")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min(col("dc")).as("best"), first(col("v")).as("v"))
      .select(col("vec_id"), col("v"),
        col("best.cid").as("cluster"), col("best.d").as("dist2"))
  }

  /** One Lloyd update: recompute centroids as the per-cluster mean of the
    * assigned vectors (exact decimal sums — see class doc). Returns the new
    * (cid, cv) centroid table, k rows.
    */
  def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double")
        / count(lit(1))).as("c"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cluster").as("cid"),
        transform(col("pc"), p => p.getField("c")).as("cv"))

  /** Per-LABEL scatter diagnostics over a labelled embedding table — the
    * class-separability statistics (within-class and between-class sum of
    * squares, the LDA/Fisher decomposition) an embedding-quality audit
    * computes before trusting labels for clustering-based curation.
    *
    * Arithmetic is the class's exactness contract end-to-end: per-label and
    * global centroids from DECIMAL(28,12) per-dimension sums (order-free ⇒
    * engine-exact doubles), distances via the shared sequential-dot
    * identity, within-SS through a DECIMAL(28,6) sum. Exchanges carry
    * O(labels·dim) centroid rows and one (label, 2 doubles) row per label —
    * never vectors.
    *
    * Output: (label, n, within_ss, between_ss), one row per label.
    */
  def labelScatter(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col("label"),
      Similarity.toDouble(col("embedding")).as("v"))
    def centroidOf(grouped: DataFrame, keys: Column*): DataFrame = grouped
      .groupBy((keys :+ col("pos")): _*)
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double")
        / count(lit(1))).as("c"))
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select((keys :+ transform(col("pc"), p => p.getField("c")).as("cv")): _*)
    val cents = centroidOf(e.select(col("label"), posexplode(col("v"))), col("label"))
    val global = centroidOf(e.select(lit(1).as("g"), posexplode(col("v"))), col("g"))
      .select(col("cv").as("gv"))
    def dist2(a: Column, b: Column): Column =
      (Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b)) + Similarity.dot(b, b)
    val within = e.join(cents, Seq("label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(dist2(col("v"), col("cv")).cast("decimal(28,6)"))
          .cast("double").as("within_ss"))
    within
      .join(cents, Seq("label"))
      .crossJoin(broadcast(global))
      .select(col("label"), col("n"), col("within_ss"),
        (col("n") * dist2(col("cv"), col("gv"))).as("between_ss"))
  }

  /** Upper-triangle covariance matrix of the embedding dimensions — the
    * second-moment summary PCA/whitening starts from, and the
    * dimension-correlation audit an embedding space gets before anyone
    * trusts distances in it.
    *
    *   cov(i,j) = (Σ xᵢxⱼ − n·μᵢ·μⱼ) / (n−1)
    *
    * Engine-exact: Σxᵢxⱼ and Σxᵢ accumulate in DECIMAL(28,12)
    * (order-independent), the closed form then runs in doubles in a pinned
    * op order, rounded to 6 dp.
    *
    * Scale shape: pair products accumulate in a PER-PARTITION kernel
    * (mapPartitions, primitive index loops) into d(d+1)/2 exact-decimal
    * cells — state is O(d²) per partition regardless of row count, and the
    * exchange carries one (i, j, n, subtotal) row per cell per partition
    * (32 partitions × 2080 cells at d=64 — KBs). The per-dim mean frame
    * (d rows) broadcasts back into the d²-row pair frame.
    *
    * The kernel replaced a nested `transform`/`slice` array lambda (round
    * 7): Spark's higher-order functions are CodegenFallback — interpreted,
    * one boxed struct per pair per row — and the explode fed 4M rows to the
    * aggregate at sf0.1. Measured 7.0 s → 0.5 s for the identical result.
    * Per-element quantization `BigDecimal.valueOf(xy).setScale(12
    * , HALF_UP)` is exactly Spark's double→DECIMAL(28,12) cast (shortest
    * decimal representation, HALF_UP), so the oracle contract is unchanged;
    * decimal addition is exact and therefore order/partitioning-independent.
    *
    * Output: (i, j, n, cov) for i ≤ j, ordered by (i, j).
    */
  def covarianceMatrix(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(Similarity.toDouble(col("embedding")).as("v"))
    // ONE corpus scan: the kernel accumulates both the d(d+1)/2 pair-product
    // cells AND the d per-dim sums (emitted as j = -1 rows), so the means
    // frame below derives from the same exchange instead of re-scanning the
    // corpus — at 100 TB that is the difference between 1 and 2 full passes.
    val parts = e.as[Seq[Double]].mapPartitions { it =>
      var dim = -1
      var n = 0L
      // r17 fast path: each cell keeps a scaled-long (×10¹²) lane plus a
      // lazily-touched exact BigDecimal lane. q12Fast PROVES an element's
      // quantization equals the double→DECIMAL(28,12) cast or refuses —
      // refused elements run the original BigDecimal spelling into the BD
      // lane; a long lane that would overflow spills its running total
      // into the BD lane first. Sums of PROVEN-IDENTICAL integers are
      // exact in either representation, so every emitted cell is
      // bit-identical to the pure-BigDecimal kernel (KmeansSpec pins the
      // element quantization adversarially and the cell totals on the
      // fixture; r17 A/B'd hash-parity at sf0.001/0.01/0.1). Measured
      // 2.0 s → 0.2 s for the sf0.1 accumulation.
      var accL: Array[Long] = null
      var accBD: Array[java.math.BigDecimal] = null
      var sumsL: Array[Long] = null
      var sumsBD: Array[java.math.BigDecimal] = null
      def add(lts: Array[Long], bds: Array[java.math.BigDecimal], k: Int,
          x: Double): Unit = {
        val q = q12Fast(x)
        if (q != Long.MinValue) {
          val a = lts(k)
          val s = a + q
          if (((a ^ s) & (q ^ s)) < 0) { // long overflow: spill the lane
            bds(k) = (if (bds(k) == null) java.math.BigDecimal.ZERO else bds(k))
              .add(java.math.BigDecimal.valueOf(a, 12))
            lts(k) = q
          } else lts(k) = s
        } else
          bds(k) = (if (bds(k) == null) java.math.BigDecimal.ZERO else bds(k))
            .add(java.math.BigDecimal.valueOf(x)
              .setScale(12, java.math.RoundingMode.HALF_UP))
      }
      def fin(lts: Array[Long], bds: Array[java.math.BigDecimal],
          k: Int): BigDecimal = {
        val l = java.math.BigDecimal.valueOf(lts(k), 12)
        BigDecimal(if (bds(k) == null) l else l.add(bds(k)))
      }
      // null vectors are SKIPPED, matching the explode-based spelling this
      // kernel replaced (explode of a null array emits no rows).
      it.foreach { v =>
        if (v != null) {
          if (dim < 0) {
            dim = v.length
            accL = new Array[Long](dim * (dim + 1) / 2)
            accBD = new Array[java.math.BigDecimal](dim * (dim + 1) / 2)
            sumsL = new Array[Long](dim)
            sumsBD = new Array[java.math.BigDecimal](dim)
          }
          require(v.length == dim,
            s"ragged embedding dims: saw $dim then ${v.length}")
          var idx = 0
          var i = 0
          while (i < dim) {
            val xi = v(i)
            // per-element quantization = Spark's double→DECIMAL(28,12) cast
            // (shortest-repr BigDecimal, HALF_UP), so the mean matches the
            // old posexplode + decimal-sum spelling bit-for-bit
            add(sumsL, sumsBD, i, xi)
            var j = i
            while (j < dim) {
              add(accL, accBD, idx, xi * v(j))
              idx += 1
              j += 1
            }
            i += 1
          }
          n += 1
        }
      }
      if (dim < 0) Iterator.empty
      else {
        val out = Array.newBuilder[(Int, Int, Long, BigDecimal, Int)]
        out.sizeHint(accL.length + dim)
        var idx = 0
        var i = 0
        while (i < dim) {
          // j = -1 marker row: this partition's Σxᵢ (for the mean)
          out += ((i, -1, n, fin(sumsL, sumsBD, i), dim))
          var j = i
          while (j < dim) {
            // pdim rides along so the groupBy can detect RAGGED DIMS ACROSS
            // partitions — the in-partition require above can't see them,
            // and without the check differing dims would silently merge
            // into wrong per-cell n/sums.
            out += ((i, j, n, fin(accL, accBD, idx), dim))
            idx += 1
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }
    }.toDF("i", "j", "pn", "psxy", "pdim")
    // ONE aggregation job over the kernel exchange; the result is d(d+1)/2
    // pair cells + d sum rows — O(d²) ROWS REGARDLESS OF CORPUS SIZE — so
    // the closed-form finish runs on the driver (the Pca-Jacobi precedent:
    // KBs of corpus-independent arithmetic). Joining a means frame back
    // instead would duplicate the kernel subtree per join branch (Spark
    // has no DataFrame-level CTE sharing), re-scanning the corpus 3×.
    val agged = parts.groupBy(col("i"), col("j"))
      .agg(sum(col("pn")).as("n"), sum(col("psxy")).as("sxy"),
        min(col("pdim")).as("dim_lo"), max(col("pdim")).as("dim_hi"))
      .collect()
    val dims = agged.iterator.flatMap(r =>
      Iterator(r.getAs[Int]("dim_lo"), r.getAs[Int]("dim_hi"))).toSet
    require(dims.size <= 1,
      s"ragged embedding dims across partitions: ${dims.toSeq.sorted.mkString(" vs ")}")
    // mu_i = Σxᵢ (exact decimal) as double / n — the identical op sequence
    // as the old posexplode + decimal-sum + cast spelling
    val mu: Map[Int, Double] = agged.iterator
      .filter(_.getAs[Int]("j") == -1)
      .map(r => r.getAs[Int]("i") ->
        r.getAs[java.math.BigDecimal]("sxy").doubleValue / r.getAs[Long]("n"))
      .toMap
    val cells = agged.iterator
      .filter(_.getAs[Int]("j") >= 0)
      .map { r =>
        val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
        val n = r.getAs[Long]("n")
        val sxy = r.getAs[java.math.BigDecimal]("sxy").doubleValue
        // same op order as the previous Column spelling:
        // round((sxy − n·mu_i·mu_j)/(n−1), 6); + 0.0 normalizes -0.0
        val cov = java.math.BigDecimal
          .valueOf((sxy - n * mu(i) * mu(j)) / (n - 1))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
        (i, j, n, cov)
      }
      .toSeq.sortBy(c => (c._1, c._2))
    cells.toDF("i", "j", "n", "cov")
  }

  /** Per-cluster fit summary after `steps` Lloyd iterations from `cents0`:
    * (cluster, n, inertia) with inertia an exact DECIMAL(28,6) sum of the
    * squared distances — the convergence metric a fit loop watches.
    */
  def fitSummary(vecs: DataFrame, cents0: DataFrame, steps: Int): DataFrame = {
    var cents = cents0
    for (_ <- 1 to steps) cents = update(assign(vecs, cents))
    assign(vecs, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("dist2").cast("decimal(28,6)")).cast("double").as("inertia"))
      .orderBy(col("cluster"))
  }
}
