package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over the embedding corpus — the dimension
  * reduction / whitening step downstream of [[Kmeans.covarianceMatrix]]
  * (q126): fit eigenvectors of the d×d sample covariance, project every
  * vector onto the top-k components as a pure scan-side map.
  *
  * Scale shape — the only corpus-sized work is covariance accumulation
  * (one partial-aggregated scan, exchanges carry d(d+1)/2 DECIMAL cells per
  * partition — [[Kmeans.covarianceMatrix]]'s contract). The
  * eigen-decomposition runs on the DRIVER over the collected d×d matrix
  * (d=64 → 32 KB; even d=4096 is 128 MB — never corpus-sized), exactly the
  * centroid/codebook constant pattern: train small, broadcast literal,
  * scan-side apply. Projection is k codegen'd `graft_dot` kernels over the
  * mean-centered vector — zero exchange, no UDF, no per-row allocation
  * beyond the centered array.
  *
  * Eigen solver: cyclic Jacobi rotations (upper-triangle sweep order fixed
  * → deterministic for a given matrix; the classic O(d³)-per-sweep method
  * whose rotations keep V exactly orthogonal to machine precision).
  * Eigenpairs are sorted by (eigenvalue DESC, index ASC) and sign-pinned
  * (largest-|component| coordinate made positive) so the basis is unique.
  */
object Pca {

  /** Fitted model: `mean(d)`, `eigenvalues(d)` descending, and
    * `components(d)(d)` — row c is the unit eigenvector for eigenvalue c.
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def d: Int = mean.length
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix (full upper
    * triangle sweeps until off-diagonal mass < `tol`·‖A‖F or `maxSweeps`).
    * Returns (eigenvalues, eigenvectors as rows), sorted descending and
    * sign-pinned. Deterministic: fixed sweep order, no pivot search.
    */
  def eigenJacobi(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val m = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var norm = 0.0
    for (i <- 0 until d; j <- 0 until d) norm += m(i)(j) * m(i)(j)
    norm = math.sqrt(norm)
    def offDiag(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += 2 * m(i)(j) * m(i)(j)
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() > tol * math.max(norm, 1e-300)) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = m(p)(q)
        if (apq != 0.0) {
          // stable rotation (Golub & Van Loan 8.4): t = sgn(θ)/(|θ|+√(θ²+1))
          val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
          val t =
            if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          val tau = s / (1.0 + c)
          val app = m(p)(p)
          val aqq = m(q)(q)
          m(p)(p) = app - t * apq
          m(q)(q) = aqq + t * apq
          m(p)(q) = 0.0
          m(q)(p) = 0.0
          for (i <- 0 until d if i != p && i != q) {
            val aip = m(i)(p)
            val aiq = m(i)(q)
            m(i)(p) = aip - s * (aiq + tau * aip)
            m(p)(i) = m(i)(p)
            m(i)(q) = aiq + s * (aip - tau * aiq)
            m(q)(i) = m(i)(q)
          }
          for (i <- 0 until d) {
            val vip = v(i)(p)
            val viq = v(i)(q)
            v(i)(p) = vip - s * (viq + tau * vip)
            v(i)(q) = viq + s * (vip - tau * viq)
          }
        }
      }
      sweep += 1
    }
    // sort descending, tiebreak original index; pin sign so the coordinate
    // with the largest |value| (lowest index on ties) is positive
    val order = (0 until d).sortBy(c => (-m(c)(c), c))
    val eigs = order.map(c => m(c)(c)).toArray
    val vecs = order.map { c =>
      val col = Array.tabulate(d)(i => v(i)(c))
      var best = 0
      for (i <- 1 until d) if (math.abs(col(i)) > math.abs(col(best))) best = i
      if (col(best) < 0) col.map(-_) else col
    }.toArray
    (eigs, vecs)
  }

  /** Collected covariance matrix (d×d doubles — KBs) from ONE
    * [[Kmeans.covarianceMatrix]] job. */
  private def covMatrixOf(emb: DataFrame): Array[Array[Double]] = {
    val cells = Kmeans.covarianceMatrix(emb)
      .select(col("i"), col("j"), col("cov")).collect()
    val d = cells.iterator.map(_.getAs[Int]("j")).max + 1
    val a = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val c = r.getAs[Double]("cov")
      a(i)(j) = c; a(j)(i) = c
    }
    a
  }

  private def meansOf(emb: DataFrame): Array[Double] =
    emb.select(posexplode(Similarity.toDouble(col("embedding"))))
      .groupBy(col("pos"))
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double")
        / count(lit(1))).as("mu"))
      .collect().map(r => r.getAs[Int]("pos") -> r.getAs[Double]("mu"))
      .sortBy(_._1).map(_._2)

  private def fitFrom(a: Array[Array[Double]], mu: Array[Double]): PcaModel = {
    val (eigs, vecs) = eigenJacobi(a)
    PcaModel(mu, eigs, vecs)
  }

  /** Fit on `emb` (an `embedding array<float>` column): ONE corpus scan
    * builds the covariance cells + means ([[Kmeans.covarianceMatrix]]),
    * the driver collects the d×d matrix (d² doubles — KBs) and runs Jacobi.
    * Covariance cells are 6-dp-rounded (the q126 contract), so eigenvalues
    * carry ~1e-6·d absolute noise — callers compare with tolerance.
    */
  def fit(emb: DataFrame): PcaModel = fitFrom(covMatrixOf(emb), meansOf(emb))

  private def litArr(a: Array[Double]): Column = array(a.map(lit).toSeq: _*)

  /** Scan-side projection of `vecCol` onto the model's top-`k` components:
    * center once (`zip_with` against the mean literal), then k codegen'd
    * `graft_dot` kernels — columns `pc0..pc(k-1)`. Zero exchange.
    */
  def projections(vecCol: Column, model: PcaModel, k: Int): Seq[Column] = {
    require(k >= 1 && k <= model.d, s"k must be in [1, ${model.d}], got $k")
    val centered = zip_with(Similarity.toDouble(vecCol), litArr(model.mean),
      (x, m) => x - m)
    (0 until k).map(c =>
      Similarity.dot(centered, litArr(model.components(c))).as(s"pc$c"))
  }

  /** Project `emb` (`vec_id`, `embedding`) onto the top-k components.
    *
    * Stages the centered vector behind a column alias (r16 optimization):
    * [[projections]] inlines `centered` into each of the k dot kernels, so
    * the interpreted zip_with centering ran k times per row; the staged
    * form centers once (CollapseProject cannot re-inline a non-cheap alias
    * consumed k > 1 times). Same values — same kernels over the same
    * centered vector.
    */
  def transform(emb: DataFrame, model: PcaModel, k: Int): DataFrame = {
    require(k >= 1 && k <= model.d, s"k must be in [1, ${model.d}], got $k")
    val centered = zip_with(Similarity.toDouble(col("embedding")),
      litArr(model.mean), (x, m) => x - m)
    emb.select(col("vec_id"), centered.as("_c"))
      .select(col("vec_id") +: (0 until k).map(c =>
        Similarity.dot(col("_c"), litArr(model.components(c))).as(s"pc$c")): _*)
  }

  /** The q128 gate — (metric, ok) booleans pinning the CONTRACT of the fit
    * (driver-side: basis orthonormality, eigenvalues descending, trace
    * preservation, eigenpair residual) and of the projection (data-side,
    * one aggregated pass: per-component projected sample variance equals
    * its eigenvalue, projected means are ~0, variance-explained floor).
    */
  def qualityReport(emb: DataFrame, k: Int, varFloor: Double): DataFrame = {
    val spark = emb.sparkSession
    // ONE covariance job serves both the fit and the residual check (the
    // round-6 version ran it twice — half of q128's cost for free)
    val a = covMatrixOf(emb)
    val model = fitFrom(a, meansOf(emb))
    val d = model.d
    // driver-side contract checks over the tiny d×d model
    var orthoErr = 0.0
    for (i <- 0 until d; j <- i until d) {
      var dp = 0.0
      for (x <- 0 until d) dp += model.components(i)(x) * model.components(j)(x)
      val want = if (i == j) 1.0 else 0.0
      orthoErr = math.max(orthoErr, math.abs(dp - want))
    }
    val descOk = (1 until d).forall(c =>
      model.eigenvalues(c - 1) >= model.eigenvalues(c) - 1e-9)
    var trace = 0.0
    for (i <- 0 until d) trace += a(i)(i)
    val traceOk = math.abs(model.eigenvalues.sum - trace) <=
      1e-6 * math.max(1.0, math.abs(trace))
    var resid = 0.0
    for (c <- 0 until d; i <- 0 until d) {
      var av = 0.0
      for (x <- 0 until d) av += a(i)(x) * model.components(c)(x)
      resid = math.max(resid,
        math.abs(av - model.eigenvalues(c) * model.components(c)(i)))
    }
    val topVar = model.eigenvalues.take(k).sum
    val varExplained = if (trace > 0) topVar / trace else 0.0
    // data-side: projected variance per component ≈ eigenvalue (the rounded
    // covariance cells put ~1e-6·d noise on each λ; 1e-3 relative is generous)
    val proj = transform(emb, model, k)
    val varChecks = (0 until k).flatMap { c =>
      val lam = model.eigenvalues(c)
      Seq(
        (abs(var_samp(col(s"pc$c")) - lit(lam)) <=
          lit(1e-3) * lit(math.max(1.0, lam))).as(s"var$c"),
        (abs(avg(col(s"pc$c"))) <= lit(1e-6)).as(s"mean$c"))
    }
    val agg = proj.agg(count(lit(1)).as("n"), varChecks: _*)
      .select(
        (col("n") > 0).as("nonempty"),
        (0 until k).map(c => col(s"var$c")).reduce(_ && _).as("var_ok"),
        (0 until k).map(c => col(s"mean$c")).reduce(_ && _).as("mean_ok"))
    agg.select(explode(array(
        struct(lit("pca_basis_orthonormal").as("metric"),
          lit(orthoErr <= 1e-9).as("ok")),
        struct(lit("pca_eigenvalues_descending").as("metric"),
          lit(descOk).as("ok")),
        struct(lit("pca_trace_preserved").as("metric"),
          lit(traceOk).as("ok")),
        struct(lit("pca_eigenpair_residual").as("metric"),
          lit(resid <= 1e-6).as("ok")),
        struct(lit("pca_variance_floor").as("metric"),
          lit(varExplained >= varFloor).as("ok")),
        struct(lit("pca_projected_variance_matches").as("metric"),
          col("var_ok").as("ok")),
        struct(lit("pca_projected_mean_zero").as("metric"),
          col("mean_ok").as("ok")),
        struct(lit("pca_nonempty").as("metric"), col("nonempty").as("ok")))))
      .select(col("col.metric").as("metric"), col("col.ok").as("ok"))
      .orderBy(col("metric"))
  }
}
