package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import org.apache.spark.sql.graftshim.ColumnBridge

/** PCA for embedding columns (X204) — the dimensionality half of the
  * ANN toolbox: project `Array[Float]` vectors onto their top-k
  * principal directions before indexing, the classic recall/IO trade
  * (Jégou et al. apply exactly this in front of PQ; [[Opq]] learns a
  * rotation, PCA learns a TRUNCATION — cheaper, and often all a
  * bloated embedding needs). Also the whitening step quality probes
  * want: variance concentrated in few directions = the embedding is
  * effectively low-rank, and `explained` quantifies it.
  *
  * Distributed shape: ONE `mapPartitions` pass accumulates the d×d
  * scatter matrix and the mean per partition (d ≤ ~1k: the d² floats
  * are executor-local scratch, merged on the driver — the same
  * bounded-model discipline as the IVF centroid tables; per-row cost
  * is d²/2 fused multiply-adds, no shuffle at all). Eigenvectors by
  * deterministic power iteration with deflation on the TINY driver
  * matrix (d×d), fixed iteration count, fixed seed-free start (basis
  * vector of max diagonal) — bit-reproducible, no RNG. Projection is
  * then a broadcast codegen-friendly dot-product map.
  *
  * Honesty contract like [[Ivf.kmeansCentroids]]: fixed iterations
  * approximate the eigenbasis (clustered eigenvalues converge
  * slowly); the spec pins orthonormality, descending explained
  * variance, and exact-recovery on a planted low-rank corpus rather
  * than agreement with a closed-form eigensolver.
  */
object Pca {

  /** The fitted model: row-major components (k × d), per-component
    * explained variance, the input mean.
    */
  final case class PcaModel(components: Array[Array[Double]],
                            explained: Array[Double],
                            mean: Array[Double]) {
    def k: Int = components.length
    def d: Int = if (components.isEmpty) 0 else components(0).length
  }

  /** Fit the top-`k` principal components of `vecCol`.
    *
    * @param iters power-iteration rounds per component (driver-side,
    *              on the d×d scatter — cheap; raise for clustered
    *              spectra)
    */
  def fit(vecs: DataFrame, k: Int, iters: Int = 30,
          vecCol: String = "embedding"): PcaModel = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    val rows = vecs.select(col(vecCol)).where(col(vecCol).isNotNull)
    // one pass: n, sum, scatter (upper triangle) per partition; fold
    // with a null zero so an all-empty input surfaces as a clear
    // require, not reduce's opaque "empty collection"
    val reduced = rows.rdd.mapPartitions { it =>
      var n = 0L
      var s: Array[Double] = null
      var m: Array[Double] = null // packed upper triangle
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        val d = v.length
        if (s == null) { s = new Array[Double](d)
          m = new Array[Double](d * (d + 1) / 2) }
        require(v.length == s.length,
          s"ragged embedding dim: ${v.length} vs ${s.length}")
        n += 1
        var i = 0
        var p = 0
        while (i < d) {
          val vi = v(i).toDouble
          s(i) += vi
          var j = i
          while (j < d) { m(p) += vi * v(j); j += 1; p += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((n, s, m))
    }.fold(null: (Long, Array[Double], Array[Double])) { (a, b) =>
      if (a == null) b
      else if (b == null) a
      else {
        require(a._2.length == b._2.length,
          s"ragged embedding dim across partitions: " +
            s"${a._2.length} vs ${b._2.length}")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        i = 0
        while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    }
    require(reduced != null,
      s"Pca.fit: no non-null vectors to fit in column '$vecCol'")
    val (n, sum, scat) = reduced
    val d = sum.length
    val mean = sum.map(_ / n)
    // covariance from the scatter: C = M/n − mean·meanᵀ (dense d×d)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var p = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = scat(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; p += 1
      }
      i += 1
    }
    // power iteration with deflation — deterministic start: the basis
    // vector of the largest remaining diagonal entry
    val comps = Array.ofDim[Double](k, d)
    val expl = new Array[Double](k)
    val work = cov.map(_.clone())
    var c = 0
    while (c < k) {
      var v = new Array[Double](d)
      val startIdx = (0 until d).maxBy(ii => (math.abs(work(ii)(ii)), -ii))
      v(startIdx) = 1.0
      var it = 0
      while (it < iters) {
        val nv = new Array[Double](d)
        var a = 0
        while (a < d) {
          var acc = 0.0
          var b = 0
          while (b < d) { acc += work(a)(b) * v(b); b += 1 }
          nv(a) = acc
          a += 1
        }
        val norm = math.sqrt(nv.map(x => x * x).sum)
        v = if (norm > 1e-12) nv.map(_ / norm) else nv
        it += 1
      }
      // eigenvalue = vᵀ (work) v; deflate work −= λ v vᵀ
      var lambda = 0.0
      var a = 0
      while (a < d) {
        var acc = 0.0
        var b = 0
        while (b < d) { acc += work(a)(b) * v(b); b += 1 }
        lambda += v(a) * acc
        a += 1
      }
      // canonical sign: largest-|coordinate| positive, so the model is
      // unique (eigenvectors are sign-ambiguous)
      val big = (0 until d).maxBy(ii => (math.abs(v(ii)), -ii))
      val signed = if (v(big) < 0) v.map(-_) else v
      comps(c) = signed
      expl(c) = math.max(lambda, 0.0)
      a = 0
      while (a < d) {
        var b = 0
        while (b < d) {
          work(a)(b) -= lambda * signed(a) * signed(b); b += 1 }
        a += 1
      }
      c += 1
    }
    PcaModel(comps, expl, mean)
  }

  /** Kernel: `out(c) = Σ_j mat(c)(j)·(vec(j) − mean(j))` — the whole
    * k×d projection as ONE codegen call per row (the [[Opq.matVec]]
    * pattern with a mean subtract). The alternative — a k×d literal
    * expression tree — is an analyzer/codegen blow-up at production
    * dims (d=768, k=64 ≈ 50k expression nodes, past whole-stage
    * codegen's 64KB method limit); here the matrix rides along as a
    * reference object and the per-row cost is k·d fused
    * multiply-adds in a tight loop. Accumulates in double;
    * `asFloat = false` keeps the double coordinates the q230/q231
    * oracles compare at 4–6dp, `asFloat = true` stores float32 for
    * index-bound projections. Null on a dim mismatch.
    */
  def centeredMatVec(vec: ArrayData, mat: Array[Array[Double]],
                     mean: Array[Double], asFloat: Boolean): GenericArrayData = {
    val d = mean.length
    if (vec.numElements() != d) return null
    val k = mat.length
    val x = new Array[Double](d)
    var j = 0
    while (j < d) { x(j) = vec.getFloat(j).toDouble - mean(j); j += 1 }
    if (asFloat) {
      val out = new Array[Float](k)
      var c = 0
      while (c < k) {
        val row = mat(c)
        var acc = 0.0
        var i = 0
        while (i < d) { acc += x(i) * row(i); i += 1 }
        out(c) = acc.toFloat
        c += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Double](k)
      var c = 0
      while (c < k) {
        val row = mat(c)
        var acc = 0.0
        var i = 0
        while (i < d) { acc += x(i) * row(i); i += 1 }
        out(c) = acc
        c += 1
      }
      new GenericArrayData(out)
    }
  }

  /** `centered_mat_vec(vec)` → array<float|double> of length k; the
    * components and mean ride along as codegen reference objects,
    * same pattern as [[Opq.MatVec]].
    */
  case class CenteredMatVec(child: Expression, mat: Array[Array[Double]],
                            mean: Array[Double], asFloat: Boolean)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(if (asFloat) FloatType else DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "centered_mat_vec"
    override def nullSafeEval(input: Any): Any =
      centeredMatVec(input.asInstanceOf[ArrayData], mat, mean, asFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
      val meanRef = ctx.addReferenceObj("mean", mean, "double[]")
      nullSafeCodeGen(ctx, ev, c => {
        s"""${ev.value} = graft.llmops.Pca.centeredMatVec($c, $matRef, $meanRef, $asFloat);
           |${ev.isNull} = ${ev.value} == null;""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): CenteredMatVec =
      copy(child = c)
  }

  /** Embedding isotropy / effective-rank report (X209) — the
    * embedding-health probe in front of every ANN/semantic-dedup
    * decision: an embedding whose variance lives in a handful of
    * directions (the anisotropy pathology of contextual embeddings,
    * Ethayarajh 2019) wastes index dimensions and makes cosine
    * thresholds unstable. One row:
    *
    *  - `n_vectors`, `dim`
    *  - `total_var` — Σλ over the full fitted spectrum (4dp)
    *  - `top1_share` — λ₁/Σλ: 1/d for isotropic, →1 for collapsed
    *  - `participation_ratio` — (Σλ)²/Σλ² (Gao et al.'s effective
    *    rank): "how many directions actually carry variance"
    *  - `effective_rank_frac` — PR/d
    *  - `centroid_norm`, `mean_norm` — ‖μ‖ vs E‖x‖: a large common
    *    component is the classic anisotropy driver
    *  - `trace_ok` — |Σλ − trace(cov)| within 1 % of trace, where
    *    trace(cov) = E‖x‖² − ‖μ‖² is recomputed from the data: the
    *    trace identity audits the power iteration's own spectrum
    *    (clustered eigenvalues converge slowly; this catches it)
    *
    * Cost: [[fit]]'s one scatter pass (k = d full spectrum — the
    * eigensolve stays a d×d driver problem) plus one aggregate for
    * the norms. No shuffle anywhere.
    */
  def isotropyReport(vecs: DataFrame, vecCol: String = "embedding",
                     iters: Int = 30): DataFrame = {
    val rows = vecs.select(col(vecCol)).where(col(vecCol).isNotNull)
    val first = rows.head(1)
    require(first.nonEmpty,
      s"isotropyReport: no non-null vectors in column '$vecCol'")
    val d = first(0).getSeq[Float](0).length
    val m = fit(rows, k = d, iters = iters, vecCol = vecCol)
    val lam = m.explained
    val tot = lam.sum
    val sumSq = lam.map(x => x * x).sum
    val pr = if (sumSq > 0) tot * tot / sumSq else 0.0
    val top1 = if (tot > 0) lam(0) / tot else 0.0
    val centroidNorm = math.sqrt(m.mean.map(x => x * x).sum)
    val sqNorm = aggregate(col(vecCol), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double"))
    rows.agg(
        count(lit(1)).as("n_vectors"),
        avg(sqrt(sqNorm)).as("__mean_norm"),
        avg(sqNorm).as("__mean_sq_norm"))
      .select(
        col("n_vectors"),
        lit(d).as("dim"),
        round(lit(tot), 4).as("total_var"),
        round(lit(top1), 4).as("top1_share"),
        round(lit(pr), 4).as("participation_ratio"),
        round(lit(pr / d), 4).as("effective_rank_frac"),
        round(lit(centroidNorm), 4).as("centroid_norm"),
        round(col("__mean_norm"), 4).as("mean_norm"),
        (abs(lit(tot) -
          (col("__mean_sq_norm") - lit(centroidNorm * centroidNorm))) <=
          greatest(lit(1e-4),
            (col("__mean_sq_norm") - lit(centroidNorm * centroidNorm))
              * 0.01)).as("trace_ok"))
  }

  /** The model's projection as a Column: `(x − mean)` dotted with each
    * component, one kernel call per row. `asFloat = false` yields
    * array<double> (full precision for contracts/audits); the default
    * float32 is the storage form for downstream indexing.
    */
  def projection(vec: Column, model: PcaModel,
                 asFloat: Boolean = true): Column =
    ColumnBridge.column(CenteredMatVec(
      ColumnBridge.expression(vec), model.components, model.mean, asFloat))

  /** Project `vecCol` onto the model: adds `outCol` =
    * `Array[Float]` of length k (centered dot products). One
    * broadcast codegen kernel call per row — no per-coordinate
    * expression tree, no shuffle; scales to production dims
    * (d=768, k=64) without leaving whole-stage codegen.
    */
  def project(vecs: DataFrame, model: PcaModel,
              vecCol: String = "embedding",
              outCol: String = "pca"): DataFrame =
    vecs.withColumn(outCol, projection(col(vecCol), model))
}
