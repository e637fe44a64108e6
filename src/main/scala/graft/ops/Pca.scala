package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.DotProductExpr.dot_product
import graft.queries.Tables.iscale

/** Principal component analysis over an embedding column — the
  * dimensionality-reduction step of vector prep (whitening, compact
  * ANN indexes, 2-D corpus maps). Built the only way PCA scales on a
  * cluster: ONE distributed pass reduces the data to a d×d covariance
  * matrix (metadata-sized — 64·64 rows here, never more than
  * dims² regardless of row count), the eigensolve runs on the DRIVER
  * over that tiny matrix, and the projection is a map-only pass of k
  * fused dot products per row. No iteration over the data, no
  * gradient loop — the shape mirrors how [[Similarity.ivfSearch]]
  * trains centroids (driver math over a bounded sample) but here the
  * reduction is exact, not sampled.
  *
  * Determinism: the covariance sums run through quantized decimal
  * accumulation ([[graft.queries.Tables.iscale]]) so the matrix is
  * partition-order independent, and the cyclic Jacobi solve is a pure
  * function of that matrix — fitting twice on differently-partitioned
  * input yields bit-identical components (pinned in PcaSpec).
  */
object Pca {

  /** Fitted model: `components(c)(i)` = weight of input dim i in
    * component c, rows orthonormal, ordered by descending eigenvalue
    * (sign fixed: largest-|weight| coordinate is positive). */
  final case class PcaModel(components: Array[Array[Double]],
                            eigenvalues: Array[Double],
                            means: Array[Double]) {
    def k: Int = components.length
    def d: Int = if (components.isEmpty) 0 else components(0).length
  }

  /** Exact covariance matrix of the first `dims` coordinates of
    * `vecCol`, as an upper-triangle frame (i, j, cov) with i ≤ j.
    *
    * Scale shape: explode each row to its `dims` coordinates (the
    * array rides along once per coordinate), pair them against the
    * full array per row — n·dims² product terms — and hash-aggregate
    * by (i, j). Partial (map-side) combine collapses every partition
    * to ≤ dims² rows before the one shuffle, so shuffle volume is
    * O(dims²), independent of row count; the CPU cost n·dims² is the
    * irreducible arithmetic of a covariance. Sums are
    * decimal-quantized (products at 1e-8, coordinates at 1e-6) so the
    * matrix is exact and partition-order independent — which is what
    * lets the DuckDB oracle hash-match it (q_embedding_cov). */
  def covariance(df: DataFrame, vecCol: String, dims: Int): DataFrame =
    moments(df, vecCol, dims)
      .select(col("i"), col("j"),
        ((col("__sxy").cast("double") / col("__n")) / lit(1e8) -
          ((col("__sx").cast("double") / col("__n")) / lit(1e6)) *
          ((col("__sy").cast("double") / col("__n")) / lit(1e6)))
          .as("cov"))

  /** Quantized moment sums per upper-triangle pair. The second
    * generator explodes only the TAIL slice from i (j = i + pos) —
    * half the generated rows of a full cross-explode + filter. */
  private def moments(df: DataFrame, vecCol: String, dims: Int)
    : DataFrame = {
    val d38 = DecimalType(38, 0)
    df
      .select(slice(col(vecCol).cast("array<double>"), 1, dims).as("__v"))
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"),
        posexplode(slice(col("__v"), col("i") + 1, lit(dims) - col("i")))
          .as(Seq("__p", "xj")))
      .select(col("i"), (col("i") + col("__p")).as("j"), col("xi"),
        col("xj"))
      .groupBy(col("i"), col("j"))
      .agg(
        count(lit(1)).as("__n"),
        sum(iscale(col("xi") * col("xj"), 8).cast(d38)).as("__sxy"),
        sum(iscale(col("xi"), 6).cast(d38)).as("__sx"),
        sum(iscale(col("xj"), 6).cast(d38)).as("__sy"))
  }

  /** Fit a k-component model: one covariance pass (dims² rows to the
    * driver — metadata, not data), then a cyclic Jacobi eigensolve of
    * the symmetric d×d matrix on the driver. */
  def fit(df: DataFrame, vecCol: String, dims: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dims, s"k must be in [1, $dims], got $k")
    // ONE pass: the moment sums carry both the covariance AND the
    // means (the diagonal group (i,i) sums xi) — no second scan
    val momRows = moments(df, vecCol, dims)
      .select(col("i"), col("j"), col("__n"),
        col("__sxy").cast("double").as("sxy"),
        col("__sx").cast("double").as("sx"),
        col("__sy").cast("double").as("sy"))
      .collect() // ≤ dims·(dims+1)/2 rows — driver-side metadata
    val means = new Array[Double](dims)
    val cov = Array.ofDim[Double](dims, dims)
    momRows.foreach { r =>
      val (i, j, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val (sxy, sx, sy) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // the same double arithmetic as the covariance() column expr —
      // fit and the declared q_embedding_cov stay value-identical
      val c = (sxy / n) / 1e8 - ((sx / n) / 1e6) * ((sy / n) / 1e6)
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) means(i) = (sx / n) / 1e6
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dims)(i => vectors(i)(c))
      // deterministic sign: the largest-magnitude coordinate is positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(comps, order.map(values).toArray, means)
  }

  /** Map-only projection: k fused dot products of the centered vector
    * against the broadcast-literal components — no shuffle, stays in
    * whole-stage codegen via [[graft.functions.DotProductExpr]].
    * Appends `outCol` as array<double> of length model.k. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
              outCol: String = "pc"): DataFrame = {
    val centered: Column = zip_with(
      slice(col(vecCol).cast("array<double>"), 1, model.d),
      typedLit(model.means.toSeq),
      (x, m) => x - m)
    val projected = model.components.map(c =>
      dot_product(centered, typedLit(c.toSeq)))
    df.withColumn(outCol, array(projected.toIndexedSeq: _*))
  }

  /** Deterministic Johnson–Lindenstrauss random projection: a seeded
    * Rademacher matrix (entries ±1/√k from the SplitMix64 finalizer —
    * the decorrelation lesson of [[Similarity]]'s LSH planes) maps
    * `vecCol` to k dims, preserving pairwise distances in expectation
    * exactly (E‖f(x)−f(y)‖² = ‖x−y‖²) and within JL ε bounds w.h.p.
    * The data-independent cousin of [[fit]]+[[project]]: no pass over
    * the data AT ALL — the matrix is a pure function of the seed, so
    * any engine (or the DuckDB oracle) reproduces it bit-identically.
    * Map-only, k fused dots per row, stays in whole-stage codegen. */
  def randomProjection(df: DataFrame, vecCol: String, dims: Int, k: Int,
                       seed: Int, outCol: String = "rp"): DataFrame = {
    val m = rpMatrix(k, dims, seed)
    val v = slice(col(vecCol).cast("array<double>"), 1, dims)
    df.withColumn(outCol,
      array(m.toIndexedSeq.map(row => dot_product(v, typedLit(row.toSeq))): _*))
  }

  /** The seeded ±1/√k Rademacher matrix (k rows × dims cols). */
  def rpMatrix(k: Int, dims: Int, seed: Int): Array[Array[Double]] = {
    val s = 1.0 / math.sqrt(k.toDouble)
    Array.tabulate(k, dims) { (r, c) =>
      val z = Similarity.mix64(
        (seed.toLong << 40) ^ (r.toLong << 20) ^ c.toLong)
      if (z >= 0) s else -s
    }
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS).
    * Deterministic fixed sweep order; converges quadratically — 20
    * sweeps is far past machine precision for d ≤ a few hundred,
    * the regime the d×d driver matrix is bounded to by design. */
  private[ops] def jacobiEigen(m: Array[Array[Double]])
    : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 40 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // smaller root of t² + 2θt − 1 = 0 (the stable branch)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
