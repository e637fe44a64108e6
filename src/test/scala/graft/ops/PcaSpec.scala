package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PcaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("jacobiEigen: analytic 2x2 + orthonormality + A v = lambda v") {
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0)) // eigenvalues 3, 1
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(vals.sorted.zip(Array(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // columns are unit and orthogonal
    val c0 = Array(vecs(0)(0), vecs(1)(0))
    val c1 = Array(vecs(0)(1), vecs(1)(1))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(c0, c0) - 1.0) < 1e-12)
    assert(math.abs(dot(c1, c1) - 1.0) < 1e-12)
    assert(math.abs(dot(c0, c1)) < 1e-12)
    // A v = lambda v for each column
    for (c <- 0 until 2) {
      val v = Array(vecs(0)(c), vecs(1)(c))
      val av = Array(dot(m(0), v), dot(m(1), v))
      av.zip(v).foreach { case (a, x) =>
        assert(math.abs(a - vals(c) * x) < 1e-10) }
    }
  }

  // anisotropic cloud: dominant variance along (1,1,0)/sqrt2, then z
  private def cloud = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(400) { i =>
      val t = rnd.nextGaussian() * 3.0
      val u = rnd.nextGaussian() * 1.0
      val w = rnd.nextGaussian() * 0.3
      (i.toLong, Array(
        (t / math.sqrt(2) + w / math.sqrt(2)).toFloat,
        (t / math.sqrt(2) - w / math.sqrt(2)).toFloat,
        u.toFloat, (rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("covariance matches plain-Scala quantized computation") {
    val df = cloud
    val rows = df.select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect()
    val n = rows.length
    def q(x: Double, s: Double) = math.floor(x * s + 0.5)
    def covRef(i: Int, j: Int): Double = {
      val sxy = rows.map(r => q(r(i) * r(j), 1e8)).sum
      val sx = rows.map(r => q(r(i), 1e6)).sum
      val sy = rows.map(r => q(r(j), 1e6)).sum
      (sxy / n) / 1e8 - ((sx / n) / 1e6) * ((sy / n) / 1e6)
    }
    val got = Pca.covariance(df, "embedding", 4).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == 10) // upper triangle of 4x4
    got.foreach { case ((i, j), c) =>
      assert(math.abs(c - covRef(i, j)) < 1e-9, s"cov($i,$j)") }
  }

  test("fit: orthonormal components, descending eigenvalues, trace kept") {
    val model = Pca.fit(cloud, "embedding", dims = 4, k = 4)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (a <- model.components; b <- model.components) {
      val expect = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot(a, b) - expect) < 1e-8)
    }
    assert(model.eigenvalues.sliding(2).forall {
      case Array(x, y) => x >= y - 1e-12; case _ => true })
    // trace of covariance == sum of ALL eigenvalues (k = d here)
    val trace = Pca.covariance(cloud, "embedding", 4)
      .filter(col("i") === col("j"))
      .agg(sum(col("cov"))).as[Double].head()
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-8)
    // dominant direction is (1,1,0,0)/sqrt2 up to sign (sign is fixed
    // positive on the pivot coordinate, so both weights are positive)
    val pc1 = model.components(0)
    assert(math.abs(math.abs(pc1(0)) - 1 / math.sqrt(2)) < 0.05)
    assert(math.abs(math.abs(pc1(1)) - 1 / math.sqrt(2)) < 0.05)
  }

  test("projected variance per component equals its eigenvalue") {
    val model = Pca.fit(cloud, "embedding", dims = 4, k = 3)
    val proj = Pca.project(cloud, "embedding", model)
      .select(posexplode(col("pc")).as(Seq("c", "x")))
    val varByC = proj.groupBy("c")
      .agg((sum(col("x") * col("x")) / count(lit(1)) -
        pow(sum(col("x")) / count(lit(1)), 2)).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (c <- 0 until 3)
      assert(math.abs(varByC(c) - model.eigenvalues(c)) <
        1e-6 + 1e-6 * model.eigenvalues(c).abs, s"component $c")
  }

  test("reconstruction error is monotone decreasing in k") {
    val df = cloud
    val errs = (1 to 4).map { k =>
      val model = Pca.fit(df, "embedding", dims = 4, k = k)
      // residual = centered - sum_c pc_c * component_c; mean squared norm
      val proj = Pca.project(df, "embedding", model)
      val comps = model.components
      val means = model.means
      proj.select(col("embedding").cast("array<double>").as("e"), col("pc"))
        .as[(Array[Double], Array[Double])]
        .collect()
        .map { case (e, pc) =>
          val rec = Array.tabulate(4)(i =>
            means(i) + comps.indices.map(c => pc(c) * comps(c)(i)).sum)
          e.zip(rec).map { case (x, r) => (x - r) * (x - r) }.sum
        }.sum / df.count()
    }
    assert(errs.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 })
    assert(errs.last < 1e-6) // k = d reconstructs exactly
  }

  test("randomProjection: E-preserved pairwise distances on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(60)
    val k = 16
    val proj = Pca.randomProjection(emb, "embedding", 64, k, seed = 11)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("rp"))
      .as[(Long, Array[Double], Array[Double])].collect()
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- proj.indices; j <- (i + 1) until proj.length
      orig = d2(proj(i)._2, proj(j)._2) if orig > 1e-12
    } yield d2(proj(i)._3, proj(j)._3) / orig
    assert(ratios.nonEmpty)
    // unbiased in expectation: the mean ratio concentrates near 1
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
    // JL tail at k=16 is loose but bounded — no pair collapses or blows up
    assert(ratios.min > 0.05 && ratios.max < 5.0,
      s"ratio range [${ratios.min}, ${ratios.max}]")
    // matrix is deterministic: same seed → same matrix, different seed →
    // different matrix
    assert(Pca.rpMatrix(4, 8, 3).flatten.toSeq ==
      Pca.rpMatrix(4, 8, 3).flatten.toSeq)
    assert(Pca.rpMatrix(4, 8, 3).flatten.toSeq !=
      Pca.rpMatrix(4, 8, 4).flatten.toSeq)
  }

  test("refit under different partitioning is bit-identical") {
    val df = cloud
    val m1 = Pca.fit(df.repartition(1), "embedding", 4, 3)
    val m2 = Pca.fit(df.repartition(7, col("vec_id")), "embedding", 4, 3)
    assert(m1.components.flatten.toSeq == m2.components.flatten.toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.means.toSeq == m2.means.toSeq)
  }
}
