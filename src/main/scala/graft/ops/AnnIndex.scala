package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.Fs

/** Persistence for trained ANN indexes ([[Similarity.IvfPqIndex]]) —
  * the missing half of production vector serving: the index is built
  * ONCE over the corpus (the expensive pass), written as two tiny
  * parquet dirs, and every later job / stream micro-batch loads it
  * and serves queries with encode + ADC work only. Retraining per
  * query batch — what a naive `ivfPqSearch` caller does — re-pays the
  * training scan and yields a DIFFERENT index each run (float
  * centroid averages are layout-sensitive), so persisted indexes are
  * also what makes results reproducible across serving jobs.
  *
  * Layout (both metadata-sized — k×dim doubles and m×k quantized
  * vectors): `<path>/ivf_centroids` (cell, vec) and
  * `<path>/pq_codebooks` (subspace, cluster, cv). Each dir writes
  * through the staged crash-safe swap ([[Fs.writeSwapped]]); the two
  * dirs cannot swap ATOMICALLY together, so a crash between them can
  * leave new centroids beside old codebooks — [[load]] cross-checks
  * the pair (subvector length × m must equal the centroid dim) and
  * refuses a torn index loudly instead of serving garbage distances.
  */
object AnnIndex {

  private def centroidsPath(path: String) =
    path.stripSuffix("/") + "/ivf_centroids"
  private def codebooksPath(path: String) =
    path.stripSuffix("/") + "/pq_codebooks"

  private val centroidsSchema = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false))))

  def save(spark: SparkSession, path: String,
           index: Similarity.IvfPqIndex): Unit = {
    val centRows = index.centroids.zipWithIndex.map { case (v, i) =>
      Row(i, v)
    }
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(centRows: _*), centroidsSchema)
    val books = index.codebooks.zipWithIndex.map { case (cb, s) =>
      cb.select(lit(s).as("subspace"), col("cluster"),
        col("__cv").as("cv"))
    }.reduce(_ unionByName _)
    Fs.writeSwapped(spark, centroidsPath(path), cents)
    Fs.writeSwapped(spark, codebooksPath(path), books)
  }

  def load(spark: SparkSession, path: String): Similarity.IvfPqIndex = {
    Fs.recoverAside(spark, centroidsPath(path))
    Fs.recoverAside(spark, codebooksPath(path))
    val centroids = spark.read.parquet(centroidsPath(path))
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    require(centroids.nonEmpty, s"no IVF centroids at $path")
    val booksAll = spark.read.parquet(codebooksPath(path))
    // each codebook frame is collected and re-created as a LOCAL
    // relation: serving joins broadcast these (m×k rows), and a local
    // relation keeps the plan free of m extra parquet scans per batch
    val bookRows = booksAll.select("subspace", "cluster", "cv").collect()
    require(bookRows.nonEmpty, s"no PQ codebooks at $path")
    val m = bookRows.map(_.getInt(0)).max + 1
    val dim = centroids.head.size
    // torn-index guard: the two dirs swap independently, so a crash
    // between saves can pair new centroids with old codebooks — the
    // geometry must agree or ADC would score truncated/null-padded
    // subvectors silently
    val sub = bookRows.head.getSeq[Long](2).size
    require(sub * m == dim,
      s"torn ANN index at $path: $m codebooks of $sub-dim subvectors " +
        s"do not cover the $dim-dim centroids — re-save the index")
    val cbSchema = StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("__cv", ArrayType(LongType, containsNull = false))))
    val codebooks = (0 until m).map { s =>
      val rows = bookRows.filter(_.getInt(0) == s)
        .map(r => Row(r.getInt(1), r.getSeq[Long](2)))
      spark.createDataFrame(
        java.util.Arrays.asList(rows.toIndexedSeq: _*), cbSchema)
    }
    Similarity.IvfPqIndex(centroids, codebooks, dim)
  }
}
