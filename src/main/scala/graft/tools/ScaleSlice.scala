package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an N× scaled slice of a testdata directory for scale
  * rehearsals (`SCALE.md`): every fact-ish table becomes the union of
  * N key-shifted copies, while genuine dimension tables (region,
  * nation) stay as-is — exactly how a real warehouse scales. Key
  * shifts use one shared offset stride so every foreign key keeps
  * resolving within its own copy (copy k's orders reference copy k's
  * customers, etc.).
  *
  * Two columns get more than a shift, both to keep WORK DENSITY
  * constant under scaling (the honest rehearsal property):
  *
  *  - `documents.text`: every token is prefixed with a per-copy tag.
  *    Verbatim copies would make every doc a 10-way exact/near dup —
  *    LSH candidate pairs would grow quadratically in the copy factor
  *    and the rehearsal would measure an artifact of the synthesis,
  *    not the operator. Tagged tokens give disjoint shingle spaces, so
  *    per-doc candidate density matches the base slice. `n_chars` is
  *    recomputed to keep its invariant.
  *  - `embeddings.embedding`: a small per-copy additive offset, so
  *    copies are near but not identical (identical points collapse
  *    k-means and make distance ties order-dependent).
  *
  * Usage: `runMain graft.tools.ScaleSlice <srcDir> <outDir> <factor>`
  */
object ScaleSlice {

  /** FK stride between copies — far above any base key. */
  val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ScaleSlice <srcDir> <outDir> <factor>")
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try write(spark, src, out, factor) finally spark.stop()
  }

  def write(spark: SparkSession, src: String, out: String,
            factor: Int): Unit = {
    def table(n: String) = spark.read.parquet(s"$src/$n.parquet")

    // one shifted copy per k; k = 0 is the base slice unchanged
    def scaled(name: String, keyCols: Seq[String])
              (extra: (DataFrame, Int) => DataFrame = (d, _) => d)
        : DataFrame = {
      val base = table(name)
      (0 until factor).map { k =>
        val shifted = keyCols.foldLeft(base) { (d, c) =>
          d.withColumn(c, col(c) + lit(k * Stride))
        }
        extra(shifted, k)
      }.reduce(_ unionByName _)
    }

    val frames: Seq[(String, DataFrame)] = Seq(
      "region" -> table("region"),
      "nation" -> table("nation"),
      "customer" -> scaled("customer", Seq("c_custkey"))(),
      "supplier" -> scaled("supplier", Seq("s_suppkey"))(),
      "part" -> scaled("part", Seq("p_partkey"))(),
      "orders" -> scaled("orders", Seq("o_orderkey", "o_custkey"))(),
      "lineitem" -> scaled("lineitem",
        Seq("l_orderkey", "l_partkey", "l_suppkey"))(),
      "events" -> scaled("events", Seq("event_id", "user_id"))(),
      "documents" -> scaled("documents", Seq("doc_id")) { (d, k) =>
        if (k == 0) d
        else d
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      },
      "embeddings" -> scaled("embeddings", Seq("vec_id")) { (d, k) =>
        if (k == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"),
            x => (x + lit(k * 1e-4)).cast("float")))
      })

    frames.foreach { case (name, df) =>
      val target = s"$out/$name.parquet"
      df.write.mode("overwrite").parquet(target)
      // count the WRITTEN files: counting `df` would recompute the
      // whole shifted union (and the per-token regexp rewrite) a
      // second time just for this log line
      println(s"[scale-slice] $name: " +
        s"${spark.read.parquet(target).count()} rows")
    }
  }
}
