package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** End-to-end LLM training-data pipeline demo over the documents table:
  * fingerprint → exact dedup → fuzzy dedup (MinHash + transitive
  * groups) → language filter → quality threshold → PII scrub, with
  * per-stage survivor counts. Run:
  *   sbt "runMain graft.tools.CorpusDemo [sfDir]"
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // corpus with planted exact duplicates (the driver data has none)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.select("doc_id", "text", "lang")
      .unionByName(docs.limit(100).select(
        (col("doc_id") + 100000).as("doc_id"), col("text"), col("lang")))
    println(s"input docs:          ${corpus.count()}")

    // 1. exact dedup on the normalized fingerprint
    val exact = Dedup.exactDeterministic(
      corpus.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
      keys = Seq("fp"), tieBreaker = "doc_id").drop("fp")
    println(s"after exact dedup:   ${exact.count()}")

    // 2. fuzzy dedup: MinHash-LSH pairs -> transitive groups -> one rep
    val fuzzy = Dedup.dedupCorpus(exact, "doc_id", "text",
      numHashes = 32, bands = 8, jaccardThreshold = 0.9)
    println(s"after fuzzy dedup:   ${fuzzy.count()}")

    // 3. language + quality gates, then PII scrub
    val cleaned = fuzzy
      .filter(col("lang").isin("en", "de", "fr", "es"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .withColumn("text", TextAnalysis.redactPii(col("text")))
    val survivors = cleaned.count()
    println(s"after lang+quality:  $survivors")
    if (survivors == 0) {
      println("nothing survived the gates - no budget/publish stages")
      spark.stop()
      return
    }

    cleaned.select("doc_id", "lang", "quality").show(5)

    // 4. token budget for the surviving corpus (what a tokenizer run
    // will cost), then persist as an optimized, stats-backed table
    val budget = cleaned.agg(
      sum(TextAnalysis.tokenCount(col("text"))).as("ws_tokens"),
      sum(TextAnalysis.approxBpeTokenCount(col("text"))).as("bpe_tokens"))
      .head()
    println(s"token budget:        ws=${budget.getLong(0)} bpe=${budget.getLong(1)}")

    val st = new graft.storage.BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_corpus_demo").toString + "/corpus"
    st.write(cleaned, out, "delta", "overwrite")
    graft.storage.Optimize.run(spark, st, out, clusterBy = Seq("doc_id"))
    graft.storage.DataSkipping.collectStats(spark, out, Seq("doc_id"))
    println(s"published:           $out (optimized, doc_id-clustered, stats-backed)")
    spark.stop()
  }
}
