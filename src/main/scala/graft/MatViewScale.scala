package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md rehearsal for the bucketed matview commit: hold the DELTA
  * constant (one captured merge touching `deltaKeys` keys) while the
  * STATE grows 10×, and report the refresh's wall seconds plus the
  * BYTES the commit actually wrote (the new generation dirs). The
  * bucketed layout's claim is that both track |changes|, not |state|;
  * `--buckets 1` degenerates to a whole-state rewrite (the
  * pre-bucketing commit shape) for the contrast row.
  *
  * Usage: runMain graft.MatViewScale <nKeys> <deltaKeys> [buckets]
  */
object MatViewScale {
  def main(args: Array[String]): Unit = {
    val nKeys = args(0).toLong
    val deltaKeys = args(1).toInt
    val buckets = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.storage.MatView.StateBucketsKey, buckets.toString)
    val st = new graft.storage.BasicStorage(spark)
    val root = java.nio.file.Files
      .createTempDirectory("graft_mv_scale").toString
    val (src, view) = (root + "/src", root + "/v")

    // fact table: 4 rows per key so groups have real partials
    st.write(
      spark.range(nKeys * 4)
        .select((col("id") % nKeys).as("k"), col("id").as("rid"),
          (col("id") % 97).cast("double").as("v")),
      src, "delta", "overwrite")
    graft.storage.MatView.create(spark, st, src, view, Seq("k"), "v")

    def treeBytes(p: String): Long = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      def walk(d: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(d).map(s =>
          if (s.isDirectory) walk(s.getPath) else s.getLen).sum
      walk(root)
    }
    val stateBytes = treeBytes(view)

    // constant-size delta: touch `deltaKeys` keys via a captured merge
    st.merge(
      spark.range(deltaKeys)
        .select(col("id").as("k"), lit(-1L).as("rid"),
          lit(1000.0).as("v")),
      src, "full.rid = incremental.rid", captureChanges = true)

    val before = treeBytes(view)
    val t0 = System.nanoTime()
    val r = graft.storage.MatView.refresh(spark, st, view)
    val sec = (System.nanoTime() - t0) / 1e9
    val written = treeBytes(view) - before // new generations only:
    // superseded gens stay on disk within the grace window, so the
    // tree delta is exactly the commit's write volume
    println(f"""{"metric":"matview_refresh","mode":"${r.mode}","keys":$nKeys,"delta_keys":$deltaKeys,"buckets":$buckets,"state_bytes":$stateBytes,"commit_bytes":$written,"sec":$sec%.2f}""")
    spark.stop()
  }
}
