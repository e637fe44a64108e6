package graft.storage

import org.apache.spark.sql.SparkSession

import graft.lineage.DataLineageLogger

/** Storage system factory. Reference: jorvik/storage/__init__.py:12-44.
  *
  * Spark conf keys (identical to the reference so configurations port):
  *   - io.jorvik.data_lineage.log_path — attach lineage logging if set
  *   - io.jorvik.storage.production_context — csv list of contexts that
  *     get direct (non-isolated) storage; default main,master,production,prod
  *   - io.jorvik.storage.isolation_provider / isolation_context /
  *     isolation_folder / mount_point — see [[IsolationProviders]] /
  *     [[IsolatedStorage]]
  *
  * Engine extension keys (beyond the reference surface):
  *   - io.graft.storage.skipping_columns — csv of column names; when
  *     set, every observed write/merge refreshes the [[DataSkipping]]
  *     footer-stats sidecar for those columns (runtime conf, so it can
  *     be toggled per session).
  *   - io.graft.storage.autocompact_max_files — when set (> 1), every
  *     observed write/merge that leaves a managed table above this
  *     many data files triggers an [[Optimize]] compaction
  *     ([[AutoCompactObserver]]) — the background-OPTIMIZE loop for
  *     micro-batch ingest.
  */
object GraftStorage {

  def configure(spark: SparkSession,
                isolationProvider: Option[() => String] = None,
                verbose: Boolean = false,
                trackLineage: Boolean = true): Storage = {
    val st = new BasicStorage(spark)
    val conf = spark.sparkContext.getConf
    val lineageLogPath = conf.get("io.jorvik.data_lineage.log_path", "")
    val productionContext = conf
      .get("io.jorvik.storage.production_context", "main,master,production,prod")
      .split(",").map(_.trim.toLowerCase).toSeq

    if (trackLineage && lineageLogPath.nonEmpty)
      st.registerOutputObserver(new DataLineageLogger(lineageLogPath))

    val skippingCols = spark.conf
      .get("io.graft.storage.skipping_columns", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (skippingCols.nonEmpty)
      st.registerOutputObserver(new DataSkippingObserver(skippingCols))

    val autoCompact = spark.conf
      .get("io.graft.storage.autocompact_max_files", "").trim
    if (autoCompact.nonEmpty)
      st.registerOutputObserver(new AutoCompactObserver(autoCompact.toInt))

    val provider = isolationProvider
      .getOrElse(IsolationProviders.getIsolationProvider(spark))
    val isolation = provider()
    if (isolation.nonEmpty && !productionContext.contains(isolation.toLowerCase))
      new IsolatedStorage(st, spark, verbose, provider)
    else st
  }
}
