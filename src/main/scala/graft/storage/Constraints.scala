package graft.storage

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.Expectations

/** A write violated a table CHECK constraint; nothing was written. */
class ConstraintViolationException(val table: String,
                                   val violations: Seq[(String, Long)])
  extends RuntimeException(
    s"CHECK constraint violation on $table: " + violations
      .map { case (n, c) => s"$n=$c" }.mkString(", "))

/** Persistent table CHECK constraints — Delta's `ALTER TABLE … ADD
  * CONSTRAINT` re-expressed on the managed-parquet engine: constraints
  * live in a `_graft_constraints` sidecar, [[add]] validates EXISTING
  * data first (Delta parity — a constraint the table already violates
  * is refused), and every subsequent managed write/merge validates the
  * incoming frame in ONE aggregation pass before any file is written.
  * The quality gate moves from "every pipeline remembers to check"
  * to "the table refuses bad rows" — at 100 TB with dozens of writers
  * that ownership inversion is the difference between a contract and
  * a convention.
  *
  * SQL null semantics match [[Expectations.Satisfies]]: a NULL
  * condition passes (only FALSE violates) — the same as Delta CHECK.
  */
object Constraints {

  val DirName = "_graft_constraints"

  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("condition", StringType),
    StructField("added", TimestampType)))

  def sidecarPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "/" + DirName

  /** Active constraints of the table (empty when none). Heals a
    * crashed [[drop]] swap first: a leftover `__old` aside dir rolls
    * back, so a crash can never silently shed constraints. */
  def list(spark: SparkSession, tablePath: String): Seq[(String, String)] = {
    Fs.recoverAside(spark, sidecarPath(tablePath))
    if (!Fs.exists(spark, sidecarPath(tablePath))) Nil
    else spark.read.parquet(sidecarPath(tablePath))
      .select("name", "condition")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
  }

  /** Register a CHECK constraint. Validates the CURRENT table content
    * first and refuses (throwing [[ConstraintViolationException]])
    * if existing rows violate — a constraint must be true when it is
    * born, or it is a lie to every future reader. */
  def add(spark: SparkSession, storage: BasicStorage, tablePath: String,
          name: String, condition: String): Unit = {
    require(GraftLog.isManagedTable(spark, tablePath),
      "The given path is not a Delta Table.")
    // commit lock: an unlocked add racing a COW mutation would vanish
    // with the mutation's swap — carryLogAndSwap copies the sidecar
    // BEFORE its renames, so a constraint added in between is on
    // neither side. The table contract is a mutation like any other.
    Txn.withTableLock(spark, tablePath, "ADD_CONSTRAINT") {
      require(!list(spark, tablePath).exists(_._1 == name),
        s"constraint '$name' already exists")
      enforce(storage.read(tablePath, "delta"), Seq(name -> condition),
        tablePath)
      val row = Row(name, condition,
        new Timestamp(System.currentTimeMillis()))
      spark.createDataFrame(
          java.util.Collections.singletonList(row), schema)
        .coalesce(1)
        .write.mode("append").parquet(sidecarPath(tablePath))
      GraftLog.append(spark, tablePath, "ADD_CONSTRAINT")
    }
  }

  /** Remove a constraint by name (no-op if absent). The survivors are
    * written as ONE frame to a staging dir and swapped in via the
    * rename-aside protocol ([[Fs.swapInStaged]]): some complete
    * sidecar exists at every instant — a crash leaves the old or the
    * new version, never a missing one that silently sheds every
    * remaining constraint (the half-state [[list]]'s recovery then
    * heals). */
  def drop(spark: SparkSession, tablePath: String, name: String): Unit = {
    require(GraftLog.isManagedTable(spark, tablePath),
      "The given path is not a Delta Table.")
    // commit lock: same lost-sidecar race as [[add]]
    Txn.withTableLock(spark, tablePath, "DROP_CONSTRAINT") {
      val current = list(spark, tablePath)
      val remaining = current.filterNot(_._1 == name)
      if (remaining.size != current.size) {
        if (remaining.isEmpty) {
          Fs.deleteChecked(spark, sidecarPath(tablePath))
        } else {
          val rows = remaining.map { case (n, c) =>
            Row(n, c, new Timestamp(System.currentTimeMillis())) }
          val tmp = sidecarPath(tablePath) + "__tmp"
          Fs.deleteChecked(spark, tmp)
          spark.createDataFrame(
              java.util.Arrays.asList(rows: _*), schema)
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp)
          Fs.swapInStaged(spark, sidecarPath(tablePath), tmp)
        }
        GraftLog.append(spark, tablePath, "DROP_CONSTRAINT")
      }
    }
  }

  /** Gate an incoming frame against the table's constraints — called
    * by the managed write/merge paths BEFORE anything lands. One
    * aggregation pass for all constraints. */
  def validateIncoming(spark: SparkSession, df: DataFrame,
                       tablePath: String): Unit = {
    val cs = list(spark, tablePath)
    if (cs.nonEmpty) enforce(df, cs, tablePath)
  }

  private def enforce(df: DataFrame, cs: Seq[(String, String)],
                      table: String): Unit = {
    val rules = cs.map { case (n, c) => Expectations.Satisfies(n, c) }
    val bad = Expectations.check(df, rules)
      .filter(org.apache.spark.sql.functions.col("violations") > 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (bad.nonEmpty) throw new ConstraintViolationException(table, bad)
  }
}
