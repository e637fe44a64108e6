package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** Delta-style COLUMN MAPPING for managed tables: a tiny JSON sidecar
  * (`_graft_colmap.json`) of logical→physical name indirection that
  * makes RENAME COLUMN and DROP COLUMN **metadata-only** — at 100 TB
  * a COW rename is a petabyte-scale rewrite for what is semantically
  * a label change; with the mapping it is one sidecar swap.
  *
  * Model (mirrors Delta's name-mapping mode, rebuilt on plain
  * parquet):
  *  - PHYSICAL names are what the parquet files carry; LOGICAL names
  *    are what every reader and writer of the table sees.
  *  - `renames`: physical → logical, one entry per renamed column
  *    (chains collapse: a→b then b→c is stored as a→c).
  *  - `dropped`: physical names whose column is logically gone — the
  *    bytes stay in old files (space is reclaimed by the next genuine
  *    rewrite or [[Alter.materializeMapping]]); the read projection
  *    simply never exposes them.
  *
  * The engine-wide discipline that keeps this sound:
  *  - EVERY read of a managed table applies [[toLogical]] (one
  *    zero-cost projection — Catalyst collapses it into the scan);
  *    EVERY write of table data applies [[toPhysical]] first, so old
  *    and new files always agree on physical names (no mergeSchema
  *    mixing, no by-name mismatches).
  *  - INVARIANT (enforced by [[refuseOccupied]] at mapped RENAME and
  *    merge schema evolution; ALTER ADD needs no refusal because its
  *    COW rewrite MATERIALIZES the mapping — every old file is
  *    replaced, so no occupied physical name survives it): no logical
  *    column name may case-insensitively collide with an OCCUPIED
  *    physical name (a renamed-from or dropped name still present in
  *    old files). This
  *    makes both projections IDEMPOTENT — applying toLogical to an
  *    already-logical frame (a schema sidecar, a feed batch) is a
  *    no-op, so no artifact can be mis-mapped — and keeps the mixed
  *    old/new parquet schema unambiguous whichever file Spark samples
  *    for inference. The escape hatch is materializeMapping: one
  *    explicit COW rewrite to physical == logical, clearing the map.
  *  - Partition columns are never mapped (mapped rename/drop REFUSE
  *    on them): the physical directory layout IS the column, so a
  *    metadata rename would orphan every `old=value` dir.
  *  - The sidecar rides COW swaps ([[GraftLog.carryLogAndSwap]]) like
  *    the op log and constraints; a managed OVERWRITE or WAP publish
  *    replaces the table wholesale and CLEARS it (the overwrite swap
  *    deliberately does not carry it — the incoming frame was staged
  *    under logical names).
  *  - Sidecar updates are crash-safe file swaps (write-aside-rename,
  *    healed by [[Fs.recoverAside]]): a reader never sees a truncated
  *    mapping, and a crashed update leaves the old or the new mapping,
  *    never none.
  */
object ColumnMapping {

  val SidecarName = "_graft_colmap.json"

  def sidecarPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "/" + SidecarName

  /** The mapping: `renames` physical→logical; `dropped` physical
    * names logically removed. Empty = identity (no sidecar). */
  case class Mapping(renames: Map[String, String], dropped: Seq[String]) {
    def isEmpty: Boolean = renames.isEmpty && dropped.isEmpty

    /** Physical names still present in old files but NOT valid as
      * logical names (renamed-from + dropped) — the collision set
      * [[refuseOccupied]] guards. */
    def occupiedPhysical: Seq[String] = renames.keys.toSeq ++ dropped

    /** The physical name behind a logical column (identity when
      * unmapped). Case-insensitive lookup, Spark's resolution rule. */
    def physicalOf(logical: String): String =
      renames.collectFirst {
        case (p, l) if l.equalsIgnoreCase(logical) => p
      }.getOrElse(logical)
  }

  def load(spark: SparkSession, tablePath: String): Option[Mapping] = {
    val sc = sidecarPath(tablePath)
    Fs.recoverAside(spark, sc)
    if (!Fs.exists(spark, sc)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val j = JsonMethods.parse(Fs.readText(spark, sc))
      val renames = (j \ "renames") match {
        case JObject(fields) => fields.collect {
          case (k, JString(v)) => k -> v
        }.toMap
        case _ => Map.empty[String, String]
      }
      val dropped = (j \ "dropped") match {
        case JArray(items) => items.collect { case JString(s) => s }
        case _ => Nil
      }
      Some(Mapping(renames, dropped)).filterNot(_.isEmpty)
    }
  }

  /** Persist (or, for an empty mapping, remove) the sidecar via the
    * write-aside-rename file swap: some complete mapping exists at
    * every instant of an update. */
  def save(spark: SparkSession, tablePath: String, m: Mapping): Unit = {
    val sc = sidecarPath(tablePath)
    Fs.recoverAside(spark, sc)
    if (m.isEmpty) { Fs.deleteChecked(spark, sc); return }
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.compact(JsonMethods.render(
      ("renames" -> m.renames) ~ ("dropped" -> m.dropped)))
    val tmp = sc + "__tmp"
    Fs.deleteChecked(spark, tmp)
    Fs.writeText(spark, tmp, json)
    if (!Fs.exists(spark, sc)) Fs.renameChecked(spark, tmp, sc)
    else Fs.swapInStaged(spark, sc, tmp)
  }

  /** Physical → logical: ONE simultaneous projection (select with
    * aliases, never sequential renames — a sequential fold breaks on
    * swap cycles like {a→b, b→a}). Dropped physicals vanish. No-op
    * without a mapping, and idempotent on already-logical frames (the
    * occupied-name invariant). */
  def toLogical(spark: SparkSession, tablePath: String,
                df: DataFrame): DataFrame =
    load(spark, tablePath) match {
      case None => df
      case Some(m) =>
        val cols = df.columns.toIndexedSeq.flatMap { c =>
          if (m.dropped.exists(_.equalsIgnoreCase(c))) None
          else m.renames.collectFirst {
            case (p, l) if p.equalsIgnoreCase(c) => df.col(quoted(c)).as(l)
          }.orElse(Some(df.col(quoted(c))))
        }
        df.select(cols: _*)
    }

  /** Logical → physical: the inverse simultaneous projection, applied
    * by every data-writing path so new files agree with old ones.
    * Idempotent on already-physical frames (same invariant). */
  def toPhysical(spark: SparkSession, tablePath: String,
                 df: DataFrame): DataFrame =
    load(spark, tablePath) match {
      case None => df
      case Some(m) =>
        val byLogical = m.renames.map { case (p, l) => (l, p) }
        val cols = df.columns.toIndexedSeq.map { c =>
          byLogical.collectFirst {
            case (l, p) if l.equalsIgnoreCase(c) => df.col(quoted(c)).as(p)
          }.getOrElse(df.col(quoted(c)))
        }
        df.select(cols: _*)
    }

  /** Translate predicate/request column names into physical space for
    * metadata that is keyed on file contents (data-skipping stats are
    * collected from parquet footers, hence physical). Identity
    * without a mapping. */
  def physicalNames(spark: SparkSession, tablePath: String,
                    logical: Seq[String]): Seq[String] =
    load(spark, tablePath) match {
      case None => logical
      case Some(m) => logical.map(m.physicalOf)
    }

  /** Enforce the occupied-name invariant: refuse introducing logical
    * columns whose names collide with physical names still present in
    * old files — the one configuration where old and new parquet
    * schemas would disagree about what a name MEANS. */
  def refuseOccupied(spark: SparkSession, tablePath: String,
                     newCols: Seq[String], what: String): Unit =
    load(spark, tablePath).foreach { m =>
      val clash = newCols.filter(c =>
        m.occupiedPhysical.exists(_.equalsIgnoreCase(c)))
      if (clash.nonEmpty)
        throw new IllegalStateException(
          s"cannot $what: column name(s) ${clash.mkString(", ")} " +
            "collide with physical names the table's column mapping " +
            "still occupies in existing files (renamed-from or " +
            "dropped) — old and new files would disagree about what " +
            "the name means. Run Alter.materializeMapping(...) (one " +
            "COW rewrite clearing the mapping) first")
    }

  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
