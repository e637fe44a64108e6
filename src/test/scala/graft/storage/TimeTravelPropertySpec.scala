package graft.storage

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Test row (top level — Spark encoders cannot reach inner classes). */
case class TtPropRow(id: Long, v: Long)

/** Model-based property test for time-travel TIMELINE INTEGRITY over
  * random interleavings of EVERY mutation path the storage engine has:
  * captured merges (with delete clauses), captured predicate deletes,
  * uncaptured deletes, managed overwrites, managed appends, and feed
  * prunes. After each sequence, [[Merge.readAsOf]] at every stamp the
  * model says is servable must reproduce the model's snapshot exactly
  * (with and without `checkpointEvery` lineage bounding), and every
  * stamp a fence invalidated must REFUSE loudly — the invariant under
  * test is "the engine may forget history loudly, never serve a
  * snapshot that never existed".
  *
  * The model mirrors the fence contract, not the implementation:
  *  - captured ops extend servable history (new stamp = the batch);
  *  - uncaptured mutations BEFORE any feed era fold into the
  *    documented `Long.MinValue` = "before the first captured batch"
  *    state;
  *  - uncaptured mutations AFTER a feed era exists (live feed or
  *    prior horizons — outstanding stamps possible) fence: every
  *    older stamp refuses, the current state is servable at the new
  *    horizon;
  *  - prune refuses strictly below the pruned stamp, keeps the stamp
  *    itself servable. */
class TimeTravelPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, max}

  private def df(rows: Map[Long, Long]) =
    rows.toSeq.sortBy(_._1).map { case (i, v) => TtPropRow(i, v) }.toDF()

  private def maxFeedStamp(path: String): Long =
    Merge.changeFeed(spark, path).agg(max(col("batch"))).head().getLong(0)

  /** Newest recorded horizon of any kind — the stamp the state right
    * after a fencing op is servable at. Reading it from the log is
    * observation, not oracle reuse: WHAT must hold at that stamp
    * (snapshot equality / refusal below) comes from the model. */
  private def maxHorizon(path: String): Long =
    (GraftLog.txnBatches(spark, path, Merge.ChangesPruneApp) ++
      GraftLog.txnBatches(spark, path, Merge.ChangesBarrierApp) ++
      GraftLog.txnBatches(spark, path, Merge.ChangesOverwriteApp)).max

  test("random mutation interleavings: every recorded stamp replays " +
      "its model snapshot or refuses") {
    val st = new BasicStorage(spark)
    for (seed <- 0 until 6) {
      val rng = new scala.util.Random(40 + seed)
      val path = tempDir(s"tt_prop_$seed") + "/t"
      def randRows(n: Int): Map[Long, Long] =
        rng.shuffle((0 until 15).toList).take(n)
          .map(i => i.toLong -> rng.nextInt(10).toLong).toMap
      var model: Map[Long, Long] = randRows(8)
      st.write(df(model), path, "delta", "overwrite")
      var nextFreshId = 100L

      val trace = ArrayBuffer[String]()
      var valid = ArrayBuffer[(Long, Map[Long, Long])](
        (Long.MinValue, model))
      val refused = ArrayBuffer[Long]()
      var feedEra = false // mirrors the fence condition, from the model side
      var tombs = Set[Long]() // modeled MoR tombstone keys

      def fenceTo(newStamp: => Long): Unit =
        if (feedEra) {
          refused ++= valid.map(_._1)
          valid = ArrayBuffer((newStamp, model))
        } else valid = ArrayBuffer((Long.MinValue, model))

      for (_ <- 0 until 8) rng.nextInt(12) match {
        case 0 | 1 | 2 | 3 =>
          // captured merge: upsert + delete clause on v = -1
          val inc = rng.shuffle((0 until 18).toList)
            .take(rng.nextInt(5) + 2)
            .map(i => i.toLong ->
              (if (rng.nextInt(5) == 0) -1L else rng.nextInt(10).toLong))
            .toMap
          trace += s"merge($inc)"
          st.merge(df(inc), path, "full.id = incremental.id",
            deleteCondition = Some("incremental.v = -1"),
            captureChanges = true)
          // tombstone reconciliation: keys the merge UPDATES (matched,
          // not taken by the delete clause) or INSERTS (unmatched) are
          // re-introduced — their tombstones clear
          tombs --= inc.keys.filterNot(k =>
            model.contains(k) && inc(k) == -1L)
          model = inc.foldLeft(model) { case (m, (i, v)) =>
            if (m.contains(i)) { if (v == -1L) m - i else m.updated(i, v) }
            else m.updated(i, v) // delete clause never gates inserts
          }
          feedEra = true
          valid += ((maxFeedStamp(path), model))
        case 4 =>
          // captured predicate delete → a `delete` change batch
          val cut = rng.nextInt(10)
          trace += s"capdel($cut)"
          val n = Delete.where(spark, st, path, s"v >= $cut",
            captureChanges = true)
          val newModel = model.filterNot(_._2 >= cut)
          assert(n == model.size - newModel.size, s"seed=$seed del count")
          if (n > 0) {
            model = newModel
            feedEra = true
            valid += ((maxFeedStamp(path), model))
          }
        case 5 =>
          // UNCAPTURED delete: fences iff a feed era exists
          val cut = rng.nextInt(10)
          trace += s"rawdel($cut)"
          val n = Delete.where(spark, st, path, s"v >= $cut")
          val newModel = model.filterNot(_._2 >= cut)
          assert(n == model.size - newModel.size, s"seed=$seed del count")
          if (n > 0) { model = newModel; fenceTo(maxHorizon(path)) }
        case 6 =>
          // managed overwrite (drops MoR tombstones with the table)
          model = randRows(rng.nextInt(6) + 3)
          trace += "overwrite"
          st.write(df(model), path, "delta", "overwrite")
          tombs = Set.empty
          fenceTo(maxHorizon(path))
        case 7 =>
          // managed append with fresh keys (keeps the table key-unique)
          val extra = (0 until rng.nextInt(3) + 1).map { _ =>
            val i = nextFreshId; nextFreshId += 1
            i -> rng.nextInt(10).toLong
          }.toMap
          trace += s"append($extra)"
          st.write(df(extra), path, "delta", "append")
          model = model ++ extra
          fenceTo(maxHorizon(path))
        case 8 | 9 =>
          // prune up to a random retained stamp (no-op without a feed)
          if (Merge.hasChanges(spark, path)) {
            val stamps = Merge.changeFeed(spark, path)
              .select("batch").distinct()
              .collect().map(_.getLong(0)).sorted
            val upTo = stamps(rng.nextInt(stamps.length))
            trace += s"prune($upTo)"
            Merge.pruneChangeFeed(spark, path, upTo)
            val (keep, dead) = valid.partition(_._1 >= upTo)
            refused ++= dead.map(_._1)
            valid = keep
          }
        case 10 =>
          // MoR tombstone delete: the RAW file timeline — what
          // readAsOf serves — is untouched, so `model` is too; only
          // the modeled tombstone set grows (matched against the MoR
          // view: already-tombstoned rows can't re-delete)
          val cut = rng.nextInt(10)
          trace += s"mordel($cut)"
          val n = MorDelete.deleteWhere(spark, st, path, s"v >= $cut",
            Seq("id"))
          val newly = (model -- tombs).filter(_._2 >= cut).keySet
          assert(n == newly.size, s"seed=$seed mordel count")
          tombs ++= newly
        case 11 =>
          // MoR compact: tombstoned LIVE rows leave the raw timeline
          // here, uncaptured — fences like a raw delete, but ONLY
          // when rows actually leave (a compact whose tombstones all
          // point at since-deleted keys is content-identical)
          trace += "compact"
          val removed = MorDelete.compact(spark, st, path, Seq("id"))
          val expected = model.keySet.intersect(tombs)
          assert(removed == expected.size, s"seed=$seed compact count")
          if (removed > 0) {
            model = model -- expected
            fenceTo(maxHorizon(path))
          }
          tombs = Set.empty // compact consumed the sidecar
      }

      for ((stamp, snap) <- valid; ck <- Seq(0, 2)) {
        val got = Merge.readAsOf(spark, st, path, Seq("id"), stamp,
            checkpointEvery = ck)
          .as[TtPropRow].collect().map(r => r.id -> r.v).toMap
        assert(got == snap,
          s"seed=$seed ck=$ck stamp=$stamp\n got=$got\n exp=$snap\n  trace=${trace.mkString(" | ")}")
      }
      for (stamp <- refused) {
        val msg = try {
          Merge.readAsOf(spark, st, path, Seq("id"), stamp).collect()
          None
        } catch { case e: IllegalArgumentException => Some(e.getMessage) }
        assert(msg.exists(_.contains("horizon")),
          s"seed=$seed stamp=$stamp did not refuse ($msg)\n  trace=${trace.mkString(" | ")}")
      }
    }
  }
}
