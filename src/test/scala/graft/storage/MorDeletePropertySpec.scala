package graft.storage

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property test of the MoR tombstone LIFECYCLE under random
  * interleavings of deleteWhere / merge / append / compact against a
  * plain-Scala multiset model — the targeted DeleteSpec cases pin the
  * known failure modes (delete-then-reinsert, matched-not-updated,
  * empty-sidecar), this pins the interactions nobody thought to name.
  *
  * Model: rows is a MULTISET of (id, value) — appends never upsert, so
  * a revived id can legitimately hold two physical rows; tomb is the
  * set of logically deleted ids. The visible table is rows minus
  * tombstoned ids; compact makes that physical.
  */
class MorDeletePropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def visible(rows: Vector[(Long, String)],
                      tomb: Set[Long]): Vector[(Long, String)] =
    rows.filterNot { case (i, _) => tomb.contains(i) }

  test("random delete/merge/append/compact sequences match the model") {
    val st = new BasicStorage(spark)
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val path = tempDir(s"mor_prop_$seed") + "/t"
      var rows: Vector[(Long, String)] =
        (1L to 30L).map(i => (i, s"v$i")).toVector
      var tomb: Set[Long] = Set.empty
      st.write(rows.toDF("id", "v"), path, "delta", "overwrite")

      def check(step: String): Unit = {
        val got = MorDelete.read(spark, st, path, Seq("id"))
          .as[(Long, String)].collect().sorted.toVector
        val want = visible(rows, tomb).sorted
        assert(got == want,
          s"seed=$seed after $step:\n  engine=$got\n  model =$want")
      }

      for (step <- 1 to 8) {
        rnd.nextInt(4) match {
          case 0 => // predicate MoR delete on a random id band
            val (lo, hi) = {
              val a = rnd.nextLong(60) + 1; val b = rnd.nextLong(60) + 1
              (math.min(a, b), math.max(a, b))
            }
            val n = MorDelete.deleteWhere(spark, st, path,
              s"id >= $lo AND id <= $hi", Seq("id"))
            val hit = visible(rows, tomb)
              .collect { case (i, _) if i >= lo && i <= hi => i }
            assert(n == hit.size,
              s"seed=$seed step=$step: deleted $n, model ${hit.size}")
            tomb ++= hit
            check(s"delete [$lo,$hi]")
          case 1 => // upsert merge of a random batch (distinct ids)
            val ids = Vector.fill(rnd.nextInt(5) + 1)(rnd.nextLong(60) + 1)
              .distinct
            val batch = ids.map(i => (i, s"m$step-$i"))
            st.merge(batch.toDF("id", "v"), path,
              "full.id = incremental.id")
            val physical = rows.map(_._1).toSet
            rows = rows.map { case (i, v) =>
              batch.find(_._1 == i).getOrElse((i, v))
            } ++ batch.filterNot(b => physical.contains(b._1))
            tomb --= ids // updated or inserted ⇒ re-introduced
            check(s"merge ${ids.sorted}")
          case 2 => // append of FRESH ids (plus sometimes a revival)
            val fresh = Vector.fill(rnd.nextInt(3) + 1)(
              1000L * step + rnd.nextLong(50) + seed * 10000L).distinct
              .filterNot(rows.map(_._1).toSet)
            val revive =
              if (tomb.nonEmpty && rnd.nextBoolean()) Vector(tomb.head)
              else Vector.empty
            val batch = (fresh ++ revive).map(i => (i, s"a$step-$i"))
            if (batch.nonEmpty) {
              st.write(batch.toDF("id", "v"), path, "delta", "append")
              rows ++= batch
              tomb --= batch.map(_._1).toSet
              check(s"append ${batch.map(_._1).sorted}")
            }
          case 3 => // fold tombstones into a physical rewrite
            val removed = MorDelete.compact(spark, st, path, Seq("id"))
            val expect = rows.count { case (i, _) => tomb.contains(i) }
            assert(removed == expect,
              s"seed=$seed step=$step: compact removed $removed, " +
                s"model $expect")
            rows = visible(rows, tomb)
            tomb = Set.empty
            assert(!Fs.exists(spark, MorDelete.tombstonePath(path)))
            check("compact")
        }
      }
      // terminal compact: engine and model converge on the same table
      MorDelete.compact(spark, st, path, Seq("id"))
      rows = visible(rows, tomb); tomb = Set.empty
      val finalGot = st.read(path, "delta")
        .as[(Long, String)].collect().sorted.toVector
      assert(finalGot == rows.sorted, s"seed=$seed terminal state differs")
    }
  }
}
