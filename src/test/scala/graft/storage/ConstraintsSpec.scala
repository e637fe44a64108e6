package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ConstraintsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("add validates existing data; writes and merges are gated") {
    val st = new BasicStorage(spark)
    val path = tempDir("cons") + "/t"
    st.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"),
      path, "delta", "overwrite")

    // a constraint the table already violates is refused
    val born = intercept[ConstraintViolationException] {
      Constraints.add(spark, st, path, "v_big", "v > 15")
    }
    assert(born.violations == Seq(("satisfies(v_big)", 1L)))
    assert(Constraints.list(spark, path).isEmpty)

    Constraints.add(spark, st, path, "v_pos", "v > 0")
    // clean append passes; violating append refused, nothing written
    st.write(Seq((3L, 30.0)).toDF("id", "v"), path, "delta", "append")
    intercept[ConstraintViolationException] {
      st.write(Seq((4L, -1.0)).toDF("id", "v"), path, "delta", "append")
    }
    assert(st.read(path, "delta").count() == 3L)
    // merge with a violating incremental refused too
    intercept[ConstraintViolationException] {
      st.merge(Seq((2L, -5.0)).toDF("id", "v"), path,
        "full.id = incremental.id")
    }
    assert(st.read(path, "delta").filter(col("v") < 0).count() == 0L)
    // clean merge passes
    st.merge(Seq((2L, 25.0)).toDF("id", "v"), path,
      "full.id = incremental.id")
    assert(st.read(path, "delta").filter(col("id") === 2L)
      .head().getDouble(1) == 25.0)

    // NULL condition passes (SQL CHECK semantics)
    st.write(Seq((5L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "v"), path, "delta", "append")

    // dropped constraint stops gating
    Constraints.drop(spark, path, "v_pos")
    st.write(Seq((6L, -2.0)).toDF("id", "v"), path, "delta", "append")
    assert(Constraints.list(spark, path).isEmpty)
  }

  test("constraints survive an unpartitioned COW rewrite (swap carry)") {
    val st = new BasicStorage(spark)
    val path = tempDir("cons_swap") + "/t"
    st.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    Constraints.add(spark, st, path, "v_pos", "v > 0")
    // predicate DELETE runs the checked COW swap on unpartitioned tables
    Delete.where(spark, st, path, "id = 1")
    assert(Constraints.list(spark, path) == Seq(("v_pos", "v > 0")))
    intercept[ConstraintViolationException] {
      st.write(Seq((7L, -7.0)).toDF("id", "v"), path, "delta", "append")
    }
  }

  test("constraints survive a managed OVERWRITE and gate its data") {
    val st = new BasicStorage(spark)
    val path = tempDir("cons_over") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "v"), path, "delta", "overwrite")
    Constraints.add(spark, st, path, "v_pos", "v > 0")
    val opsBefore = GraftLog.history(spark, path).count()
    // an overwrite whose frame VIOLATES the contract is refused whole
    intercept[ConstraintViolationException] {
      st.write(Seq((2L, -2.0)).toDF("id", "v"), path, "delta", "overwrite")
    }
    assert(st.read(path, "delta").count() == 1L, "refused write landed")
    // a clean rebuild-by-overwrite keeps the contract AND the history
    st.write(Seq((3L, 3.0), (4L, 4.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    assert(Constraints.list(spark, path) == Seq(("v_pos", "v > 0")),
      "overwrite silently shed the table's CHECK constraints")
    assert(GraftLog.history(spark, path).count() > opsBefore,
      "overwrite reset the op log instead of appending to it")
    // ...and later appends are still gated
    intercept[ConstraintViolationException] {
      st.write(Seq((5L, -5.0)).toDF("id", "v"), path, "delta", "append")
    }
    assert(st.read(path, "delta").count() == 2L)
  }

  test("a crashed drop swap rolls back instead of shedding all constraints") {
    val st = new BasicStorage(spark)
    val path = tempDir("cons_crash") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "v"), path, "delta", "overwrite")
    Constraints.add(spark, st, path, "v_pos", "v > 0")
    Constraints.add(spark, st, path, "id_pos", "id > 0")
    // simulate the swap's crash window: live renamed aside, staged
    // replacement never renamed in — exactly between swapInStaged's
    // two renames
    val live = Constraints.sidecarPath(path)
    Fs.renameChecked(spark, live, live + "__old")
    assert(!Fs.exists(spark, live))
    // the next read heals by rolling back — both constraints survive
    assert(Constraints.list(spark, path).map(_._1) ==
      Seq("id_pos", "v_pos"))
    assert(Fs.exists(spark, live) && !Fs.exists(spark, live + "__old"))
    // debris case: aside left over AFTER a completed swap is deleted
    Fs.copyDirChecked(spark, live, live + "__old")
    Constraints.drop(spark, path, "id_pos")
    assert(Constraints.list(spark, path).map(_._1) == Seq("v_pos"))
    assert(!Fs.exists(spark, live + "__old"))
  }
}
