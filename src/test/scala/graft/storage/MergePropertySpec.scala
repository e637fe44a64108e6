package graft.storage

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Test row (top level — Spark encoders cannot reach inner classes). */
case class MergePropRow(id: Long, v: Long, s: String)

/** Model-based property test for the merge operator: random tables and
  * conditions, expected result computed by a plain-Scala model of Delta
  * MERGE semantics (whenMatchedUpdateAll(cond) +
  * whenNotMatchedInsertAll(cond)), compared row-for-row. */
class MergePropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private type R = MergePropRow
  private val R = MergePropRow

  /** Plain-Scala reference of the merge semantics (unique ids per side). */
  private def model(full: Seq[R], inc: Seq[R],
                    updCond: R => Boolean, insCond: R => Boolean): Seq[R] = {
    val incById = inc.map(r => r.id -> r).toMap
    val fullIds = full.map(_.id).toSet
    val kept = full.map { f =>
      incById.get(f.id) match {
        case Some(i) if updCond(i) => i // matched + update condition
        case _ => f                     // unmatched or condition false
      }
    }
    val inserted = inc.filter(i => !fullIds.contains(i.id) && insCond(i))
    kept ++ inserted
  }

  private def randRows(rng: scala.util.Random, ids: Seq[Long]): Seq[R] =
    ids.map(id => R(id, rng.nextInt(100).toLong,
      if (rng.nextBoolean()) "x" else "y"))

  test("property: merge matches the model on 25 random cases") {
    val storage = new BasicStorage(spark)
    for (seed <- 0 until 25) {
      val rng = new scala.util.Random(seed)
      val fullIds = rng.shuffle((0L until 30L).toList).take(rng.nextInt(20) + 5)
      val incIds = rng.shuffle((0L until 30L).toList).take(rng.nextInt(20) + 5)
      val full = randRows(rng, fullIds)
      val inc = randRows(rng, incIds)

      // random conditions from a small grammar (None = unconditional)
      val threshold = rng.nextInt(100)
      val (updSql, updFn): (Option[String], R => Boolean) = rng.nextInt(3) match {
        case 0 => (None, _ => true)
        case 1 => (Some(s"incremental.v > $threshold"), _.v > threshold)
        case 2 => (Some("incremental.s = 'x'"), _.s == "x")
      }
      val (insSql, insFn): (Option[String], R => Boolean) = rng.nextInt(3) match {
        case 0 => (None, _ => true)
        case 1 => (Some(s"incremental.v <= $threshold"), _.v <= threshold)
        case 2 => (Some("incremental.s = 'y'"), _.s == "y")
      }

      val dir = tempDir(s"merge_prop_$seed")
      Fs.delete(spark, dir)
      storage.write(full.toDF(), dir, "delta", "overwrite")
      storage.merge(inc.toDF(), dir, "full.id = incremental.id",
        updateCondition = updSql, insertCondition = insSql)

      val got = storage.read(dir, "delta").as[R].collect().sortBy(_.id).toSeq
      val expected = model(full, inc, updFn, insFn).sortBy(_.id)
      assert(got == expected,
        s"seed=$seed upd=$updSql ins=$insSql\n full=$full\n inc=$inc")
    }
  }

  test("property: partitioned merge matches unpartitioned merge result") {
    val storage = new BasicStorage(spark)
    for (seed <- 100 until 110) {
      val rng = new scala.util.Random(seed)
      val full = randRows(rng, rng.shuffle((0L until 20L).toList).take(12))
      val inc = randRows(rng, rng.shuffle((0L until 20L).toList).take(8))
      val flat = tempDir(s"mp_flat_$seed"); Fs.delete(spark, flat)
      val part = tempDir(s"mp_part_$seed"); Fs.delete(spark, part)
      storage.write(full.toDF(), flat, "delta", "overwrite")
      storage.write(full.toDF(), part, "delta", "overwrite",
        partitionFields = Seq("s"))
      storage.merge(inc.toDF(), flat, "full.id = incremental.id")
      storage.merge(inc.toDF(), part, "full.id = incremental.id",
        partitionFields = Seq("s"))
      val a = storage.read(flat, "delta").as[R].collect().sortBy(_.id).toSeq
      val b = storage.read(part, "delta")
        .select("id", "v", "s").as[R].collect().sortBy(_.id).toSeq
      assert(a == b, s"seed=$seed\n flat=$a\n part=$b")
    }
  }

  test("property: random schema-evolution merge sequences match the model") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val storage = new BasicStorage(spark)
    val pool = Seq("a", "b", "c", "d")

    def schemaOf(cols: Seq[String]): StructType =
      StructType(StructField("id", LongType, nullable = false) +:
        cols.map(c => StructField(c, LongType, nullable = true)))
    def toDf(rows: Map[Long, Map[String, Long]], cols: Seq[String]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq.map { case (id, m) =>
          Row.fromSeq(id +: cols.map(c => m.get(c).map(Long.box).orNull))
        }),
        schemaOf(cols))

    for (seed <- 200 until 210) {
      val rng = new scala.util.Random(seed)
      def randCols() = pool.filter(_ => rng.nextBoolean()) match {
        case Nil => Seq(pool(rng.nextInt(pool.size)))
        case cs => cs
      }
      def randRows(cols: Seq[String]): Map[Long, Map[String, Long]] =
        rng.shuffle((0L until 15L).toList).take(rng.nextInt(8) + 3)
          .map(id => id -> cols.map(c => c -> rng.nextLong(100)).toMap).toMap

      // model state: per id, col -> value (absent = null)
      var cols = randCols()
      var table: Map[Long, Map[String, Long]] = randRows(cols)
      val dir = tempDir(s"mp_evo_$seed"); Fs.delete(spark, dir)
      storage.write(toDf(table, cols), dir, "delta", "overwrite")

      for (_ <- 0 until 3) {
        val incCols = randCols()
        val inc = randRows(incCols)
        storage.merge(toDf(inc, incCols), dir, "full.id = incremental.id",
          mergeSchemas = true)
        cols = (cols ++ incCols).distinct
        // matched rows are replaced wholesale (update-all), unmatched
        // kept, new ids inserted — absent columns stay null
        table = table.map { case (id, m) =>
          id -> inc.getOrElse(id, m)
        } ++ inc.filterNot { case (id, _) => table.contains(id) }
      }

      val got = storage.read(dir, "delta").collect()
        .map { r =>
          val id = r.getLong(r.fieldIndex("id"))
          id -> cols.flatMap(c =>
            Option(r.getAs[Any](c)).map(v => c -> v.asInstanceOf[Long])).toMap
        }.toMap
      assert(got == table, s"seed=$seed cols=$cols\n got=$got\n exp=$table")
    }
  }

  test("property: merge with delete clause matches the three-clause model") {
    val storage = new BasicStorage(spark)
    val rng = new scala.util.Random(77)
    for (case_ <- 1 to 10) {
      val full = randRows(rng, (1L to 30L).filter(_ => rng.nextBoolean()))
      val inc = randRows(rng, (1L to 40L).filter(_ => rng.nextBoolean()))
      val delAt = rng.nextInt(100).toLong
      val updAt = rng.nextInt(100).toLong
      val dir = tempDir(s"merge_del_$case_") + "/t"
      storage.write(full.toDF(), dir, "delta", "overwrite")
      storage.merge(inc.toDF(), dir, "full.id = incremental.id",
        updateCondition = Some(s"incremental.v >= $updAt"),
        deleteCondition = Some(s"incremental.v >= $delAt"))
      // model: delete first (Delta clause order), then update, insert
      val incById = inc.map(r => r.id -> r).toMap
      val fullIds = full.map(_.id).toSet
      val kept = full.flatMap { f =>
        incById.get(f.id) match {
          case Some(i) if i.v >= delAt => None        // deleted
          case Some(i) if i.v >= updAt => Some(i)     // updated
          case _ => Some(f)                           // kept
        }
      }
      val inserted = inc.filter(i => !fullIds.contains(i.id))
      val expect = (kept ++ inserted).sortBy(_.id)
      val got = storage.read(dir, "delta").as[MergePropRow]
        .collect().sortBy(_.id).toSeq
      assert(got == expect, s"case=$case_ delAt=$delAt updAt=$updAt")
    }
    // a NULL delete condition means "did not hold" — the row survives
    val dir = tempDir("merge_del_null") + "/t"
    storage.write(Seq(R(1L, 5L, "x")).toDF(), dir, "delta", "overwrite")
    storage.merge(Seq(R(1L, 6L, null)).toDF(), dir,
      "full.id = incremental.id",
      deleteCondition = Some("incremental.s = 'z'")) // null = 'z' → NULL
    val survived = storage.read(dir, "delta").as[MergePropRow].collect()
    assert(survived.map(_.id).toSeq == Seq(1L),
      "null delete condition must not delete")
    assert(survived.head.v == 6L, "update-all still applies when not deleted")
  }
}
