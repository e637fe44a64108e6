package graft.core

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Ports of test/audit/test_schemas.py plus property tests for the
  * order/nullability-insensitivity contract. Pure — no SparkSession. */
class SchemasSpec extends AnyFunSuite {

  /** Deterministic forAll over 100 samples (no scalatestplus bridge in the
    * offline cache, so we drive Gen by hand). */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (0 until 100).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val address = StructType(Seq(StructField("city", StringType)))
  private val base = StructType(Seq(
    StructField("name", StringType),
    StructField("age", IntegerType),
    StructField("address", address)))

  test("schemas are equal (reference: test_schemas_are_equal)") {
    val other = StructType(Seq(
      StructField("name", StringType),
      StructField("age", IntegerType),
      StructField("address", StructType(Seq(StructField("city", StringType))))))
    assert(Schemas.areEqual(base, other))
  }

  test("schemas differ on nested field (test_schemas_are_not_equal)") {
    val other = StructType(Seq(
      StructField("name", StringType),
      StructField("age", IntegerType),
      StructField("address", StructType(Seq(
        StructField("city", StringType), StructField("street", StringType))))))
    assert(!Schemas.areEqual(base, other))
  }

  test("is_subset true when fields drop (test_is_subset)") {
    val sub = StructType(Seq(
      StructField("name", StringType), StructField("age", IntegerType)))
    assert(Schemas.isSubset(sub, base))
  }

  test("is_subset false on unknown field (test_is_not_subset)") {
    val sub = StructType(Seq(
      StructField("name", StringType), StructField("height", IntegerType)))
    assert(!Schemas.isSubset(sub, base))
  }

  test("equality ignores column order and nullability, recursively") {
    val reordered = StructType(Seq(
      StructField("address", StructType(Seq(
        StructField("city", StringType, nullable = false))), nullable = false),
      StructField("age", IntegerType, nullable = false),
      StructField("name", StringType)))
    assert(Schemas.areEqual(base, reordered))
    assert(Schemas.isSubset(reordered, base))
  }

  test("equality ignores nullability through arrays and maps") {
    val a = StructType(Seq(StructField("xs",
      ArrayType(StructType(Seq(StructField("k", LongType))), containsNull = true))))
    val b = StructType(Seq(StructField("xs",
      ArrayType(StructType(Seq(StructField("k", LongType, nullable = false))),
        containsNull = false))))
    assert(Schemas.areEqual(a, b))
  }

  test("different field count is not equal but may be subset") {
    val sub = StructType(Seq(StructField("name", StringType)))
    assert(!Schemas.areEqual(sub, base))
    assert(Schemas.isSubset(sub, base))
  }

  // --- properties ---

  private val primTypes: Gen[DataType] = Gen.oneOf(
    StringType, IntegerType, LongType, DoubleType, FloatType,
    DateType, TimestampType, BooleanType)

  private def genSchema(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    names <- Gen.pick(n, ('a' to 'j').map(_.toString))
    fields <- Gen.sequence[Seq[StructField], StructField](names.map { nm =>
      for {
        dt <- if (depth > 0) Gen.frequency(
          4 -> primTypes, 1 -> genSchema(depth - 1),
          1 -> primTypes.map(ArrayType(_)))
        else primTypes
        nullable <- Gen.oneOf(true, false)
      } yield StructField(nm, dt, nullable)
    })
  } yield StructType(fields)

  test("property: any permutation with flipped nullability is equal") {
    forAll(genSchema(2)) { s =>
      val shuffled = StructType(scala.util.Random.shuffle(s.fields.toSeq)
        .map(f => f.copy(nullable = !f.nullable)))
      assert(Schemas.areEqual(s, shuffled))
      assert(Schemas.isSubset(s, shuffled) && Schemas.isSubset(shuffled, s))
    }
  }

  test("property: schema is subset and equal to itself") {
    forAll(genSchema(2)) { s =>
      assert(Schemas.areEqual(s, s) && Schemas.isSubset(s, s))
    }
  }

  test("property: dropping a field keeps subset, breaks equality") {
    forAll(genSchema(2)) { s =>
      if (s.fields.length > 1) {
        val dropped = StructType(s.fields.tail)
        assert(Schemas.isSubset(dropped, s))
        assert(!Schemas.areEqual(dropped, s))
      }
    }
  }
}
