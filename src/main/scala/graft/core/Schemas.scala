package graft.core

import org.apache.spark.sql.types._

/** Structural schema comparison.
  *
  * Reference semantics: jorvik/audit/schemas.py:4-56 — compare by field
  * name + dataType, ignoring column order and nullability, recursing into
  * nested structs. (The reference's recursion branches are unreachable —
  * `dataType !=` short-circuits first, making nested comparison
  * accidentally nullability-sensitive; we implement the documented,
  * tested behaviour: nullability- and order-insensitivity applies
  * recursively, including through arrays and maps.)
  */
object Schemas {

  /** True if every field of `schema` exists in `refSchema` with an equal
    * (order/nullability-insensitive) dataType. jorvik/audit/schemas.py:4-24 */
  def isSubset(schema: StructType, refSchema: StructType): Boolean = {
    val ref = refSchema.fields.map(f => f.name -> f.dataType).toMap
    schema.fields.forall { f =>
      ref.get(f.name).exists(dt => sameType(f.dataType, dt))
    }
  }

  /** True if the two schemas have the same field set with equal types,
    * ignoring order and nullability. jorvik/audit/schemas.py:27-56 */
  def areEqual(schema1: StructType, schema2: StructType): Boolean = {
    if (schema1.fields.length != schema2.fields.length) false
    else {
      val f1 = schema1.fields.map(f => f.name -> f.dataType).toMap
      val f2 = schema2.fields.map(f => f.name -> f.dataType).toMap
      f1.size == f2.size && f1.forall { case (name, dt) =>
        f2.get(name).exists(sameType(dt, _))
      }
    }
  }

  /** DataType equality modulo nullability (and struct field order),
    * applied recursively. */
  def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (s1: StructType, s2: StructType) => areEqual(s1, s2)
    case (a1: ArrayType, a2: ArrayType) => sameType(a1.elementType, a2.elementType)
    case (m1: MapType, m2: MapType) =>
      sameType(m1.keyType, m2.keyType) && sameType(m1.valueType, m2.valueType)
    case _ => a == b
  }
}
