package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** JPEG dimensions from a bounded marker scan of the payload header —
  * no decode.
  *
  * Unlike PNG/GIF/BMP, JPEG puts width/height in a variable-offset SOF
  * segment: the header is a sequence of `FF <marker> <len:be16> <body>`
  * segments and the scan must walk them until the first SOF frame
  * header (markers C0–CF minus C4/C8/CC, whose body is
  * `precision:1 height:be16 width:be16 …`). A segment walk with
  * early exit is a scalar loop — as DataFrame algebra it would be an
  * `aggregate` over a fixed iteration count with a struct accumulator,
  * non-codegen'd and doing maximum work on every row — so this is a
  * custom Catalyst expression (preference (b) of the build rules),
  * same pattern as [[SimHash64Expr]].
  *
  * The scan is BOUNDED: at most 256 segments and never past the byte
  * array, so a hostile payload (cycle-length lies, truncation, fill-FF
  * runs) costs O(header) and returns null rather than looping or
  * throwing. Returns width<<32|height packed in one long — one parse
  * serves both dimensions; null when the payload is not a JPEG or no
  * SOF precedes SOS/EOI/end-of-buffer.
  *
  * Codegen: real `doGenCode` calling the static kernel — stays inside
  * whole-stage codegen (pinned by PlanShapeSpec's no-fallback test).
  */
case class JpegDimsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jpeg_dims requires binary, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val packed = JpegDimsExpr.dims(input.asInstanceOf[Array[Byte]])
    if (packed < 0) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh name: width and height both embed this expression in the
    // same generated method — a fixed local would collide
    val packed = ctx.freshName("jpegPacked")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long $packed = graft.functions.JpegDimsExpr.dims($c);
         |if ($packed < 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = $packed; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): JpegDimsExpr =
    copy(child = newChild)
}

object JpegDimsExpr {

  private final val MaxSegments = 256

  /** Static kernel shared by interpreted eval and generated code.
    * Returns width<<32|height, or -1 when unparseable (the expression
    * maps -1 to null — width/height are never negative, so the
    * sentinel cannot collide with a real value). */
  def dims(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.length < 4) return -1L
    // SOI
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return -1L
    var off = 2
    var segments = 0
    while (off + 1 < bytes.length && segments < MaxSegments) {
      segments += 1
      if ((bytes(off) & 0xff) != 0xff) return -1L
      // the marker byte is the first non-FF (fill FF bytes are legal padding)
      var mOff = off + 1
      while (mOff < bytes.length && (bytes(mOff) & 0xff) == 0xff) mOff += 1
      if (mOff >= bytes.length) return -1L
      val m = bytes(mOff) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        // standalone markers (SOI/RSTn/TEM): no length field
        off = mOff + 1
      } else if (m == 0xd9 || m == 0xda) {
        // EOI, or SOS with no SOF seen: entropy-coded data has no
        // frame header past this point
        return -1L
      } else {
        if (mOff + 2 >= bytes.length) return -1L
        val len = ((bytes(mOff + 1) & 0xff) << 8) | (bytes(mOff + 2) & 0xff)
        if (len < 2) return -1L
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          // body: precision(1) height(2) width(2); len counts itself
          if (len < 7 || mOff + 7 >= bytes.length) return -1L
          val h = ((bytes(mOff + 4) & 0xff) << 8) | (bytes(mOff + 5) & 0xff)
          val w = ((bytes(mOff + 6) & 0xff) << 8) | (bytes(mOff + 7) & 0xff)
          return (w.toLong << 32) | h.toLong
        }
        off = mOff + 1 + len
      }
    }
    -1L
  }

  /** Column API: width<<32|height of a JPEG payload, null if not
    * parseable as JPEG. */
  def jpegDims(bin: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(JpegDimsExpr(GraftColumnBridge.expression(bin)))
  }
}
