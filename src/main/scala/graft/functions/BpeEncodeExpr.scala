package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization of a text column under a LEARNED
  * merge table ([[graft.ops.TextAnalysis.bpeTrain]]) — the encode side
  * of the tokenizer whose training inner loop `q_bpe_pairs` exposes.
  * Each whitespace word starts as characters; adjacent pairs merge in
  * learned-rank order (always the lowest-rank pair present, all its
  * occurrences left-to-right) until no learnable pair remains — the
  * standard greedy BPE encode, a pure function of (text, merges).
  *
  * A custom Catalyst expression (preference (b)): the per-word merge
  * loop is an imperative kernel (rank lookups in a hash map, in-place
  * splicing) that column algebra cannot express without a driver-side
  * fixpoint; the merge table rides into generated code as a reference
  * object, so encoding stays inside whole-stage codegen and the
  * corpus never shuffles — map-only tokenization.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${child.dataType.simpleString}")

  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncodeExpr.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {

  /** Greedy BPE encode of one word under a rank map — shared with
    * [[graft.ops.TextAnalysis.bpeTrain]]'s driver loop so train and
    * encode can never disagree on merge application order. */
  def encodeWord(word: String,
                 ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms: ArrayBuffer[String] = ArrayBuffer.empty
    var i = 0
    while (i < word.length) { // code-point-safe character split
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of that pair, left to right
        val out = new ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && {
              val r = ranks.get(syms(k) + " " + syms(k + 1))
              r != null && r.intValue() == bestRank
            }) {
            out += syms(k) + syms(k + 1)
            k += 2
          } else {
            out += syms(k)
            k += 1
          }
        }
        syms = out
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  /** Static kernel shared by interpreted eval and generated code:
    * whitespace-split the text, encode each word, concatenate. */
  def encode(text: UTF8String,
             ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val words = text.toString.split("\\s+")
    val out = ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val toks = encodeWord(words(i), ranks)
        var j = 0
        while (j < toks.length) {
          out += UTF8String.fromString(toks(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: BPE-encode a text column under a learned merge
    * list. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BpeEncodeExpr(GraftColumnBridge.expression(text), merges))
  }
}
