package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

import graft.functions.SimHash64Expr
import graft.ops.TextAnalysis

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions for SQL use alongside the Column API.
  *
  * Only functions expressible as plain Catalyst trees are registered —
  * Column compositions that use higher-order lambdas (cosine, quality
  * score) stay Column-API-only: bridged ColumnNode wrappers embedded in
  * an injected function do not resolve inside an already-running
  * analysis pass.
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) …
  * or spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(e: SparkSessionExtensions, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder))

  private def re(child: Expression, pattern: String,
                 replacement: String): Expression =
    RegExpReplace(child, Literal(pattern), Literal(replacement))

  override def apply(e: SparkSessionExtensions): Unit = {
    // native Catalyst expressions
    register(e, "graft_simhash64", args => SimHash64Expr(args.head))
    register(e, "graft_dot_product", args => {
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      graft.functions.DotProductExpr(
        Cast(args(0), ArrayType(DoubleType)),
        Cast(args(1), ArrayType(DoubleType)))
    })
    // sha256 of whitespace/case-normalized text (TextAnalysis.fingerprint)
    register(e, "graft_fingerprint", args =>
      Sha2(re(Lower(StringTrim(args.head)), "\\s+", " "), Literal(256)))
    // typed-placeholder PII scrub (TextAnalysis.redactPii)
    register(e, "graft_redact_pii", args =>
      re(re(re(args.head,
        TextAnalysis.EmailPattern, "<EMAIL>"),
        TextAnalysis.Ipv4Pattern, "<IP>"),
        TextAnalysis.PhonePattern, "<PHONE>"))
    // engine-portable sampling hash (Sampling.hashBucket): lets SQL
    // users express the same deterministic split/mixture membership
    register(e, "graft_hash_bucket", args => {
      import org.apache.spark.sql.types.LongType
      val folded = Pmod(Cast(args(0), LongType),
        Literal(graft.ops.Sampling.M31))
      val mixed = Pmod(Multiply(folded,
        Literal(graft.ops.Sampling.HashA)), Literal(4294967296L))
      Pmod(mixed, Cast(args(1), LongType))
    })
    // unicode normalization: graft_unicode_normalize(text, 'NFKC')
    // (form must be a literal — it compiles into the generated code)
    register(e, "graft_unicode_normalize", args => {
      val form = args(1) match {
        case Literal(s, _) if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_unicode_normalize form must be a string literal, got $other")
      }
      graft.functions.UnicodeNormalizeExpr(args.head, form)
    })
    // deflate compression ratio of a string — the low-entropy /
    // boilerplate quality signal, directly usable in SQL WHERE
    register(e, "graft_deflate_ratio", args =>
      graft.functions.DeflateRatioExpr(args.head))
    // JPEG dimensions from a binary column's SOF scan (struct result)
    register(e, "graft_jpeg_dims", args =>
      graft.functions.JpegDimsExpr(args.head))
  }
}
