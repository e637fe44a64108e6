package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.DeflateRatioExpr.deflateRatio
import graft.functions.UnicodeNormalizeExpr.unicodeNormalize

class UnicodeDeflateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("unicodeNormalize: composed and decomposed spellings collapse to one form") {
    val composed = "café"          // é as U+00E9
    val decomposed = "café"       // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
      .select($"id", unicodeNormalize($"s", "NFC").as("nfc"),
        unicodeNormalize($"s", "NFD").as("nfd"))
    val rows = df.as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows(0)._2 == rows(1)._2, "NFC forms must match")
    assert(rows(0)._3 == rows(1)._3, "NFD forms must match")
    assert(rows(0)._2 == composed && rows(0)._3 == decomposed)
    // NFKC folds compatibility forms: ligature ﬁ (U+FB01) → fi, ² → 2
    val k = Seq("ﬁle 10²").toDF("s")
      .select(unicodeNormalize($"s", "NFKC")).as[String].head()
    assert(k == "file 102")
    // nulls propagate
    val n = Seq[Option[String]](None).toDF("s")
      .select(unicodeNormalize($"s", "NFC")).collect()(0)
    assert(n.isNullAt(0))
    // invalid form rejected at analysis
    val ex = intercept[Exception] {
      Seq("x").toDF("s").select(unicodeNormalize($"s", "NFX")).collect()
    }
    assert(ex.getMessage.contains("NFC") || ex.getMessage.contains("form"))
  }

  test("accent folding via NFD + mark strip matches expectations") {
    val folded = Seq("Café déjà Über")
      .toDF("s")
      .select(regexp_replace(unicodeNormalize(
        regexp_replace(unicodeNormalize(lower(unicodeNormalize($"s", "NFC")),
          "NFD"), "\\p{Mn}", ""), "NFC"), "\\s+", " "))
      .as[String].head()
    assert(folded == "cafe deja uber")
  }

  test("deflateRatio orders repetitive < prose < high-entropy; empty is null") {
    val rep = "the cat sat " * 200
    val prose = "Weather patterns across the region shifted noticeably " +
      "during the spring months, with rainfall arriving earlier than the " +
      "historical average and temperatures varying between mild and warm " +
      "depending on elevation and distance from the coastline. " * 4
    // deterministic keyboard-mash stand-in: base36 of a mixed counter
    val rand = (1 to 400).map(i =>
      java.lang.Long.toString(i * 2654435761L % 78364164096L, 36)).mkString(" ")
    val df = Seq((1L, rep), (2L, prose), (3L, rand), (4L, ""))
      .toDF("id", "s")
      .select($"id", deflateRatio($"s").as("r"))
    val m = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(m(4L).isEmpty, "empty string must be null")
    assert(m(1L).get < m(2L).get, s"repetition must compress below prose: $m")
    assert(m(2L).get < m(3L).get, s"prose must compress below mash: $m")
    assert(m(1L).get > 0 && m(3L).get < 1.5)
    // deterministic across evaluations
    val again = Seq((2L, prose)).toDF("id", "s")
      .select(deflateRatio($"s")).as[Double].head()
    assert(again == m(2L).get)
  }
}
