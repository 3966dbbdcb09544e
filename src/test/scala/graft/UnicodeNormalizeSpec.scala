package graft

import graft.functions.{GraftFunctions => F, UnicodeNormalize}
import org.apache.spark.sql.functions._

/** Golden vectors for the UnicodeNormalize expression (UAX #15), the
  * forms the DuckDB oracle cannot check (it only ships nfc_normalize),
  * and codegen/interpreted agreement with the JDK reference
  * implementation. */
class UnicodeNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val CombiningAcute = "́"
  private val Precomposed = "café"           // café, NFC form
  private val Decomposed = "cafe" + CombiningAcute // café, NFD form

  test("NFC golden vectors: combining pair collapses, ASCII unchanged") {
    val rows = Seq(Decomposed, Precomposed, "plain ascii", "")
      .toDF("s")
      .select(F.unicode_normalize($"s", "NFC").as("n"), $"s")
      .collect()
    assert(rows(0).getString(0) == Precomposed)
    assert(rows(1).getString(0) == Precomposed)
    assert(rows(2).getString(0) == "plain ascii")
    assert(rows(3).getString(0) == "")
  }

  test("NFD expands the precomposed form back out") {
    val r = Seq(Precomposed).toDF("s")
      .select(F.unicode_normalize($"s", "NFD")).head.getString(0)
    assert(r == Decomposed)
  }

  test("NFKC compatibility folds: full-width, ligature, superscript") {
    val rows = Seq(
      "ＡＢＣ",  // full-width ABC
      "ﬁle",            // ﬁ ligature + "le"
      "x²")             // x squared (superscript two)
      .toDF("s")
      .select(F.unicode_normalize($"s", "NFKC").as("n"))
      .collect()
    assert(rows(0).getString(0) == "ABC")
    assert(rows(1).getString(0) == "file")
    assert(rows(2).getString(0) == "x2")
    // ...while canonical-only NFC leaves all three alone
    val nfc = Seq("ＡＢＣ", "ﬁle", "x²").toDF("s")
      .select(F.unicode_normalize($"s", "NFC").as("n")).collect()
    assert(nfc(0).getString(0) == "ＡＢＣ")
    assert(nfc(1).getString(0) == "ﬁle")
    assert(nfc(2).getString(0) == "x²")
  }

  test("null input stays null; unsupported form is rejected at build") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(F.unicode_normalize($"s", "NFC")).head
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] {
      F.unicode_normalize(lit("x"), "NFX")
    }
  }

  test("codegen and interpreted paths agree with the JDK reference") {
    val samples = Tables.documents(spark, sf).limit(50)
      .select(concat($"text", lit(" " + Decomposed + " ﬁ")).as("s"))
    for (form <- UnicodeNormalize.Forms) {
      val got = samples.select($"s",
        F.unicode_normalize($"s", form).as("n")).collect()
      got.foreach { r =>
        assert(r.getString(1) ==
          UnicodeNormalize.normalize(r.getString(0), form))
      }
    }
  }

  test("the dedup-key motivation: both spellings fingerprint equal") {
    val fps = Seq(Precomposed, Decomposed).toDF("s")
      .select(F.fnv1a(F.unicode_normalize($"s", "NFC")).as("fp"))
      .collect()
    assert(fps(0).getLong(0) == fps(1).getLong(0))
  }
}
