package graft

import graft.operators.TextCleanup
import org.apache.spark.sql.functions._

/** Cross-corpus boilerplate line removal + PII redaction: the unit
  * contracts behind the `line_dedup` / `pii_redact` oracle rows. */
class TextCleanupSpec extends SparkSuite {
  import spark.implicits._

  test("boilerplate lines are dropped from every doc; uniques survive") {
    val docs = Seq(
      (1L, "alpha\nfooter text\nbeta"),
      (2L, "footer text\ngamma"),
      (3L, "delta only")).toDF("doc_id", "text")
    val out = TextCleanup.dropBoilerplateLines(docs, minDocs = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "alpha\nbeta", 2L, 1L),
      (2L, "gamma", 1L, 1L),
      (3L, "delta only", 1L, 0L)))
  }

  test("matching is trim-normalized but output keeps original lines") {
    val docs = Seq(
      (1L, "  footer  \nkeep me  "),
      (2L, "footer\nother")).toDF("doc_id", "text")
    val out = TextCleanup.dropBoilerplateLines(docs, minDocs = 2)
      .orderBy($"doc_id").collect()
    assert(out(0).getString(1) == "keep me  ", "original bytes preserved")
    assert(out(1).getString(1) == "other")
  }

  test("all-boilerplate docs survive as empty text, never vanish") {
    val docs = Seq(
      (1L, "chrome"), (2L, "chrome"), (3L, "chrome\nreal content"))
      .toDF("doc_id", "text")
    val out = TextCleanup.dropBoilerplateLines(docs, minDocs = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 3, "every input doc is present in the output")
    assert(out(0) == ((1L, "", 0L)) && out(1) == ((2L, "", 0L)))
    assert(out(2) == ((3L, "real content", 1L)))
  }

  test("minDocs threshold: a line in fewer docs than the bar is kept") {
    val docs = Seq(
      (1L, "twice\nunique a"), (2L, "twice\nunique b"), (3L, "unique c"))
      .toDF("doc_id", "text")
    val kept = TextCleanup.dropBoilerplateLines(docs, minDocs = 3)
      .agg(sum($"n_dropped")).as[Long].head()
    assert(kept == 0L, "nd=2 < minDocs=3 must keep the line")
    // repeats WITHIN one doc don't cross the distinct-doc bar
    val intra = Seq((1L, "echo\necho\necho"), (2L, "other"))
      .toDF("doc_id", "text")
    val intraOut = TextCleanup.dropBoilerplateLines(intra, minDocs = 2)
      .orderBy($"doc_id").collect()
    assert(intraOut(0).getString(1) == "echo\necho\necho",
      "3 copies in ONE doc is repetition, not cross-corpus boilerplate")
  }

  test("redaction replaces every PII shape and counts match") {
    val df = Seq(
      (1L, "mail a.b+c@d-corp.example.org then 10.0.0.1 then +1 555-123-4567"),
      (2L, "call 555 987 6543 twice 555 987 6543"),
      (3L, "clean text stays identical")).toDF("doc_id", "text")
    val out = df.select($"doc_id" +:
        TextCleanup.redactPii($"text").as("t") +:
        TextCleanup.piiCounts($"text"): _*)
      .orderBy($"doc_id").collect()
    assert(out(0).getString(1) == "mail [EMAIL] then [IP] then +1 [PHONE]")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4))
      == ((1L, 1L, 1L)))
    assert(out(1).getString(1) == "call [PHONE] twice [PHONE]")
    assert(out(1).getLong(4) == 2L)
    assert(out(2).getString(1) == "clean text stays identical")
  }

  test("line dedup plan: fingerprints key the shuffles, not line text") {
    val docs = Seq((1L, "a\nb"), (2L, "b\nc")).toDF("doc_id", "text")
    val plan = TextCleanup.dropBoilerplateLines(docs)
      .queryExecution.optimizedPlan.toString
    // the hot-line aggregate and the anti join must run on fp1/fp2
    assert(plan.contains("fp1") && plan.contains("fp2"),
      s"fingerprint keys missing in:\n${plan.take(2000)}")
    assert(plan.contains("LeftAnti"), "hot-line filter must be an anti join")
  }
}
