package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => F}

/** Corpus-level text cleanup operators for a training-data pipeline:
  * cross-document boilerplate line removal (the C4-style pass that
  * strips "subscribe to our newsletter" from every page it appears
  * on) and PII redaction. Both are driver-checked against DuckDB
  * oracles (`line_dedup`, `pii_redact` rows).
  *
  * The reference engine (/root/reference/src — fnv1a + ordered
  * search, 573 LoC Rust) has no text surface; these operators exist
  * for the 100 TB curation contract and reuse the reference-carried
  * fnv1a identity (fnv1a.rs:101-170) only as a shuffle-key
  * fingerprint.
  */
object TextCleanup {

  /** Second fingerprint lane — the engine-wide constant, so a line
    * fingerprint is the same 128-bit identity everywhere. */
  private val Lane2Seed: Long = graft.functions.Fnv1aCore.Lane2Seed

  /** Remove every line that occurs (trimmed-identical) in at least
    * `minDocs` DISTINCT documents — cross-corpus boilerplate
    * (navigation chrome, cookie banners, signatures). All occurrences
    * are dropped, including the "first": a line frequent across
    * documents is boilerplate everywhere, unlike document-level exact
    * dedup which keeps one winner.
    *
    * Output per input document (all documents are preserved):
    * `doc_id`, `clean_text` (surviving lines joined by \n; empty
    * string — not null — when every line was boilerplate), `n_kept`,
    * `n_dropped`.
    *
    * Scale shape (the 100 TB pass this is designed as):
    *  - every shuffle is keyed by the 128-bit two-lane fnv1a
    *    fingerprint of the trimmed line, not the line text — shuffle
    *    bytes per line are 16 + payload only where payload must
    *    travel (same birthday bound as the exact-dedup row: ~2⁻⁶⁴ at
    *    10¹⁰ distinct lines). The corpus IS scanned and exploded
    *    twice (hot-set aggregation + kept side; Spark reuses
    *    exchanges, not scans — and the kept side has no exchange
    *    once the hot set broadcasts) plus a lines-free third scan
    *    for the sentinels: re-deriving lines from the columnar scan
    *    is the standard trade against materializing a corpus-sized
    *    intermediate, and the expensive part (the shuffles) happens
    *    once;
    *  - the hot-line relation (fingerprints with ≥ minDocs distinct
    *    docs) is by definition the boilerplate subset — orders of
    *    magnitude smaller than the corpus — so AQE turns the
    *    left_anti join into a broadcast join at runtime; no second
    *    full-corpus shuffle for the filter;
    *  - all-boilerplate documents are preserved WITHOUT a second
    *    corpus-wide join: one sentinel row per doc (pos = −1,
    *    carrying the original line count) rides the same doc_id
    *    aggregation, so the reassembly is one union + one hash
    *    aggregation with bounded per-group state (the document's own
    *    lines), map-side combinable like any collect_list — a
    *    plan-shape choice: the naive `docs LEFT JOIN reassembled`
    *    spelling shuffles two corpus-sized relations just to
    *    resurrect the rare empty doc.
    */
  def dropBoilerplateLines(docs: DataFrame, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("fp1", F.fnv1a(trim(col("line"))))
      .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, trim(col("line"))))
    val hot = lines.groupBy(col("fp1"), col("fp2"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("fp1"), col("fp2"))
    val kept = lines.join(hot, Seq("fp1", "fp2"), "left_anti")
      .select(col("doc_id"), col("pos"), col("line"),
        lit(null).cast("long").as("nl"))
    val sentinels = docs.select(col("doc_id"), lit(-1).as("pos"),
      lit(null).cast("string").as("line"),
      size(split(col("text"), "\n")).cast("long").as("nl"))
    kept.unionAll(sentinels)
      .groupBy(col("doc_id"))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list( // when(){no otherwise} is null on
              when(col("pos") >= 0, // the sentinel → collect_list skips it
                struct(col("pos"), col("line"))))),
            x => x.getField("line"))).as("clean_text"),
        count(when(col("pos") >= 0, lit(1))).as("n_kept"),
        max(col("nl")).as("__n_lines"))
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        (col("__n_lines") - col("n_kept")).as("n_dropped"))
  }

  /** PII patterns — deliberately restricted to the regex subset with
    * identical semantics in Java (Spark) and RE2 (DuckDB): character
    * classes, bounded quantifiers, ASCII `\b`/`\d`. No lookaround, no
    * backreferences (RE2 has neither). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** Redacted text: emails, then IPv4s, then phone numbers replaced
    * by bracketed tags, in that fixed order (replacement order is part
    * of the contract — both engines see the same intermediate
    * strings). A narrow per-row projection: no shuffle, stays in
    * whole-stage codegen, scales linearly. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Per-row PII match counts — each pattern counted INDEPENDENTLY
    * over the original text. These are detection signals, not
    * replacement tallies: where patterns overlap (an IPv4 or phone
    * shape inside an email's domain, e.g. `x@1.2.3.4`), [[redactPii]]
    * consumes the span under the earlier pattern while the later
    * pattern still counts its match here — so counts can exceed the
    * tags present in the redacted text, by design. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
    regexp_count(text, lit(Ipv4Re)).cast("long").as("n_ips"),
    regexp_count(text, lit(PhoneRe)).cast("long").as("n_phones"))
}
