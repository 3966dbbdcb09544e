package graft.queries

import graft.Tables
import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** LLM-data-pipeline operators over `documents` / `embeddings` —
  * SURVEY.md §2.J (L1–L9).
  *
  * Everything here is built from the reference's seeded FNV-1a hash
  * family (`create_init`, /root/reference/src/algo/fnv1a.rs:26-28) as
  * native Catalyst expressions — no UDFs, no driver loops. The hot
  * per-element kernels (hashing, dot products) are custom codegen'd
  * expressions (Fnv1aHash, DotProductD); the array plumbing around
  * them uses higher-order functions, whose interpreted lambdas only
  * ever wrap those O(1)-per-call kernels.
  *
  * Scale contract per operator:
  *  - near-dedup (MinHash and embedding-cosine alike): candidates come
  *    ONLY from per-band-bucket grouping (shuffle key = (band_no,
  *    band hash), near-uniform); the O(n²) all-pairs comparison exists
  *    only in the DuckDB oracle. Band width is the retuning knob:
  *    r ≈ log₂ n keeps candidate pairs O(b·n).
  *  - kNN: the probe set is broadcast; the corpus is never replicated
  *    or collected. Two scale paths prune candidates: sign-LSH
  *    buckets (ann_lsh, 16-bit signature → 64k buckets) and IVF cells
  *    (ivf_ann, nearest-centroid partition + nprobe probing — the
  *    natural bucketed-layout key for a 100-TB vector table).
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Second-fingerprint-lane / seed-spacing constant (2^64 / golden
    * ratio — a public mixing constant); any init state != OffsetBasis
    * yields an independent member of the reference's `create_init`
    * hash family. */
  private val Lane2Seed: Long = graft.functions.Fnv1aCore.Lane2Seed

  private val MinHashSeeds = 64

  /** Largest LSH band bucket handled as one task's array; above it,
    * candidate generation hash-chunks the bucket (CandidatePairs) so
    * per-task work stays ≤ cap² pair checks at any corpus scale. */
  val DefaultBucketCap = 1024
  /** The dedup fixture's verify threshold; banding for any τ is
    * computed per call by [[minhashNearDupPairs]] via
    * graft.operators.LshTuning (τ=0.5 with 64 lanes ⇒ 16 bands × 4
    * rows, S-curve threshold (1/16)^(1/4) = 0.5 exactly; a larger
    * corpus raises the seed budget and the same rule recomputes
    * sharper bands at the same threshold). */
  private val MinHashJaccardTau = 0.5

  /** Merge rounds for the `bpe_train` trainer (L90) — enough that the
    * argmax chain does real multi-symbol merges on the fixture
    * (merged symbols win later rounds) while the unrolled oracle CTE
    * stays readable. Production trainers run the identical loop to
    * vocab size; k is the only knob. */
  private[graft] val BpeRounds = 8

  /** df cap for `dup_span_runs` pair generation: a shared span in
    * more docs than this is boilerplate (L14's department), not
    * pairwise memorization evidence, and would fan out O(df²) pair
    * rows per span. */
  private val SpanDfCap = 16

  /** The fixed term queries shared by `bm25_search` (brute corpus
    * scan) and `bm25_indexed` (term-bucket layout) — identical inputs
    * so both run against the identical oracle SQL. */
  private val Bm25QueryTerms: Seq[(Long, String)] = Seq(
    (0L, "hash"), (0L, "join"),
    (1L, "scan"), (1L, "filter"), (1L, "vector"),
    (2L, "customer"), (2L, "merge"), (2L, "slow"))

  /** The brute-scan BM25 ranking shared by `bm25_search` (top-10 with
    * scores) and `hybrid_rrf` (top-20 lexical arm): (query_id, doc_id,
    * sq = quantized integer score, rank), rank <= limit. Scale shape
    * is documented on `bm25_search`, whose body this is. */
  private def bm25Ranked(s: SparkSession, dir: String,
      limit: Int): DataFrame = {
    import s.implicits._
    val qterms = Bm25QueryTerms.toDF("query_id", "term")
    val docs = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
    val dl = docs.select($"doc_id", size($"ws").cast("long").as("dl"))
    val stats = broadcast(dl.agg(count(lit(1)).as("n_docs"),
      sum($"dl").as("sum_dl")))
    val tf = docs.select($"doc_id", explode($"ws").as("term"))
      .join(broadcast(qterms.select($"term").distinct()), "term")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val idf = log(($"n_docs".cast("double") - $"df".cast("double") +
      lit(0.5)) / ($"df".cast("double") + lit(0.5)) + lit(1.0))
    val tfn = ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
        ($"dl".cast("double") /
          ($"sum_dl".cast("double") / $"n_docs".cast("double")))))
    val w = Window.partitionBy($"query_id").orderBy($"sq".desc, $"doc_id")
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(stats)
      .join(broadcast(qterms), "term")
      .select($"query_id", $"doc_id",
        floor(idf * tfn * lit(10000.0) + lit(0.5)).as("qs"))
      .groupBy($"query_id", $"doc_id").agg(sum($"qs").as("sq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= limit)
  }

  /** Per-dir written term-index paths (`bm25_indexed`) — build once
    * per JVM, exactly the persisted-index production shape. */
  private val termIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-dir two-snapshot layout roots (`schema_evolution`). */
  private val schemaEvoCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One oracle for both BM25 spellings (brute and indexed) — they
    * must agree row-for-row, so they share the SQL literally. */
  /** The BM25 scoring CTE chain (ends in `sc(query_id, doc_id, sq)`)
    * shared by the `bm25_search`/`bm25_indexed` oracle and the
    * lexical arm of the `hybrid_rrf` oracle. */
  private val Bm25CtesSql: String =
    """qt(query_id, term) AS (VALUES
      |    (0, 'hash'), (0, 'join'),
      |    (1, 'scan'), (1, 'filter'), (1, 'vector'),
      |    (2, 'customer'), (2, 'merge'), (2, 'slow')),
      |dl AS (SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |       FROM documents),
      |stats AS (SELECT COUNT(*) AS n_docs,
      |            CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  WHERE term IN (SELECT term FROM qt)
      |  GROUP BY doc_id, term),
      |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |q AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(FLOOR(
      |      ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
      |         (CAST(df AS DOUBLE) + 0.5) + 1.0) *
      |      ((CAST(tf AS DOUBLE) * 2.2) /
      |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        (CAST(dl AS DOUBLE) /
      |         (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
      |      * 10000.0 + 0.5) AS BIGINT) AS qs
      |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN stats JOIN qt USING (term)),
      |sc AS (SELECT query_id, doc_id, CAST(SUM(qs) AS BIGINT) AS sq
      |       FROM q GROUP BY 1, 2)""".stripMargin

  private val Bm25OracleSql: String =
    s"""WITH $Bm25CtesSql,
      |r AS (SELECT query_id, doc_id, sq,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |                           ORDER BY sq DESC, doc_id) AS rank
      |      FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      |  CAST(rank AS BIGINT) AS rank, doc_id,
      |  CAST(sq AS DOUBLE) / 10000.0 AS score
      |FROM r WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Distinct word 3-gram shingles of a single-spaced lowercase text
    * column (the documents fixture is exactly that). */
  private def shingles(text: Column): Column = {
    val t = split(text, " ")
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))))
      .otherwise(array(text))
  }

  /** The 64 MinHash seeds — family member s is init state
    * OffsetBasis ^ (s · golden), the wrap computed at plan time (ANSI
    * mode rejects a wrapping multiply in-row, and these are constants). */
  private val minhashSeedList: Seq[Long] =
    (0 until MinHashSeeds).map(s => Fnv1aCore.OffsetBasis ^ (s.toLong * Lane2Seed))

  /** MinHash signature over pre-hashed shingles: element s = min over
    * shingles of fnv1a_seeded(seed_s, content-hash). Each shingle
    * string is hashed ONCE (see the query); the 64 lanes then hash only
    * its 8-byte value — 64 string re-hashes per shingle would dominate
    * the whole pipeline (measured ~3x slower end-to-end). All lanes
    * are computed in one codegen'd pass (MinHashSignature, proven
    * value-identical to the per-lane HOF spelling in
    * MinHashSignatureSpec). */
  private def minhashSig(hs: Column): Column =
    F.minhash_sig(minhashSeedList, hs)

  /** LSH band keys: band b hashes signature rows [b*r, b*r+r) into one
    * 64-bit key (seeded with the band index so bands never collide
    * across b). Parameterized by the banding plan — the lane offsets
    * are derived from `rows`, never hard-coded. */
  private def bandKeys(sig: Column, rows: Int, bands: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.cast("int").as("band_no"),
        F.fnv1a_seeded_dyn(b.cast("long"),
          (1 to rows).map(i => element_at(sig, b * rows + i)): _*)
          .as("band_hash")))

  /** Left-fold sum from 0.0 — the exact IEEE sequence the DuckDB
    * oracle reproduces with list_reduce(list_prepend(0.0, ...)). */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Composite per-doc quality on the eighth grid — four banded
    * signals (length, type-token ratio, stopword ratio, mean token
    * length) averaged; shared by doc_quality, token_budget_select
    * (and mirrored by [[qualitySqlCte]]). */
  private def qualityOf(text: Column): Column = {
    val t = split(text, " ")
    val nTok = size(t).cast("double")
    val ttr = q6(size(array_distinct(t)).cast("double") / size(t))
    val stop = q6(size(filter(t, w => w === "the" || w === "a" || w === "of"))
      .cast("double") / size(t))
    val avgLen = q6(foldSum(transform(t, w => length(w).cast("double"))) / size(t))
    val lenScore = when(nTok >= 50 && nTok <= 5000, 1.0)
      .when(nTok >= 20, 0.5).otherwise(0.0)
    val ttrScore = when(ttr >= 0.3 && ttr <= 0.9, 1.0).otherwise(0.5)
    val stopScore = when(stop >= 0.02 && stop <= 0.3, 1.0).otherwise(0.5)
    val lenSanity = when(avgLen >= 2.0 && avgLen <= 12.0, 1.0).otherwise(0.0)
    q6((lenScore + ttrScore + stopScore + lenSanity) / 4.0)
  }

  /** Distinct shingle HASHES from `text`, no string materialization: a
    * shingle's identity is the chained hash of its three token hashes
    * (fnv1a chaining = composite keys, fnv1a.rs:9-11), computed by the
    * one-pass [[graft.functions.ShingleHashSet]] kernel (value-equal
    * to the three-stage HOF spelling it replaced — ShingleHashesSpec).
    * `keep` columns are passed through.
    *
    * Docs with fewer than 3 tokens fall back to ONE whole-text shingle
    * — the chained hash of all token hashes, the hash identity of
    * [[shingles]]'s `array(text)` fallback and of the oracle CTE's
    * `ELSE [text]` branch, so all three spellings agree on short docs. */
  private def withShingleHashes(df: DataFrame, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ F.shingle_hash_set(col("text")).as("hs"): _*)

  /** Codegen'd left-fold dot product (DotProductD) — IEEE-identical
    * to the HOF spelling and the DuckDB list_reduce recipe. */
  private def dot(a: Column, b: Column): Column = F.dotd(a, b)

  private def l2norm(a: Column): Column = sqrt(F.dotd(a, a))

  private val NearDupPlanes = 96

  /** Deterministic pseudo-random ±1 hyperplanes over the 64-dim
    * embedding space: component j of plane h is ±1 from the POPCOUNT
    * PARITY of the chained seeded hash fnv1a(j ∥ fnv1a(h)) — the
    * reference's `create_init` family again (fnv1a.rs:26-28),
    * evaluated at plan-construction time so rows never pay for it.
    * Parity folds all 64 state bits; FNV-1a's bit 0 alone must NOT be
    * used here — it has no avalanche for short inputs and alternates
    * with j, which collapses every plane to ±(+1,−1,+1,…): two
    * effective planes, two LSH buckets, and O(n²) candidate pairs
    * (measured: ~1M pairs over 2000 vectors before this fix).
    * All-±1 vectors share the exact norm 8, so argmax-dot over them
    * equals argmax-cosine (used by IVF cell assignment), and each
    * literal round-trips exactly into oracle SQL. The first 16 serve
    * ann_lsh/ivf_ann; all 96 serve the near-dup bands. */
  private val hyperplanes: Seq[Seq[Double]] = (0 until NearDupPlanes).map { h =>
    (0 until 64).map { j =>
      val parity = java.lang.Long.bitCount(Fnv1aCore.hashLong(j.toLong,
        Fnv1aCore.hashLong(h.toLong, Fnv1aCore.OffsetBasis))) & 1
      if (parity == 1) 1.0 else -1.0
    }
  }

  private def planeLit(h: Int): Column = array(hyperplanes(h).map(lit): _*)

  /** Multi-byte UTF-8 probe doc unioned into `binary_features` AND its
    * DuckDB oracle: the leading 3-byte code points make `header_hex`
    * cut through a partial code point and shift byte_mean away from
    * any character-based computation — if either side ever computed
    * features from characters instead of raw UTF-8 bytes, this row
    * would hash-mismatch. (No single quotes: the text is interpolated
    * into the oracle SQL literal verbatim.) */
  private[queries] val nonAsciiProbeText =
    "日本語テキスト héllo wörld ümlaut ascii tail"

  /** Literal es/de probe docs unioned into `lang_id_heuristic` AND its
    * oracle. The synthetic corpus is English-ish — es/de stopword
    * ratios are ~all zero and the prediction is decided by the argmax
    * tiebreak alone; these rows make the three score vectors actually
    * separate, so the oracle verifies the scoring MECHANISM, not just
    * the tie order. (No single quotes: interpolated into SQL.) */
  private[queries] val langIdProbes: Seq[(Long, String, String)] = Seq(
    (-3L, "de", "der hund und die katze sehen das auto und der mann liest das buch"),
    (-2L, "es", "el perro corre por la playa y la casa de el sol es de la madre"))

  /** TRAINING probes for `lang_id_trigram` (L98): a few rows of real
    * text per non-English class, unioned into the labeled training
    * corpus so each class's trigram profile carries genuine
    * characteristic n-grams on top of the fixture's English-ish word
    * salad (whose per-class profiles are statistically identical).
    * (No single quotes: interpolated into SQL.) */
  private[graft] val trigramTrainProbes: Seq[(Long, String, String)] = Seq(
    (-60L, "en", "the quick brown fox jumps over the lazy dog while reading newspapers every morning"),
    (-59L, "en", "children playing together in the garden watched the shining stars through clear evening skies"),
    (-58L, "de", "geschwindigkeit wissenschaftler entwicklung natürlich zwischen brücke während müssen durchschnitt verständnis"),
    (-57L, "de", "möglichkeit geschichte wichtig sprache schreiben lesen schließen über größe straße"),
    (-56L, "es", "canción corazón información atención niños señora años español ciudad después"),
    (-55L, "es", "también situación educación producción música rápido pequeño mañana trabajo investigar"),
    (-54L, "fr", "français château déjà très être où général après toujours beaucoup"),
    (-53L, "fr", "développement gouvernement première connaître plutôt peut-être voilà élève fenêtre forêt"),
    (-52L, "zh", "中文文本处理系统需要大量高质量的训练数据进行建模"),
    (-51L, "zh", "语言模型的预训练语料库需要严格的质量控制和去重流程"))

  /** SCORING probes for `lang_id_trigram`: real-language text with
    * ZERO stopword-list hits (none of the/a/of, el/la/de, der/die/das
    * as whole tokens) — the stopword tier (L5) votes en on every one
    * of these by tiebreak, while the trigram model identifies them.
    * These rows are what separates the two mechanisms. (No single
    * quotes.) */
  private[graft] val trigramScoreProbes: Seq[(Long, String, String)] = Seq(
    (-44L, "de", "schließlich bemühungen verständnisvolle wissenschaftliche durchführung überraschung größenordnung"),
    (-43L, "es", "investigación comunicación civilización oportunidades extraordinario corazones pequeñas"),
    (-42L, "fr", "développées caractéristiques générations connaissances extraordinaires châteaux forêts"),
    (-41L, "zh", "自然语言处理模型训练语料库质量控制流程"),
    (-40L, "en", "reading newspapers every morning children playing together watched shining stars through clear evening skies"))

  /** `(source, text)` probe docs unioned into `tfidf_terms` AND its
    * oracle. The synthetic vocabulary is shared by every source, so
    * corpus-only idf is ln(1)=0 everywhere and the per-source ranking
    * would be decided by the term tiebreak alone; these rows plant
    * terms confined to one or two sources, making tf·idf actually
    * separate — the oracle then checks the scoring mechanism, not
    * just the tie order. (No single quotes: interpolated into SQL.) */
  private[queries] val tfidfProbes: Seq[(String, String)] = Seq(
    ("src0", "zephyr zephyr zephyr quark quark glome"),
    ("src1", "quark zephyrine glome glome"))

  /** Multi-line probe docs unioned into `line_dedup` AND its oracle:
    * the synthetic corpus has no newlines (each doc is one unique
    * line), so these carry the mechanism — a boilerplate line shared
    * by three docs (once with padding, pinning trim-normalized
    * matching), an all-boilerplate doc (must survive as empty text,
    * not vanish), and an empty line (kept: one doc only). (No single
    * quotes: interpolated into SQL via [[sqlText]].) */
  private[queries] val boilerplateProbes: Seq[(Long, String)] = Seq(
    (-14L, "unique alpha content line\nsubscribe to our newsletter\nmore alpha thoughts"),
    (-13L, "  subscribe to our newsletter  \nunique beta content line"),
    (-12L, "subscribe to our newsletter"),
    (-11L, "solo gamma line\n\nsolo delta line"))

  /** PII probe docs unioned into `pii_redact` AND its oracle — the
    * corpus is PII-free word salad, so these pin each pattern, the
    * fixed replacement order, and multi-match counting. (No single
    * quotes.) */
  private[queries] val piiProbes: Seq[(Long, String)] = Seq(
    (-24L, "contact alice.smith+spam@example.com or bob_x@sub.domain.org today"),
    (-23L, "server at 192.168.0.1 and 10.0.0.255 port logs"),
    (-22L, "call +1 555-123-4567 or 555 987 6543 now"),
    (-21L, "mixed a@b.co 127.0.0.1 555-000-1111 end"))

  /** Degenerate-shape probes for `repetition_stats`: a one-token doc
    * (no bigrams — the guard branch) and a highly repetitive doc (the
    * signal the metric exists to catch). */
  private[queries] val repetitionProbes: Seq[(Long, String)] = Seq(
    (-32L, "solo"),
    (-31L, "spam spam spam spam ham"))

  /** Ingestion probes for `incremental_dedup` — the corpus has no
    * exact-duplicate texts, so these carry the mechanism. Ids are far
    * above any fixture range; `id % 4 == 3` puts a doc in the NEW
    * batch, anything else in the EXISTING corpus. One batch doc
    * duplicates an existing doc (dropped via the corpus fingerprint
    * match), two batch docs duplicate each other (smaller id wins),
    * one is unique (kept). Full 5-column rows so the probes flow
    * through the same schema as the fixture. (No single quotes.) */
  private[queries] val ingestProbes: Seq[(Long, String, String, String, Long)] = {
    def p(id: Long, text: String) =
      (id, text, "xx", "probe", text.length.toLong)
    Seq(
      p(9000004L, "probe duplicate alpha content"), // existing corpus
      p(9000003L, "probe duplicate alpha content"), // batch: corpus dup
      p(9000007L, "probe duplicate beta content"),  // batch: pair winner
      p(9000011L, "probe duplicate beta content"),  // batch: pair loser
      p(9000015L, "probe unique gamma content"))    // batch: unique
  }

  /** Probe docs for `full_curation` — the corpus alone exercises the
    * split, gate, budget, chunk and pack stages, and these engineer a
    * guaranteed hit for each REMOVAL stage so the composed chain
    * observably fires end to end at any sf. Ids are chosen for their
    * md5 split label (computed, not assumed): −43 lands in `test`,
    * every other id below lands in `train`.
    *
    *  - −62/−61: identical texts — exact dedup keeps −62, drops −61.
    *  - −60/−54: one-token edit (3-gram Jaccard ≈ 0.96) — both train,
    *    so the near-dup closure drops the non-canonical −54.
    *  - −48/−43: one-token edit across splits (train vs test) — the
    *    decontamination stage drops the train member −48.
    *  - −68/−67/−66: share one boilerplate line (full-text Jaccard
    *    far below τ, so the near-dup stage does NOT collapse them);
    *    line dedup strips the line, and −66 (all boilerplate) comes
    *    out empty and is then dropped by the quality gate.
    *  - −42: carries an email + IP + phone — the redaction stage
    *    rewrites them and the doc flows on with its [EMAIL]-style
    *    tokens.
    *
    * (No single quotes — interpolated into oracle SQL via
    * [[sqlText]].) */
  private[graft] val fullCurationProbes: Seq[(Long, String)] = {
    val dupText = "the probe duplicate pair shares every single byte " +
      "of this text so the exact fingerprint stage must collapse it to " +
      "one winner row keeping the smaller identifier and dropping the " +
      "larger one while later stages never see a second copy of these " +
      "words at all"
    def nearDup(last: String) = "the near duplicate stage of this " +
      "curation chain must catch a pair of documents that differ in " +
      "exactly one token because their shingle sets overlap far above " +
      "the half jaccard threshold used by the minhash bands across the " +
      "whole corpus sweep " + last
    def contam(last: String) = "benchmark decontamination must drop a " +
      "training document that nearly duplicates an evaluation document " +
      "because eval leakage inflates scores and the pipeline keeps the " +
      "eval side untouched while the train side vanishes from the " +
      "final packed output stream " + last
    val sharedLine = "subscribe to the probe newsletter for more updates"
    Seq(
      (-68L, "unique epsilon opening thought line\n" + sharedLine +
        "\nthe epsilon body continues with a careful account of the " +
        "boilerplate removal stage and its fingerprint keyed shuffle"),
      (-67L, sharedLine + "\nthe zeta body text describes a different " +
        "topic entirely with tokens about packing budgets and quality " +
        "gates of the composed pipeline"),
      (-66L, sharedLine),
      (-62L, dupText),
      (-61L, dupText),
      (-60L, nearDup("tonight")),
      (-54L, nearDup("today")),
      (-48L, contam("forever")),
      (-43L, contam("always")),
      (-42L, "the contact card of this probe lists mail to " +
        "agent.x@example.org plus a backup server at 10.1.2.3 and a " +
        "phone line 555-123-9876 for the auditors of the final corpus " +
        "assembly process today"))
  }

  /** A Scala string as a DuckDB SQL literal, newlines spliced as
    * `chr(10)` (texts must not contain single quotes). */
  private def sqlText(s: String): String =
    "'" + s.replace("\n", "' || chr(10) || '") + "'"

  /** `(id, text)` probe rows as a SQL VALUES list. */
  private def sqlProbeValues(ps: Seq[(Long, String)]): String =
    ps.map { case (id, t) => s"($id, ${sqlText(t)})" }.mkString(", ")

  /** Full 5-column ingest-probe rows as a SQL VALUES list. */
  private def sqlIngestProbeValues: String =
    ingestProbes.map { case (id, t, lang, src, n) =>
      s"($id, ${sqlText(t)}, ${sqlText(lang)}, ${sqlText(src)}, CAST($n AS BIGINT))"
    }.mkString(", ")

  /** The first `bands·bits` hyperplanes, row-major-flattened for the
    * one-pass [[graft.functions.SignBandKeys]] codegen kernel (which
    * replaced the interpreted transform-over-planes + per-band
    * slice/fold spelling; parity pinned in SignBandKeysSpec). */
  private[queries] def flatHyperplanes(n: Int): Seq[Double] =
    hyperplanes.take(n).flatten

  /** Banded sign-LSH candidate pairs + exact cosine verify — the
    * embedding-cosine near-dup operator, parameterized so specs can
    * plant known duplicates. `emb` must carry (vec_id: long,
    * v: array<double>). Banding is computed from the corpus size
    * (LshTuning.signBits: bits ≈ log₂ n keeps bucket occupancy O(1)
    * and candidate pairs O(b·n) — no fixture-tuned constants): at
    * sf0.1's ~5k vectors that is 13-bit bands × 7 over the 96-plane
    * budget; at τ=0.99 (angle 8.1°) per-plane sign agreement is
    * p = 1 − θ/π ≈ 0.955, so pair recall is 1−(1−p¹³)⁷ ≈ 0.996.
    * Candidates come only from per-band bucket grouping — the
    * all-pairs comparison exists only in the DuckDB oracle. */
  def embedNearDupPairs(emb: DataFrame, tau: Double,
      sizeHint: Option[Long] = None,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // sizeHint lets the caller supply a cheap cardinality (e.g. a
    // parquet metadata count) instead of paying a full eager job over
    // the possibly-transformed input just to size the banding; an
    // empty corpus floors to 1 so LshTuning stays defined.
    val n = math.max(1L, sizeHint.getOrElse(emb.count()))
    val (bandBits, bandCount) =
      graft.operators.LshTuning.signBits(n, NearDupPlanes)
    // every band key in ONE codegen pass (SignBandKeys): bands*bits
    // dot products, signs packed in-register — no interpreted
    // per-plane lambda, no per-band slice/aggregate sweep.
    val flatPlanes: Seq[Double] = flatHyperplanes(bandCount * bandBits)
    val bucketed = emb.select($"vec_id",
        posexplode(F.sign_band_keys($"v", flatPlanes, 64, bandBits))
          .as(Seq("band_no", "band_key")))
    // Skew-proof per-bucket pair generation (CandidatePairs): bounded
    // buckets keep the one-pass grouped path; a hot bucket is hash-
    // chunked into ≤ cap² cells so no single task owns its O(m²).
    val cand = graft.operators.CandidatePairs.fromBuckets(bucketed,
      Seq("band_no", "band_key"), "vec_id", "va", "vb", bucketCap)
    cand
      .join(emb.select($"vec_id".as("va"), $"v".as("v_a")), "va")
      .join(emb.select($"vec_id".as("vb"), $"v".as("v_b")), "vb")
      .select($"va", $"vb",
        q6(dot($"v_a", $"v_b") / (l2norm($"v_a") * l2norm($"v_b")))
          .as("cos_sim"))
      .filter($"cos_sim" >= tau)
      .orderBy($"va", $"vb")
  }

  /** MinHash + LSH near-dedup pairs over a (doc_id, text) relation:
    * exact word-3-gram Jaccard ≥ `tau` pairs. The banding is computed
    * FROM `tau` (LshTuning.minhashBands with the 64-lane budget — at
    * τ=0.5 that is 16 bands × 4 rows; recall at the J≥0.97 dup band:
    * 1-(1-0.97^4)^16 ≈ 1-4e-8; at the J<0.1 background, band-match
    * odds ≈ 1e-4/pair — false candidates are killed by the exact
    * Jaccard verify), so a different threshold re-tunes the candidate
    * generator rather than just the verify filter. Parameterized so
    * specs can feed synthetic corpora (short docs, planted near-dups)
    * through the exact production path. */
  def minhashNearDupPairs(docs: DataFrame, tau: Double,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (lshRows, lshBands) =
      graft.operators.LshTuning.minhashBands(tau, MinHashSeeds)
    // Hash-repartition on doc_id before the CPU-heavy stages: a
    // compact text table arrives in few input splits, and signature
    // hashing is compute-bound — without the spread a single task
    // would hash everything (measured 3-5x end-to-end). At cluster
    // scale the same repartition balances skewed input files.
    val base = docs.select($"doc_id", $"text").repartition($"doc_id")
    // Candidate generation never materializes shingle STRINGS —
    // building ~250 concat'd strings per doc was the measured
    // bottleneck of the whole pipeline (hash-identity shingles only
    // affect CANDIDATE generation; the exact string-level Jaccard
    // verify below decides membership).
    val hashed = withShingleHashes(base, Seq("doc_id"))
    // Each stage is materialized as its own column/projection: the
    // signature references hs 64 times and the band keys reference
    // sig 64 times — splicing either expression tree in-place would
    // recompute it per reference (measured: 26x slower end-to-end).
    // As separate projections, CollapseProject keeps expensive
    // aliases referenced >1 time un-inlined.
    val sigd = hashed.select($"doc_id", minhashSig($"hs").as("sig"))
    val bucketed = sigd
      .select($"doc_id", explode(bandKeys($"sig", lshRows, lshBands)).as("bk"))
      .select($"doc_id", $"bk.band_no".as("band_no"),
        $"bk.band_hash".as("band_hash"))
    // Candidate pairs via skew-proof per-bucket grouping
    // (CandidatePairs.fromBuckets — ONE signature pass; exchange reuse
    // keeps the signature pipeline from re-running for the hot-bucket
    // self-join branch). Exact duplicates are normally collapsed by
    // exact_dedup (L1) first, which keeps buckets small — but a hot
    // template cluster no longer needs that precondition for the plan
    // to survive: buckets past `bucketCap` are hash-chunked so pair
    // generation distributes instead of landing on one reducer.
    val cand = graft.operators.CandidatePairs.fromBuckets(bucketed,
      Seq("band_no", "band_hash"), "doc_id", "doc_a", "doc_b", bucketCap)
    // Exact string-level Jaccard verify — shingle strings are built
    // only here, for the handful of candidate pair rows.
    cand
      .join(base.select($"doc_id".as("doc_a"), $"text".as("text_a")), "doc_a")
      .join(base.select($"doc_id".as("doc_b"), $"text".as("text_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        shingles($"text_a").as("sh_a"), shingles($"text_b").as("sh_b"))
      .select($"doc_a", $"doc_b",
        q6(size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b"))).as("jaccard"))
      .filter($"jaccard" >= tau)
      .orderBy($"doc_a", $"doc_b")
  }

  /** `(doc_id, band_no, band_hash)` LSH band keys of a
    * (doc_id, text) relation at threshold `tau` — the persisted-index
    * unit ([[graft.operators.BandIndex]]) and the in-query banding of
    * [[minhashNearDupPairs]] / `incremental_neardup`, one spelling
    * (banding computed FROM tau by LshTuning; signature/band stages
    * as separate projections so CollapseProject never re-inlines the
    * 64-reference expressions). */
  private[graft] def minhashBandsOf(docs: DataFrame, tau: Double): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (lshRows, lshBands) =
      graft.operators.LshTuning.minhashBands(tau, MinHashSeeds)
    val hashed = withShingleHashes(
      docs.select($"doc_id", $"text").repartition($"doc_id"), Seq("doc_id"))
    hashed.select($"doc_id", minhashSig($"hs").as("sig"))
      .select($"doc_id",
        explode(bandKeys($"sig", lshRows, lshBands)).as("bk"))
      .select($"doc_id", $"bk.band_no".as("band_no"),
        $"bk.band_hash".as("band_hash"))
  }

  /** The k-round BPE trainer chain over the corpus word-frequency
    * table, shared by `bpe_train` (the merge table) and `bpe_apply`
    * (the corpus-wide application): per-round one-row merge frames
    * plus the FINAL word table (w, seq, cnt) after all k merges.
    * Pure plan construction — every argmax rides a one-row broadcast
    * folded into the plan, no driver collect. Symbol sequences are
    * U+001F-wrapped strings; each merge is one literal replace()
    * (left-to-right non-overlapping in both engines = greedy BPE
    * application). See the `bpe_train` query comment for the 100 TB
    * shape rationale. */
  private val bpeChainCache =
    new SessionCache[(DataFrame, DataFrame)]

  /** The (round table, final word states) pair, persisted as two
    * restart-survivable [[graft.operators.ArtifactStore]] layouts —
    * a NEW JVM (or session) reads the parquet artifacts instead of
    * re-running the 8-round trainer; both relations are deterministic
    * so consumers are bitwise-identical either way. One lazy build
    * feeds both artifacts when either is missing. */
  private def bpeChain(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    bpeChainCache.get(s, dir) { d =>
      import graft.operators.ArtifactStore
      lazy val built = buildBpeChain(s, d)
      val rounds = ArtifactStore.getOrBuild(s, d, "bpe_rounds",
        BpeVersion)(built._1.reduce(_ unionAll _))
      val fin = ArtifactStore.getOrBuild(s, d, "bpe_final",
        BpeVersion)(built._2)
      (rounds, fin)
    }

  /** Artifact version tag for the BPE layouts — encodes the one
    * tuning constant the build depends on. */
  private def BpeVersion = s"v1:r$BpeRounds"

  private def buildBpeChain(s: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) = {
    import s.implicits._
    val U = "\u001f"
    val D2 = U + U
    def syms(c: org.apache.spark.sql.Column) = split(trim(c, U), D2)
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      // wrap every char: "abc" -> (U)a(U)(U)b(U)(U)c(U)
      .select($"w", regexp_replace($"w", "(.)", U + "$1" + U).as("seq"),
        $"cnt")
      // materialize once: 2k+1 subplans per round chain re-read this
      .localCheckpoint()
    var cur = words
    val roundRows = (1 to BpeRounds).map { r =>
      val pc = cur
        .select($"cnt", syms($"seq").as("s"))
        .select($"cnt", explode(expr(
          "zip_with(slice(s, 1, size(s)-1), slice(s, 2, size(s)-1), " +
            "(x, y) -> struct(x AS a, y AS b))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"cnt").as("c"))
      // each round MATERIALIZES once (localCheckpoint, the CC-loop
      // precedent): without it every later round's branch in the
      // unioned output replays all earlier replaces and argmaxes —
      // measured 10.2 s for the 8-round table at sf0.1 vs ~0.1 s
      // reading the checkpointed rounds. Construction (cached per
      // dir) pays ~3 small jobs per round exactly once per JVM; at
      // cluster scale swap localCheckpoint for a reliable dir via
      // Checkpointing.withTruncation, same shape.
      val best = pc.orderBy($"c".desc, $"a", $"b").limit(1)
        .localCheckpoint()
      val next = cur.crossJoin(broadcast(best))
        .select($"w",
          expr(s"replace(seq, concat('$U', a, '$D2', b, '$U'), " +
            s"concat('$U', a, b, '$U'))").as("seq"), $"cnt")
        .localCheckpoint()
      val vocab = next.select(explode(syms($"seq")).as("sym"))
        .agg(countDistinct($"sym").as("vocab_after"))
        .localCheckpoint()
      val row = best.crossJoin(broadcast(vocab))
        .select(lit(r.toLong).as("merge_round"), $"a".as("left_sym"),
          $"b".as("right_sym"), $"c".as("pair_count"), $"vocab_after")
      cur = next
      row
    }
    (roundRows, cur)
  }

  /** Shared front end of the cluster-closure queries: MinHash near-dup
    * pairs at the standard τ, closed into components. The CC driver
    * loop runs at DataFrame-construction time (like the k-means build
    * in `ivf_ann_learned`) — the returned frame is the materialized
    * labeling (node, component = min doc_id of the cluster). */
  /** The STANDARD fixture pair set (documents at τ=0.5),
    * materialized once per dir per JVM — the graph pairCache pattern:
    * ~ten closure/audit queries consume this same LSH pass, so a
    * Verify/Bench JVM pays the banding + verify once and every
    * consumer reads the checkpointed (small, id-pair) relation. */
  private val nearDupPairsCache = new SessionCache[DataFrame]

  /** Artifact version for the standard pair set / closure — encodes
    * the verify threshold and the seed budget the banding derives
    * from. */
  private def lshVersion =
    s"v1:tau$MinHashJaccardTau:seeds$MinHashSeeds"

  private[graft] def nearDupPairsCached(
      s: SparkSession, dir: String): DataFrame =
    nearDupPairsCache.get(s, dir) { d =>
      import s.implicits._
      graft.operators.ArtifactStore.getOrBuild(s, d, "lsh_pairs",
        lshVersion)(
        minhashNearDupPairs(
          Tables.documents(s, d).select($"doc_id", $"text"),
          MinHashJaccardTau))
    }

  /** The standard closure labeling over [[nearDupPairsCached]], also
    * per-dir — the CC driver loop runs once per BUILD of the persisted
    * artifact; every later JVM reads the labeling parquet without
    * re-running the loop. */
  private val nearDupCompCache = new SessionCache[DataFrame]

  private def nearDupComponents(s: SparkSession, dir: String): DataFrame =
    nearDupCompCache.get(s, dir)(d =>
      graft.operators.ArtifactStore.getOrBuild(s, d,
        "neardup_components", lshVersion)(
        graft.operators.ConnectedComponents.components(
          nearDupPairsCached(s, d), "doc_a", "doc_b")))

  /** The L96 incremental-curation funnel — cached per dir (stage 2's
    * banding + verify and stage 3's closure run construction-time
    * jobs; the funnel is tiny). */
  /** The per-source centroid relation (source, cvec) shared by L95
    * (`source_centroids`) and L97 (`source_affinity`) — built once
    * per dir (≤ sources × 64 doubles, checkpointed). */
  private val sourceCentCache = new SessionCache[DataFrame]

  private def sourceCentroidRelation(
      s: SparkSession, dir: String): DataFrame =
    sourceCentCache.get(s, dir) { d =>
      graft.operators.ArtifactStore.getOrBuild(s, d,
        "source_centroids", "v1:q4")(buildSourceCentroids(s, d))
    }

  private def buildSourceCentroids(
      s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val e = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .join(Tables.documents(s, d)
          .select($"doc_id".as("vec_id"), $"source"), "vec_id")
      e.select($"source", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"source", $"i")
        .agg(sum(floor($"x" * lit(10000.0) + lit(0.5)).cast("long"))
          .as("sq"), count(lit(1)).as("n"))
        .select($"source", $"i",
          ($"sq".cast("double") / $"n".cast("double") / lit(10000.0))
            .as("c"))
        .groupBy($"source")
        .agg(array_sort(collect_list(struct($"i", $"c"))).as("ic"))
        .select($"source", expr("transform(ic, p -> p.c)").as("cvec"))
  }

  private val incrCurationCache = new SessionCache[DataFrame]

  private def incrementalCurationFunnel(
      s: SparkSession, dir: String): DataFrame =
    incrCurationCache.get(s, dir) { d =>
      import s.implicits._
      val base = Tables.documents(s, d).select($"doc_id", $"text")
      val corpus = base.filter($"doc_id" % 10 =!= 0)
      val exactProbes = corpus.filter($"doc_id" % 17 === 2)
        .select(($"doc_id" + 30000000L).as("doc_id"), $"text")
      val nearProbes = corpus.filter($"doc_id" % 23 === 3)
        .select(($"doc_id" + 40000000L).as("doc_id"),
          concat($"text", lit(" ingestprobe")).as("text"))
      // within-batch twin probes guarantee stage 3 does real work:
      // two variants of the same batch doc near-dup each other AND
      // their original — a 3-member batch cluster whose canonical
      // (min id = the original) must survive
      val twinBase = base.filter($"doc_id" % 10 === 0 &&
        $"doc_id" % 13 === 1)
      val twinProbes = twinBase
        .select(($"doc_id" + 50000000L).as("doc_id"),
          concat($"text", lit(" twinprobeA")).as("text"))
        .unionAll(twinBase
          .select(($"doc_id" + 60000000L).as("doc_id"),
            concat($"text", lit(" twinprobeB")).as("text")))
      val batch = base.filter($"doc_id" % 10 === 0)
        .unionAll(exactProbes).unionAll(nearProbes).unionAll(twinProbes)
      // stage 1: exact dedup vs corpus — fingerprints only
      val corpusFps = corpus
        .select(F.fnv1a($"text").as("fp1"),
          F.fnv1a_seeded(Lane2Seed, $"text").as("fp2")).distinct()
      // every stage output is MATERIALIZED once (localCheckpoint):
      // each later stage, the closure, and the funnel rows all read
      // it — without the cut, s2's banded-probe lineage would re-run
      // per consumer (measured: minutes instead of seconds)
      val s1 = batch
        .withColumn("fp1", F.fnv1a($"text"))
        .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, $"text"))
        .join(corpusFps, Seq("fp1", "fp2"), "left_anti")
        .select($"doc_id", $"text")
        .localCheckpoint()
      // stage 2: near-dedup vs corpus — the banded incremental probe
      // (batch bands semi-join the corpus band index; sign-flipped
      // ids make cross pairs the a<0≤b rows), exact Jaccard verify
      val batchBands = minhashBandsOf(s1, MinHashJaccardTau)
        .select((-$"doc_id" - 1L).as("doc_id"), $"band_no", $"band_hash")
      val corpusBands = minhashBandsOf(corpus, MinHashJaccardTau)
        .join(batchBands.select($"band_no", $"band_hash"),
          Seq("band_no", "band_hash"), "left_semi")
      val cand = graft.operators.CandidatePairs.fromBuckets(
          batchBands.unionByName(corpusBands),
          Seq("band_no", "band_hash"), "doc_id", "doc_a", "doc_b")
        .filter($"doc_a" < 0 && $"doc_b" >= 0)
        .select((-$"doc_a" - 1L).as("batch_doc"), $"doc_b".as("corpus_doc"))
      val nearHits = cand
        .join(s1.select($"doc_id".as("batch_doc"), $"text".as("ta")),
          "batch_doc")
        .join(corpus.select($"doc_id".as("corpus_doc"), $"text".as("tb")),
          "corpus_doc")
        .select($"batch_doc",
          q6(size(array_intersect(shingles($"ta"), shingles($"tb")))
            .cast("double") /
            size(array_union(shingles($"ta"), shingles($"tb"))))
            .as("j"))
        .filter($"j" >= MinHashJaccardTau)
        .select($"batch_doc".as("doc_id")).distinct()
      val s2 = s1.join(nearHits, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      // stage 3: within-batch closure folded into the corpus labeling
      // (merge touches only the batch's components — here the
      // disjoint fast path, since batch–corpus near-dups are gone)
      val bbPairs = minhashNearDupPairs(s2, MinHashJaccardTau)
      val labels = graft.operators.ConnectedComponents.merge(
        nearDupComponentsOf(s, corpus, d), "node", "component",
        bbPairs, "doc_a", "doc_b")
      val admitted = s2.join(
        labels.filter($"node" =!= $"component")
          .select($"node".as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint()
      def stageRow(no: Long, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(no).as("stage_no"), lit(name).as("stage"), $"n_docs")
      stageRow(1L, "arrived", batch)
        .unionAll(stageRow(2L, "after_exact", s1))
        .unionAll(stageRow(3L, "after_corpus_neardup", s2))
        .unionAll(stageRow(4L, "admitted", admitted))
        .unionAll(stageRow(5L, "corpus_after", corpus.unionAll(
          admitted.select($"doc_id", lit("").as("text")))))
        .orderBy($"stage_no")
    }

  /** Corpus-side closure labeling for L96 (corpus docs only — NOT the
    * standard full-fixture labeling). */
  private def nearDupComponentsOf(s: SparkSession, corpus: DataFrame,
      dir: String): DataFrame =
    graft.operators.ConnectedComponents.components(
      minhashNearDupPairs(corpus, MinHashJaccardTau), "doc_a", "doc_b")

  /** The merged (yesterday ∪ today) near-dup labeling behind
    * `incremental_clusters`: ONE LSH pass over the fixture corpus
    * produces the pair set (checkpointed once, so the corpus/batch
    * filters below never re-run it); corpus-internal pairs replay
    * yesterday's labeling via the ordinary closure, and batch-touching
    * pairs fold in through [[graft.operators.ConnectedComponents.merge]]
    * — work ∝ touched components + batch, never the historical
    * closure. Cached per dir (the bm25_indexed pattern): the labeling
    * is the persisted artifact a daily pipeline carries forward. */
  private val incrClustersCache = new SessionCache[DataFrame]

  /** Constructed-frame caches for the TVF twins whose construction
    * runs driver-side jobs (CC loop / strata walk) — the
    * incrClustersCache rationale. */
  private val neardupSqlCache = new SessionCache[DataFrame]
  private val budgetSqlCache = new SessionCache[DataFrame]

  private[graft] def incrementalClusterLabels(
      s: SparkSession, dir: String): DataFrame =
    incrClustersCache.get(s, dir) { d =>
      import s.implicits._
      val pairs = minhashNearDupPairs(
        Tables.documents(s, d).select($"doc_id", $"text"),
        MinHashJaccardTau).localCheckpoint()
      val isBatch = (c: org.apache.spark.sql.Column) => c % 10 === 0
      val oldPairs = pairs.filter(!isBatch($"doc_a") && !isBatch($"doc_b"))
      val newPairs = pairs.filter(isBatch($"doc_a") || isBatch($"doc_b"))
      val yesterday = graft.operators.ConnectedComponents
        .components(oldPairs, "doc_a", "doc_b")
      graft.operators.ConnectedComponents
        .merge(yesterday, "node", "component", newPairs, "doc_a", "doc_b")
    }

  /** Intermediates of the composed `full_curation` chain, exposed so
    * the spec can assert each stage's effect on the engineered probes
    * without re-deriving the pipeline. */
  private[graft] case class CurationStages(
      afterExact: DataFrame, dupes: DataFrame, contaminated: DataFrame,
      survivors: DataFrame, gated: DataFrame, selected: DataFrame,
      packed: DataFrame)

  /** The product's headline pass, corpus → dataloader, as ONE query:
    * exact dedup → deterministic split → within-train near-dup cluster
    * dedup → decontamination against the held-out eval splits → line
    * boilerplate removal → PII redaction → quality gate → greedy
    * token-budget selection → chunk → pack. Every stage is
    * oracle-proven standalone (exact_dedup, hash_split,
    * neardup_dedup, decontaminate, line_dedup, pii_redact,
    * doc_quality, token_budget_select, doc_chunks, pack_sequences);
    * this composition is the thing a curation user actually runs.
    *
    * Composition contracts, made explicit because order matters:
    *  - ONE LSH pass over the post-exact-dedup corpus feeds BOTH
    *    near-dup stages: train–train pairs close into clusters (the
    *    dedup), train–eval pairs mark contamination. Eval docs are
    *    held out and never curated — the near-dup closure runs on
    *    within-train edges only (a train–eval–train path must NOT
    *    merge two train docs that are not near-dups of each other).
    *  - budget selection runs at the DOCUMENT level, between the gate
    *    and chunking — quality lives on docs, and selecting before
    *    chunking means the dropped 3/5 of tokens are never chunked or
    *    packed at all (the work-saving order at 100 TB).
    *
    * Scale shape: the union of the stages' individual profiles — no
    * stage adds an exchange beyond its standalone plan; the only
    * O(corpus²)-risk step (candidate pairs) stays the LSH band
    * shuffle, and eval/train labeling is a projection (md5 of the id),
    * not a join against a split table. */
  /** Construction is expensive (the LSH checkpoint + the CC loop run
    * jobs) and TWO queries consume the stages (`full_curation`,
    * `curation_funnel`) — cache per dir so a Verify/Bench JVM builds
    * the chain once. The frames themselves stay lazy. */
  private val curationStagesCache = new SessionCache[CurationStages]

  private[graft] def fullCurationStages(
      s: SparkSession, dir: String): CurationStages =
    curationStagesCache.get(s, dir)(d => buildCurationStages(s, d))

  private def buildCurationStages(
      s: SparkSession, dir: String): CurationStages = {
    import s.implicits._
    import graft.operators.{BudgetSelect, Chunking, ConnectedComponents,
      Packing, Sampling, TextCleanup}
    val src = Tables.documents(s, dir).select($"doc_id", $"text")
      .unionAll(fullCurationProbes.toDF("doc_id", "text"))
    val w = Window.partitionBy($"fp1", $"fp2").orderBy($"doc_id")
    val exact = src
      .withColumn("fp1", F.fnv1a($"text"))
      .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, $"text"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"doc_id", $"text")
    val labeled = exact.withColumn("split",
      Sampling.splitLabel($"doc_id", 0.8, 0.1))
    // the LSH pass is the chain's only heavy candidate generator and
    // BOTH near-dup stages consume it — materialize its (small,
    // id-pair) output once so the closure and the contamination
    // filter never re-run the banding
    val pairs = minhashNearDupPairs(
      labeled.select($"doc_id", $"text"), MinHashJaccardTau)
      .localCheckpoint()
    val lab = labeled.select($"doc_id", $"split")
    val pl = pairs
      .join(lab.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(lab.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
    val dupes = ConnectedComponents.components(
        pl.filter($"sa" === "train" && $"sb" === "train")
          .select($"doc_a", $"doc_b"), "doc_a", "doc_b")
      .filter($"node" =!= $"component")
      .select($"node".as("doc_id"))
    val contaminated = pl
      .filter(($"sa" === "train") =!= ($"sb" === "train"))
      .select(when($"sa" === "train", $"doc_a").otherwise($"doc_b")
        .as("doc_id"))
      .distinct()
    val survivors = labeled.filter($"split" === "train")
      .select($"doc_id", $"text")
      .join(dupes, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val redacted = TextCleanup.dropBoilerplateLines(survivors, minDocs = 2)
      .select($"doc_id",
        TextCleanup.redactPii(
          regexp_replace($"clean_text", "\n", " ")).as("text"))
    // The curated-gated corpus is the chain's natural snapshot
    // boundary: BudgetSelect reads it three times (strata, boundary,
    // final filter) and the chunker reads the winners' text — without
    // materialization every pass would re-run dedup + closure +
    // decontamination + line dedup from the scan. At 100 TB this is
    // the point a production pipeline writes the curated corpus to
    // storage (swap the localCheckpoint for a parquet write under the
    // caller's lifecycle); the plan shape is identical.
    val gated = redacted
      .withColumn("quality", qualityOf($"text"))
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .filter($"quality" >= 0.625)
      .localCheckpoint()
    val selected = BudgetSelect.selectFraction(
      gated, "doc_id", "quality", "n_tokens", 2, 5)
    val chunks = Chunking.chunkDocs(selected.select($"doc_id", $"text"),
      maxTokens = 16, overlap = 4, minTokens = 5)
    val packed = Packing.packChunks(
      chunks.select($"doc_id", $"chunk_id", $"n_tokens"),
      budget = 64, nBuckets = 8)
    CurationStages(exact, dupes, contaminated, survivors, gated, selected,
      packed)
  }

  val queries: Map[String, Q] = Map(
    // L1: exact dedup by content fingerprint. The fingerprint is the
    // shuffle key — at 100 TB the window partitions by fingerprint
    // (near-uniform), never by the text itself, so no oversized shuffle
    // keys and map-side the text is reduced to 16 bytes. Two independent
    // seeded fnv1a lanes give a 128-bit fingerprint: the 64-bit birthday
    // bound (~40% collision odds at ~4B docs) would silently drop a
    // distinct doc at 100 TB; at 128 bits the same bound is ~1e-20.
    // Deterministic winner: smallest doc_id.
    "exact_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"fp1", $"fp2").orderBy($"doc_id")
      Tables.documents(s, dir)
        .withColumn("fp1", F.fnv1a($"text"))
        .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, $"text"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // L65: sub-document segment dedup with reassembly — the
    // paragraph-dedup recipe (dedup below doc granularity, keep the
    // first occurrence corpus-wide, reassemble what survives) for a
    // corpus whose docs are single-line word streams: segments are
    // positional 25-word windows, so both engines split identically.
    // Scale shape: the corpus-wide winner election shuffles a 128-bit
    // two-lane fingerprint (16 bytes, near-uniform), never segment
    // text; reassembly shuffles surviving (doc_id, seg_idx, text)
    // once, keyed by doc_id, and orders via array_sort of collected
    // structs (collect_list arrival order is never relied upon).
    "segment_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val SegW = 25
      val docs = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("ws"))
        .withColumn("total_segs",
          ((size($"ws") + lit(SegW - 1)) / lit(SegW)).cast("long"))
      val segs = docs.select($"doc_id",
        posexplode(transform(
          sequence(lit(0), ($"total_segs" - 1).cast("int")),
          i => array_join(
            slice($"ws", i * lit(SegW) + lit(1), lit(SegW)), " "))))
        .withColumnRenamed("pos", "seg_idx")
        .withColumnRenamed("col", "seg_text")
      val w = Window.partitionBy($"fp1", $"fp2")
        .orderBy($"doc_id", $"seg_idx")
      val kept = segs
        .withColumn("fp1", F.fnv1a($"seg_text"))
        .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, $"seg_text"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
      val reassembled = kept.groupBy($"doc_id")
        .agg(count(lit(1)).as("kept_segs"),
          length(array_join(transform(
            array_sort(collect_list(struct($"seg_idx", $"seg_text"))),
            t => t.getField("seg_text")), " ")).cast("long").as("new_len"))
      docs.select($"doc_id", $"total_segs")
        .join(reassembled, Seq("doc_id"), "left_outer")
        .select($"doc_id", $"total_segs",
          coalesce($"kept_segs", lit(0L)).as("kept_segs"),
          coalesce($"new_len", lit(0L)).as("new_len"))
        .orderBy($"doc_id")
    }),

    // L66: balanced shard assignment (snake draft) — split a scored
    // corpus into N equal-work output shards (data-parallel training
    // readers want shards balanced by TOKENS, not docs). Deterministic
    // and one-pass: global token-descending rank, then shard =
    // snake(rank) — block b takes ranks in forward order when b is
    // even, reversed when odd, so each consecutive block of N heavy
    // docs spreads across all N shards and no shard accumulates a
    // head-of-distribution bias. The global rank comes from the
    // two-phase PrefixSum offset pattern (range-partition + tiny
    // per-partition offset relation), NOT a single-task global
    // window — the 100 TB shape.
    "shard_assign" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val NShards = 8
      val scored = Tables.documents(s, dir)
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_tokens"))
      val ordKey = struct((-$"n_tokens").as("neg_tokens"),
        $"doc_id".as("tie"))
      graft.operators.PrefixSum
        .withRunningSum(scored, Seq.empty, ordKey, lit(1L), "rn")
        .withColumn("block", expr(s"(rn - 1) div $NShards"))
        .withColumn("pos", (($"rn" - 1) % NShards).cast("long"))
        .withColumn("shard",
          when($"block" % 2 === 0, $"pos")
            .otherwise(lit(NShards - 1) - $"pos"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("tok_sum"),
          max($"n_tokens").as("max_tokens"),
          min($"n_tokens").as("min_tokens"))
        .orderBy($"shard")
    }),

    // L2: MinHash + LSH near-dedup over the documents fixture — the
    // reusable operator is [[minhashNearDupPairs]]; the oracle computes
    // all-pairs Jaccard with identical tokenization — feasible only at
    // test scale, which is the point of LSH.
    "minhash_neardup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      nearDupPairsCached(s, dir).orderBy($"doc_a", $"doc_b")
    }),

    // L49: cross-source near-dup overlap matrix — the corpus audit
    // behind mixture decisions ("how much of source A is near-copied
    // in source B?"). Rides the SAME LSH pass as minhash_neardup
    // (the pair set is the only heavy stage; the matrix is two
    // broadcast-able id joins + one tiny agg keyed by a bounded
    // source×source domain). The jaccard mass column sums the
    // q6-quantized scores as exact integer micro-units, so the matrix
    // is engine-exact.
    "source_overlap" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = nearDupPairsCached(s, dir)
      val src = Tables.documents(s, dir).select($"doc_id", $"source")
      pairs
        .join(src.select($"doc_id".as("doc_a"), $"source".as("src_a")),
          "doc_a")
        .join(src.select($"doc_id".as("doc_b"), $"source".as("src_b")),
          "doc_b")
        .select(least($"src_a", $"src_b").as("source_1"),
          greatest($"src_a", $"src_b").as("source_2"), $"jaccard")
        .groupBy($"source_1", $"source_2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(floor($"jaccard" * lit(1000000.0) + lit(0.5)))
            .cast("long").as("jacc_micro_sum"))
        .orderBy($"source_1", $"source_2")
    }),

    // L70: split-leakage REPAIR — decontaminate (L23) lists the
    // cross-split near-dup pairs; this emits the fix: every near-dup
    // cluster is moved WHOLLY into its canonical member's split (the
    // component id — min doc_id — anchors the cluster, so the repair
    // is deterministic and idempotent). Output = the migration
    // matrix (from_split, to_split, moved-doc counts) a pipeline
    // operator would apply before export. Rides the same closure as
    // neardup_clusters; the only additions are two broadcast-able
    // id-equi joins against the split labeling.
    "split_repair" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val comp = nearDupComponents(s, dir)
      val splits = Tables.documents(s, dir).select($"doc_id",
        graft.operators.Sampling.splitLabel($"doc_id", 0.8, 0.1)
          .as("split"))
      comp
        .join(splits.withColumnRenamed("doc_id", "node"), "node")
        .join(splits.select($"doc_id".as("component"),
          $"split".as("to_split")), "component")
        .filter($"split" =!= $"to_split")
        .groupBy($"split".as("from_split"), $"to_split")
        .agg(count(lit(1)).as("n_moved"),
          min($"node").as("min_doc"), max($"node").as("max_doc"))
        .orderBy($"from_split", $"to_split")
    }),

    // L2 closure: near-dup PAIRS -> duplicate CLUSTERS. Pairs alone
    // under-delete (A~B, B~C, A!~C leaves B and C both kept whichever
    // pair member you drop); the transitive closure is what the dedup
    // pass needs. ConnectedComponents is the O(log n)-round
    // hash-min + pointer-jumping operator; the oracle recomputes the
    // closure with a recursive CTE over the same exact-Jaccard pairs.
    "neardup_clusters" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val comp = nearDupComponents(s, dir)
      val sizes = comp.groupBy($"component")
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select($"node".as("doc_id"), $"component".as("cluster_id"),
          $"cluster_size")
        .orderBy($"cluster_id", $"doc_id")
    }),

    // L2 incremental closure: fold TODAY'S batch pairs into
    // YESTERDAY'S corpus labeling without recomputing the historical
    // closure — ConnectedComponents.merge re-labels only the touched
    // components (work ∝ touched + batch), closing the one
    // work-∝-corpus stage left in the continuous-ingestion dedup
    // story (incremental_neardup already generates pairs at work ∝
    // batch). Yesterday = corpus docs (doc_id % 10 != 0), today = the
    // rest; the oracle recomputes the FULL recursive-CTE closure over
    // every document — any divergence between the incremental merge
    // and a from-scratch recompute fails the hash.
    "incremental_clusters" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val merged = incrementalClusterLabels(s, dir)
      val sizes = merged.groupBy($"component")
        .agg(count(lit(1)).as("cluster_size"))
      merged.join(sizes, "component")
        .select($"node".as("doc_id"), $"component".as("cluster_id"),
          $"cluster_size")
        .orderBy($"cluster_id", $"doc_id")
    }),

    // L23: benchmark decontamination — the leakage check before
    // training: train-split docs that near-duplicate an eval-split
    // (valid/test) doc. Pure composition of two proven pieces: the
    // L2 LSH near-dup pass supplies the pairs (the only heavy stage,
    // same 100 TB shape), the deterministic hash split supplies the
    // labels (a projection), and the cross-split filter is two
    // broadcast-able equi-joins on doc ids.
    "decontaminate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = nearDupPairsCached(s, dir)
      val lab = Tables.documents(s, dir).select($"doc_id",
        graft.operators.Sampling.splitLabel($"doc_id", 0.8, 0.1).as("split"))
      pairs
        .join(lab.select($"doc_id".as("doc_a"), $"split".as("split_a")), "doc_a")
        .join(lab.select($"doc_id".as("doc_b"), $"split".as("split_b")), "doc_b")
        .filter(($"split_a" === "train" && $"split_b" =!= "train") ||
          ($"split_b" === "train" && $"split_a" =!= "train"))
        .select(
          when($"split_a" === "train", $"doc_a").otherwise($"doc_b")
            .as("train_doc"),
          when($"split_a" === "train", $"doc_b").otherwise($"doc_a")
            .as("eval_doc"),
          when($"split_a" === "train", $"split_b").otherwise($"split_a")
            .as("eval_split"),
          $"jaccard")
        .orderBy($"train_doc", $"eval_doc")
    }),

    // L23b: EXACT-text decontamination at broadcast-bitset cost — the
    // bloom-filter companion to the LSH pass, for the verbatim "drop
    // anything whose text appears in the eval set" rule. The eval keys
    // fold into a Bloom bitset (one narrow pass over the SMALL side,
    // `operators.BloomSet`); the corpus side is then a pure codegen'd
    // FILTER — no join, no shuffle, the 100 TB shape — and only the
    // tiny bloom-surviving candidate set enters the exact confirm
    // semi-join (bloom errors are one-sided: the confirm join removes
    // the overshoot, so the result is EXACT and oracle-checkable).
    // Planted probes: copies of odd eval docs under negated ids make
    // contaminated NON-eval rows exist, so the confirm join does more
    // than re-find the eval set itself.
    "bloom_decontaminate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.documents(s, dir)
        .select($"doc_id", $"text", $"lang", $"source")
      val probes = base.filter($"doc_id" % 13 === 0 && $"doc_id" % 2 === 1)
        .select((-$"doc_id").as("doc_id"), $"text", $"lang", $"source")
      val docs = base.unionByName(probes)
      val evalTexts = base.filter($"doc_id" % 13 === 0).select($"text")
      val bloom = graft.operators.BloomSet.build(
        evalTexts, $"text", numBits = 1L << 14, k = 5)
      val candidates = docs
        .filter(coalesce(
          graft.operators.BloomSet.mightContain($"text", bloom), lit(false)))
        .join(broadcast(evalTexts.distinct()), Seq("text"), "left_semi")
        .select($"doc_id")
      docs.join(broadcast(candidates), Seq("doc_id"), "left_anti")
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("sum_ids"))
        .orderBy($"lang", $"source")
    }),

    // L24: cross-document repeated spans — the exact-substring member
    // of the dedup family (memorization audit): every 8-token span
    // that appears in >= 2 distinct docs, with occurrence counts.
    // Hot-gram note: unlike the winnow/simhash searches this query
    // generates NO doc pairs — a boilerplate span shared by m docs
    // costs O(m) aggregation rows (partial-combined per partition),
    // never O(m²), so it needs no CandidatePairs guard; the only
    // per-key reduce is one count/min row per span fingerprint.
    // Span STRINGS never shuffle: all counting happens on the 128-bit
    // two-lane span fingerprint (same birthday-bound contract as
    // exact_dedup — a collision at 100 TB gram counts is ~1e-11), and
    // the text is rebuilt ONCE per repeated span from its minimal
    // (doc_id, pos) representative. When repeats are rare (a corpus
    // after line_dedup), the representative set is small and AQE
    // broadcasts it, so the token arrays never shuffle either; in the
    // degenerate everything-repeats corpus the join degrades to one
    // corpus shuffle — never worse than the direct group-by. The span
    // string inside the first pass lives only within its stage
    // (separate projection, so CollapseProject computes it once for
    // both fingerprint lanes).
    "dup_spans" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val W = 8
      val toks = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("ws"))
        .filter(size($"ws") >= W)
      val grams = toks.select($"doc_id",
        explode(transform(sequence(lit(1), size($"ws") - (W - 1)), i =>
          struct(i.cast("int").as("pos"),
            concat_ws(" ", slice($"ws", i, lit(W))).as("sp")))).as("g"))
        .select($"doc_id", $"g.pos".as("pos"), $"g.sp".as("sp"))
        .select($"doc_id", $"pos", F.fnv1a($"sp").as("fp1"),
          F.fnv1a_seeded(Lane2Seed, $"sp").as("fp2"))
      val hot = grams
        .groupBy($"fp1", $"fp2")
        .agg(count_distinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(struct($"doc_id", $"pos")).as("rep"))
        .filter($"n_docs" >= 2)
        .select($"n_docs", $"n_occurrences",
          $"rep.doc_id".as("rep_doc"), $"rep.pos".as("rep_pos"))
      hot.join(toks, hot("rep_doc") === toks("doc_id"))
        .select(
          concat_ws(" ", slice($"ws", $"rep_pos", lit(W))).as("span_text"),
          $"n_docs", $"n_occurrences",
          // min(doc_id) == the minimal representative's doc
          $"rep_doc".as("first_doc"))
        .orderBy($"span_text")
    }),

    // L91: maximal repeated-span RUNS — the memorization-audit
    // contract (exact-substring dedup à la Lee et al.): L24 reports
    // fixed 8-token shared windows, but overlapping windows of one
    // long verbatim-shared passage are ONE finding, not n. Coalesce
    // them per (doc_a, doc_b): shared windows meet on the 16-byte
    // two-lane fingerprint (span text never shuffles — the dup_spans
    // contract), and a maximal run is an ISLAND on the diagonal —
    // constant (pos_a − pos_b) offset, consecutive pos_a — detected
    // with the standard gaps-and-islands window (pos_a − row_number
    // per (pair, offset) partition): ONE partitioned sort, no
    // position self-join. The df cap (spans in ≤ 16 docs) bounds the
    // pair fan-out under hot boilerplate spans (the CandidatePairs
    // rationale); a dropped span sits in ≥ 17 docs — boilerplate for
    // L14, not pairwise memorization evidence.
    "dup_span_runs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val W = 8
      val toks = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("ws"))
        .filter(size($"ws") >= W)
      val grams = toks.select($"doc_id",
        explode(transform(sequence(lit(1), size($"ws") - (W - 1)), i =>
          struct(i.cast("long").as("pos"),
            concat_ws(" ", slice($"ws", i, lit(W))).as("sp")))).as("g"))
        .select($"doc_id", $"g.pos".as("pos"), F.fnv1a($"g.sp").as("fp1"),
          F.fnv1a_seeded(Lane2Seed, $"g.sp").as("fp2"))
      val eligible = grams.groupBy($"fp1", $"fp2")
        .agg(count_distinct($"doc_id").as("n_docs"))
        .filter($"n_docs" >= 2 && $"n_docs" <= SpanDfCap)
        .select($"fp1", $"fp2")
      val e = grams.join(eligible, Seq("fp1", "fp2"), "left_semi")
      val shared = e
        .select($"fp1", $"fp2", $"doc_id".as("doc_a"), $"pos".as("pos_a"))
        .join(e.select($"fp1", $"fp2", $"doc_id".as("doc_b"),
          $"pos".as("pos_b")), Seq("fp1", "fp2"))
        .filter($"doc_a" < $"doc_b")
        .withColumn("diag", $"pos_a" - $"pos_b")
      shared
        .withColumn("island", $"pos_a" - row_number().over(
          Window.partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pos_a")))
        .groupBy($"doc_a", $"doc_b", $"diag", $"island")
        .agg(min($"pos_a").as("start_a"), min($"pos_b").as("start_b"),
          count(lit(1)).as("n_windows"))
        .select($"doc_a", $"doc_b", $"start_a", $"start_b", $"n_windows",
          ($"n_windows" + (W - 1)).as("run_tokens"))
        .orderBy($"doc_a", $"doc_b", $"start_a", $"start_b")
    }),

    // L73: benchmark-contamination RATE — decontaminate (L23) and
    // dup_spans (L24) find WHICH docs/spans collide; the number a
    // model card reports is the per-eval-doc fraction of 8-gram spans
    // also present anywhere in train (the WMT/eval-overlap metric).
    // Gram identity travels as the 128-bit two-lane FNV fingerprint
    // (16 bytes on the shuffle, never span strings — the dup_spans
    // contract); the train side ships its DISTINCT fp set only.
    "eval_overlap_rate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val W = 8
      val labeled = Tables.documents(s, dir)
        .withColumn("split",
          graft.operators.Sampling.splitLabel($"doc_id", 0.8, 0.1))
        .select($"doc_id", $"split", split($"text", " ").as("ws"))
        .filter(size($"ws") >= W)
      // materialized ONCE: both arms (train fp set + eval grams) read
      // this relation — without the checkpoint the tokenize + explode
      // + double-FNV pass runs twice (the Graph.pairCounts pattern)
      val g = labeled.select($"doc_id", $"split",
          explode(transform(sequence(lit(1), size($"ws") - (W - 1)), i =>
            concat_ws(" ", slice($"ws", i, lit(W))))).as("sp"))
        .select($"doc_id", $"split", F.fnv1a($"sp").as("fp1"),
          F.fnv1a_seeded(Lane2Seed, $"sp").as("fp2"))
        .localCheckpoint()
      val trainFps = g.filter($"split" === "train")
        .select($"fp1", $"fp2").distinct()
      g.filter($"split" =!= "train")
        .join(trainFps.withColumn("hit", lit(1L)), Seq("fp1", "fp2"),
          "left_outer")
        .groupBy($"doc_id", $"split")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce($"hit", lit(0L))).as("n_contaminated"))
        .withColumn("contamination_q6",
          q6($"n_contaminated".cast("double") / $"n_grams"))
        .orderBy($"doc_id")
    }),

    // L2 end-to-end: the corpus after near-dup removal — every cluster
    // keeps exactly its canonical (smallest-id) member; singletons pass
    // through untouched. The anti-join is an equi-shuffle on doc_id;
    // the dupe side is tiny relative to the corpus by construction.
    "neardup_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val dupes = nearDupComponents(s, dir)
        .filter($"node" =!= $"component")
        .select($"node".as("doc_id"))
      Tables.documents(s, dir)
        .join(dupes, Seq("doc_id"), "left_anti")
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // U5 curation twins: the three headline curation ops driven
    // purely through SQL text (graft_neardup_dedup / graft_pack /
    // graft_budget_select — operators.SqlTableFunctions). Each twin
    // shares its library row's oracle VERBATIM, holding the SQL path
    // to byte-identical results; SqlTableFunctionsSpec additionally
    // pins DataFrame-level parity, so nothing is re-implemented on
    // the text path.
    "neardup_dedup_sql" -> ((s: SparkSession, dir: String) =>
      // TVF construction runs the CC driver loop (real jobs at SQL
      // parse time); cache the constructed frame per dir so repeated
      // calls (Bench passes) re-execute the plan, not the build
      neardupSqlCache.get(s, dir) { _ =>
        graft.operators.SqlTableFunctions.registerAll(s)
        Tables.documents(s, dir).createOrReplaceTempView("tvfq_documents")
        s.sql("""SELECT doc_id, lang, source, n_chars
                |FROM graft_neardup_dedup('tvfq_documents', '0.5')
                |ORDER BY doc_id""".stripMargin)
      }),

    "pack_sql" -> ((s: SparkSession, dir: String) => {
      graft.operators.SqlTableFunctions.registerAll(s)
      import s.implicits._
      Tables.documents(s, dir).select($"doc_id", $"text")
        .createOrReplaceTempView("tvfq_docs")
      s.sql("CREATE OR REPLACE TEMPORARY VIEW tvfq_chunks AS " +
        "SELECT * FROM graft_chunk('tvfq_docs', '16', '4')")
      s.sql("SELECT * FROM graft_pack('tvfq_chunks', '64', '8') " +
        "ORDER BY bucket, seq_id")
    }),

    "budget_select_sql" -> ((s: SparkSession, dir: String) =>
      // same reason as neardup_dedup_sql: BudgetSelect's bounded
      // strata walk runs at construction
      budgetSqlCache.get(s, dir) { _ =>
        graft.operators.SqlTableFunctions.registerAll(s)
        import s.implicits._
        Tables.documents(s, dir).select($"doc_id",
            qualityOf($"text").as("quality"),
            size(split($"text", " ")).cast("long").as("n_tokens"))
          .createOrReplaceTempView("tvfq_scored")
        s.sql("SELECT * FROM graft_budget_select(" +
          "'tvfq_scored', 'doc_id', 'quality', 'n_tokens', '2', '5') " +
          "ORDER BY doc_id")
      }),

    // L26: symmetric int8 embedding quantization — the 4x shuffle/
    // storage lever vector search wants before ANN at 100 TB. Per
    // vector: scale = max|x|/127, q_i = floor(x_i*127/mx + 0.5)
    // (half-up, identical floor spelling in both engines — never
    // engine-default round(), whose tie mode differs), plus the exact
    // reconstruction-error bound |x - q*scale| as an audit column.
    // Pure per-row projection, no shuffle; mx is its own projection
    // so CollapseProject computes it once for the 64-lane transform.
    "embed_quantize" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val withMx = emb.select($"vec_id", $"v",
        aggregate(transform($"v", x => abs(x)), lit(0.0),
          (a, x) => greatest(a, x)).as("mx"))
      val quant = withMx.select($"vec_id", $"v", $"mx",
        when($"mx" === 0.0, transform($"v", _ => lit(0)))
          .otherwise(transform($"v",
            x => floor(x * 127.0 / $"mx" + 0.5).cast("int"))).as("q"))
      // the int8 lanes ride as CSV — the driver's row hash needs
      // scalar columns (no query outputs raw arrays)
      quant.select($"vec_id",
        q6($"mx" / 127.0).as("scale"),
        array_join(transform($"q", qi => qi.cast("string")), ",").as("q_csv"),
        q6(aggregate(
          zip_with($"v", $"q",
            (x, qi) => abs(x - qi.cast("double") * $"mx" / 127.0)),
          lit(0.0), (a, x) => greatest(a, x))).as("max_err"))
        .orderBy($"vec_id")
    }),

    // L25: incremental ingestion dedup — the pattern a continuously-
    // fed corpus needs: dedup a NEW batch against the EXISTING corpus
    // without touching existing rows. Only 16-byte fingerprints of
    // the (large) existing side move; the batch resolves its internal
    // winners with the exact_dedup window, then anti-joins the corpus
    // fingerprint set — at 100 TB that set IS the pipeline's persisted
    // ingestion state. The modulo split is the deterministic stand-in
    // for "yesterday's corpus vs today's crawl"; probes carry the
    // duplicate mechanism (the fixture has no exact dups).
    "incremental_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .unionAll(ingestProbes.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .withColumn("fp1", F.fnv1a($"text"))
        .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, $"text"))
      val existing = docs.filter($"doc_id" % 4 =!= 3)
      val batch = docs.filter($"doc_id" % 4 === 3)
      val w = Window.partitionBy($"fp1", $"fp2").orderBy($"doc_id")
      batch.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .join(existing.select($"fp1", $"fp2"), Seq("fp1", "fp2"), "left_anti")
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // L1+L5 composed: the end-to-end curation pass a training-data
    // pipeline runs — exact dedup (128-bit fingerprint winner), then
    // quality gating (length + type-token ratio), then per-language
    // corpus accounting. One query = the composition proof; each stage
    // is also oracle-proven standalone (exact_dedup, text_stats,
    // lang_profile).
    "corpus_curation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"fp1", $"fp2").orderBy($"doc_id")
      val deduped = Tables.documents(s, dir)
        .withColumn("fp1", F.fnv1a($"text"))
        .withColumn("fp2", F.fnv1a_seeded(Lane2Seed, $"text"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
      val scored = deduped.select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens"),
        (size(array_distinct(split($"text", " "))).cast("double") /
          size(split($"text", " "))).as("ttr"))
      scored.filter($"n_tokens" >= 30 && $"ttr" >= 0.3)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          min($"doc_id").as("first_doc"))
        .orderBy($"lang")
    }),

    // U4 + L5: corpus shingle-vocabulary statistics through the
    // custom GENERATOR (ShingleHashes streams positional 3-gram
    // hashes row-by-row — no gram arrays). Output is the
    // frequency-of-frequencies histogram, which is hash-independent
    // (a gram's count equals its string's count, collisions aside at
    // ~2⁻⁶⁴), so the DuckDB oracle replicates it from the 3-gram
    // STRINGS with identical tokenization.
    "shingle_vocab" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(F.shingle_hashes($"text").as(Seq("gram_no", "gram_hash")))
        .groupBy($"gram_hash").agg(count(lit(1)).as("cnt"))
        .groupBy($"cnt").agg(count(lit(1)).as("n_grams"))
        .select($"cnt".as("gram_count"), $"n_grams")
        .orderBy($"gram_count")
    }),

    // L2 (measure, standalone): exact word-3-gram Jaccard similarity
    // as a first-class pairwise operator over an explicit candidate
    // relation — here the adjacent-doc_id chain, so the join stays a
    // hash equi-join (candidates O(n), never all-pairs; plug any
    // candidate generator — LSH buckets upstream produce the same
    // shape).
    "ngram_jaccard" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // Set operations run on 8-byte shingle HASHES, not shingle
      // strings (same identity argument as shingle_vocab: a gram's
      // hash equals another's iff the strings match, collisions aside
      // at ~2⁻⁶⁴ — and the string-level DuckDB oracle verifies exactly
      // that). String-array intersect/union was the measured bench
      // outlier once count-pruning stopped hiding it: 9.6 s vs
      // sub-second hashed.
      val d = withShingleHashes(Tables.documents(s, dir)
        .select($"doc_id", $"text").repartition($"doc_id"), Seq("doc_id"))
      val a = d.select($"doc_id".as("doc_a"), $"hs".as("hs_a"))
      val b = d.select(($"doc_id" - 1).as("doc_a"), $"doc_id".as("doc_b"),
        $"hs".as("hs_b"))
      a.join(b, "doc_a")
        .select($"doc_a", $"doc_b",
          q6(size(array_intersect($"hs_a", $"hs_b")).cast("double") /
            size(array_union($"hs_a", $"hs_b"))).as("jaccard"))
        .orderBy($"doc_a")
    }),

    // L74: EXACT near-dup pair join — prefix filtering (SSJoin/PPJoin
    // family) over the word-3-gram shingle sets: every pair with
    // Jaccard ≥ 1/2 with its exact similarity, no LSH misses, no
    // false positives. The deterministic complement to
    // minhash_neardup: banding can miss a qualifying pair
    // (probabilistic recall); here the prefix-filter theorem
    // guarantees complete candidates and an integer test
    // (3·|∩| ≥ na+nb ⟺ J ≥ 1/2) makes the cut engine-exact. Shingle
    // identity travels as the 8-byte hash (collision argument as
    // shingle_vocab); the DuckDB oracle is the brute all-pairs join
    // over shingle STRINGS, so it independently verifies both recall
    // and precision of the whole candidate pipeline.
    "exact_jaccard_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = withShingleHashes(Tables.documents(s, dir)
        .select($"doc_id", $"text"), Seq("doc_id"))
      graft.operators.SetSimJoin.selfJoin(d, "doc_id", "hs", 1, 2)
        .select($"a".as("doc_a"), $"b".as("doc_b"),
          $"n_a", $"n_b", $"n_inter", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    }),

    // L93: near-dup threshold-sensitivity curve — the audit a
    // curation owner reads before FIXING τ: how many pairs (and how
    // much similarity mass) each candidate threshold would admit.
    // The raw fixture's pair spectrum is degenerate (everything sits
    // at J ≥ 0.9), so planted truncation probes (prefix keeps of
    // 75% / 55% / 35% of a doc's words under offset ids) populate
    // the 0.3–0.8 band the curve must resolve. Pair generation is
    // the EXACT prefix-filtered set-similarity join (L74 — full
    // recall by construction at the rational base cut 3/10; LSH's
    // probabilistic recall near τ would diverge from the brute
    // oracle), and the per-τ totals are one conditional aggregation
    // over the bounded pair relation. The oracle replays the brute
    // all-pairs scan with the IDENTICAL integer base-cut rule and
    // q6 division.
    "neardup_threshold_curve" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.documents(s, dir).select($"doc_id", $"text")
      def probeOf(mod: Int, keepNum: Int, keepDen: Int) =
        base.filter($"doc_id" % 31 === mod)
          .select(($"doc_id" + lit(20000000L) * mod).as("doc_id"),
            concat_ws(" ", slice(split($"text", " "), lit(1),
              greatest(expr(s"(size(split(text, ' ')) * $keepNum) DIV $keepDen"),
                lit(3)).cast("int"))).as("text"))
      val docs = base
        .unionByName(probeOf(1, 3, 4))
        .unionByName(probeOf(2, 11, 20))
        .unionByName(probeOf(3, 7, 20))
      val d = withShingleHashes(docs, Seq("doc_id"))
      val pairs = graft.operators.SetSimJoin.selfJoin(d, "doc_id", "hs", 3, 10)
      val taus = (3 to 9).map(_ / 10.0)
      pairs
        .select(explode(array(taus.map(lit): _*)).as("tau"), $"jaccard")
        .filter($"jaccard" >= $"tau")
        .groupBy($"tau")
        .agg(count(lit(1)).as("n_pairs"),
          sum(floor($"jaccard" * lit(1000000.0) + lit(0.5))).cast("long")
            .as("jacc_micro_sum"))
        .orderBy($"tau")
    }),

    // L94: SAMPLED threshold curve — the 100 TB escape of L93: the
    // exact curve is full-recall set similarity at τ=0.3, whose
    // candidate volume grows sharply with corpus size; a curve is an
    // AUDIT, so at scale it should ride a fixed-size stratified
    // sample with an uncertainty band, not the corpus. Sample = the
    // L35 exact-k recipe (k=60 per lang, keyed-md5 order — retry-
    // stable and oracle-replayable); probes are planted ON the
    // sample (both pair ends present by construction, so every τ
    // stays populated); pair generation is the same exact set-sim
    // join, now over ≤ k·|strata| docs REGARDLESS of corpus size;
    // the band is the L55 Poisson bootstrap over the pair relation
    // (32 deterministic keyed-hash replicates, min/max of the
    // per-replicate weighted counts). The oracle replays sample
    // selection, probes, brute pairs, and the replicate weights from
    // the same integer literals.
    "neardup_threshold_curve_sampled" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"hv", $"doc_id")
      val sampled = Tables.documents(s, dir)
        .select($"doc_id", $"text", $"lang",
          graft.operators.Sampling.keyHash32($"doc_id", CurveSampleSalt)
            .as("hv"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= CurveSampleK)
        .select($"doc_id", $"text")
      def probeOf(mod: Int, keepNum: Int, keepDen: Int) =
        sampled.filter($"doc_id" % 31 === mod)
          .select(($"doc_id" + lit(20000000L) * mod).as("doc_id"),
            concat_ws(" ", slice(split($"text", " "), lit(1),
              greatest(expr(s"(size(split(text, ' ')) * $keepNum) DIV $keepDen"),
                lit(3)).cast("int"))).as("text"))
      val docs = sampled
        .unionByName(probeOf(1, 3, 4))
        .unionByName(probeOf(2, 11, 20))
        .unionByName(probeOf(3, 7, 20))
      val d = withShingleHashes(docs, Seq("doc_id"))
      val pairs = graft.operators.SetSimJoin.selfJoin(d, "doc_id", "hs", 3, 10)
        .select($"a".as("doc_a"), $"b".as("doc_b"), $"jaccard")
      val taus = (3 to 9).map(_ / 10.0)
      val perTau = pairs
        .select(explode(array(taus.map(lit): _*)).as("tau"),
          $"doc_a", $"doc_b", $"jaccard")
        .filter($"jaccard" >= $"tau")
      val point = perTau.groupBy($"tau")
        .agg(count(lit(1)).as("n_pairs"),
          sum(floor($"jaccard" * lit(1000000.0) + lit(0.5))).cast("long")
            .as("jacc_micro_sum"))
      val u = graft.operators.Sampling.keyHash32(
        concat($"doc_a".cast("string"), lit(":"), $"doc_b".cast("string"),
          lit(":"), $"rep".cast("string")), CurveBootSalt)
      val wgt = BootThresholds.map(t => (u >= lit(t)).cast("long"))
        .reduce(_ + _)
      val band = perTau
        .select($"tau", $"doc_a", $"doc_b",
          explode(sequence(lit(1), lit(BootB))).as("rep"))
        .select($"tau", $"rep", wgt.as("w"))
        .groupBy($"tau", $"rep").agg(sum($"w").as("wsum"))
        .groupBy($"tau")
        .agg(min($"wsum").as("boot_lo"), max($"wsum").as("boot_hi"))
      point.join(band, Seq("tau")).orderBy($"tau")
    }),

    // O10: source-fair interleaved ranking — the EXPORT ORDER of a
    // balanced curation run: rank docs per source by quality, then
    // merge round-robin (all sources' rank-1 docs before any rank-2)
    // so no prolific source floods the head of the dataset. The
    // global order is the deterministic (rank, source, id) triple;
    // the emitted prefix is a TakeOrderedAndProject (never a global
    // sort), and the position column is a window over the bounded
    // 100-row result only — the 100 TB shape: per-source windows
    // shuffle once on source, the head is top-k machinery.
    "fair_interleave" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ranked = Tables.documents(s, dir)
        .select($"doc_id", $"source", qualityOf($"text").as("quality"))
        .withColumn("src_rank", row_number().over(
          Window.partitionBy($"source")
            .orderBy($"quality".desc, $"doc_id")).cast("long"))
      ranked.orderBy($"src_rank", $"source", $"doc_id").limit(100)
        .withColumn("out_pos", row_number().over(
          Window.orderBy($"src_rank", $"source", $"doc_id")).cast("long"))
        .select($"out_pos", $"doc_id", $"source", $"src_rank", $"quality")
        .orderBy($"out_pos")
    }),

    // L75: vocabulary-growth curve (Heaps-law audit) — the corpus-
    // acquisition signal: processing sources in their deterministic
    // order, how many NEW distinct tokens does each contribute? A
    // saturating curve says more of the same source family adds no
    // lexical diversity; a spiking source is either valuable or noise
    // (both worth a look). First-occurrence attribution is one
    // map-combinable MIN over the (token → min source) relation —
    // shuffle keys are tokens and (source, token), vocabulary-sized,
    // never raw text; the cumulative vocab runs over the per-source
    // relation, bounded by the source domain (20 here), so the window
    // is the prune_audit class of bounded driver-shaped relations.
    "vocab_growth" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select($"source", explode(split($"text", " ")).as("tok"))
        .distinct()
      val newPer = d.groupBy($"tok").agg(min($"source").as("source"))
        .groupBy($"source").agg(count(lit(1)).as("n_new"))
      val distinctPer = d.groupBy($"source")
        .agg(count(lit(1)).as("n_distinct"))
      val w = Window.orderBy($"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      distinctPer.join(newPer, Seq("source"), "left_outer")
        .withColumn("n_new", coalesce($"n_new", lit(0L)))
        .withColumn("cum_vocab", sum($"n_new").over(w))
        .withColumn("new_rate",
          q6($"n_new".cast("double") / $"n_distinct".cast("double")))
        .orderBy($"source")
    }),

    // L76: Zipf / power-law fit of the token-frequency spectrum, per
    // source — the lexical-health scalar next to L75's growth curve: a
    // natural corpus runs slope ≈ −2 on the ln(count)→ln(#tokens)
    // frequency-of-frequencies line (Zipf α≈1); template/boilerplate
    // sources flatten it, spam steepens it. Fit = the G18 one-pass
    // OLS recipe over the spectrum relation (one row per (source,
    // count) — bounded by distinct counts, never vocabulary): ln
    // inputs quantized per row to 1e-6 (the q6 contract for libm
    // values), then exact integer power sums, the closed-form slope
    // the only double math. No windows, no ranks — the rank-based
    // Zipf spelling needs a per-source vocab sort; the spectrum
    // spelling is map-combinable end to end.
    "zipf_fit" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val spec = Tables.documents(s, dir)
        .select($"source", explode(split($"text", " ")).as("tok"))
        .groupBy($"source", $"tok").agg(count(lit(1)).as("cnt"))
        .groupBy($"source", $"cnt").agg(count(lit(1)).as("n_toks"))
      val qx = floor(log($"cnt".cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("decimal(19,0)")
      val qy = floor(log($"n_toks".cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("decimal(19,0)")
      val slope = ($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx")
      spec.groupBy($"source")
        .agg(count(lit(1)).as("n"),
          sum(qx).cast("double").as("sx"),
          sum(qy).cast("double").as("sy"),
          sum(qx * qy).cast("double").as("sxy"),
          sum(qx * qx).cast("double").as("sxx"))
        .filter($"n" >= 2) // ≥2 spectrum points ⟹ nonzero x variance
        .select($"source", $"n".as("n_points"),
          // ln quantizations cancel in the slope (unit-free); the
          // intercept carries one factor of 1e6
          q6(slope).as("slope_q6"),
          q6((($"sy" - slope * $"sx") / $"n") / lit(1000000.0))
            .as("intercept_q6"))
        .orderBy($"source")
    }),

    // L78: positional phrase search — the capability BM25's
    // bag-of-words postings (L30) cannot express: "these words, in
    // this order, adjacent". The positional-postings spelling every
    // search engine uses: one (doc, position) relation per phrase
    // term, adjacency = an equi-join on (doc_id, pos+1). Scale shape:
    // the postings for ONE term are df(term)-sized — the join ships
    // only matching postings, never documents, and generalizes to
    // k-word phrases as k−1 chained position joins. The oracle replays
    // from the position-INDEXED token relation (list indexing over
    // string_split — an independent spelling of tokenization and
    // adjacency), counting overlapping occurrences correctly where a
    // substring-count oracle would not.
    "phrase_search" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      val t1 = toks.filter($"tok" === "table").select($"doc_id", $"pos")
      val t2 = toks.filter($"tok" === "hash")
        .select($"doc_id", ($"pos" - 1).as("pos"))
      t1.join(t2, Seq("doc_id", "pos"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy($"doc_id")
    }),

    // L79: largest-remainder mixture apportionment — the EXACT-size
    // companion to mixture_resample (L21): rate-based resampling hits
    // a target mix in expectation; a training run that needs EXACTLY
    // K examples needs apportionment. Hare-quota largest remainder:
    // source i gets floor(K·n_i/N) seats, and the R = K − Σfloor
    // leftover seats go to the largest remainders (K·n_i mod N,
    // source-asc tie-break — deterministic, every quantity integer).
    // The arithmetic runs on the per-source COUNT relation — bounded
    // by the source domain, never rows — so the remainder-rank window
    // is the prune_audit class; the downstream take-per-source is
    // L35's stratified exact-k machinery.
    "mixture_apportion" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val k = 300L
      val per = Tables.documents(s, dir)
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      val tot = per.agg(sum($"n_docs").as("n_total"))
      val quotas = per.crossJoin(broadcast(tot))
        .select($"source", $"n_docs",
          expr(s"($k * n_docs) DIV n_total").as("base"),
          expr(s"($k * n_docs) % n_total").as("rem"))
      val leftover = quotas.agg((lit(k) - sum($"base")).as("leftover"))
      val w = Window.orderBy($"rem".desc, $"source")
      quotas
        .withColumn("rrank", row_number().over(w).cast("long"))
        .crossJoin(broadcast(leftover))
        .select($"source", $"n_docs",
          ($"base" + when($"rrank" <= $"leftover", 1L).otherwise(0L))
            .as("alloc"))
        .orderBy($"source")
    }),

    // L88: exact per-group penny allocation — the FINANCIAL
    // apportionment class (L79's largest-remainder at ROW level, one
    // allocation per group): spread each order's integer cent total
    // across its lines proportional to line value, exactly — Σ allocs
    // ≡ the order total to the cent, no "lost penny". Every quantity
    // integer (cents × micro-weights, products ≤ ~5e16 « 2⁶³); the
    // remainder rank is a partition-local window with a deterministic
    // line tie-break; lines pre-folded per (order, linenumber) —
    // TESTDATA.md: (l_orderkey, l_linenumber) is NOT unique raw.
    "penny_allocation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val lines = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey", $"l_linenumber")
        .agg(sum(floor($"l_extendedprice" * lit(10000.0) + lit(0.5))
          .cast("long")).as("w"))
      val tgt = Tables.orders(s, dir)
        .select($"o_orderkey",
          floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long")
            .as("t"))
      val wOrd = Window.partitionBy($"l_orderkey")
      val wRank = Window.partitionBy($"l_orderkey")
        .orderBy($"rem".desc, $"l_linenumber")
      lines
        .join(tgt.hint("merge"), $"l_orderkey" === $"o_orderkey")
        .withColumn("tw", sum($"w").over(wOrd))
        .withColumn("base", expr("(t * w) DIV tw"))
        .withColumn("rem", expr("(t * w) % tw"))
        .withColumn("leftover", $"t" - sum($"base").over(wOrd))
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .select($"l_orderkey", $"l_linenumber",
          ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
            .as("alloc_cents"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // L3/L4: brute-force cosine top-k — the exactness baseline. The
    // probe set (20 vectors) is broadcast against the corpus; ranking
    // uses the quantized score + neighbor id so both engines order
    // identically.
    "cosine_knn" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val probes = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"v".as("pv"))
      val w = Window.partitionBy($"probe_id")
        .orderBy($"cos_sim".desc, $"vec_id")
      emb.join(broadcast(probes), $"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id",
          q6(dot($"v", $"pv") / (l2norm($"v") * l2norm($"pv"))).as("cos_sim"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"rn", $"vec_id".as("neighbor_id"), $"cos_sim")
        .orderBy($"probe_id", $"rn")
    }),

    // L59: contrastive hard-negative mining — the training-pair
    // generator for retrieval/embedding models: for each anchor doc,
    // the semantically CLOSEST documents that are NOT near-duplicates
    // (near-dups would be false negatives and poison the contrastive
    // loss — the standard filtered-hard-negative recipe). Pure
    // composition of two proven pieces: the brute cosine ranking
    // (embeddings share ids with documents) anti-joined against the
    // L2 near-dup pair set, re-ranked after the filter. Scale path:
    // swap the brute scorer for ivfpq_ann's pruned scorer; the
    // anti-join key is the compact id pair either way.
    "hard_negatives" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val probes = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"v".as("pv"))
      val pairs = nearDupPairsCached(s, dir)
        .select($"doc_a", $"doc_b")
      val sym = pairs
        .unionAll(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
        .select($"doc_a".as("probe_id"), $"doc_b".as("vec_id"))
      val w = Window.partitionBy($"probe_id")
        .orderBy($"cos_sim".desc, $"vec_id")
      emb.join(broadcast(probes), $"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id",
          q6(dot($"v", $"pv") / (l2norm($"v") * l2norm($"pv")))
            .as("cos_sim"))
        .join(sym, Seq("probe_id", "vec_id"), "left_anti")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"rn", $"vec_id".as("negative_id"),
          $"cos_sim")
        .orderBy($"probe_id", $"rn")
    }),

    // L5 (per-doc): token statistics and quality signals. The subword
    // estimate is the BPE-ish proxy: greedy ≤4-char non-space chunks
    // (both engines' regex engines chunk greedily and identically).
    "text_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = split($"text", " ")
      Tables.documents(s, dir)
        .select($"doc_id",
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_unique"),
          size(regexp_extract_all($"text", lit("(\\S{1,4})"), lit(1)))
            .cast("long").as("n_subword_tokens"),
          q6(size(array_distinct(t)).cast("double") / size(t)).as("ttr"),
          q6(foldSum(transform(t, w => length(w).cast("double"))) / size(t))
            .as("avg_token_len"),
          q6(size(filter(t, w => w === "the" || w === "a")).cast("double") /
            size(t)).as("stopword_ratio"))
        .orderBy($"doc_id")
    }),

    // L5 (quality scoring): composite per-doc quality from the
    // standard cheap signals — length band, type-token ratio, stopword
    // presence, token-length sanity — combined into a 0..1 score and a
    // keep/review/drop band, the filter stage of a training-data
    // pipeline. All arithmetic is quantized for oracle parity.
    "doc_quality" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", $"lang", qualityOf($"text").as("quality"))
        .withColumn("band",
          when($"quality" >= 0.875, "keep")
            .when($"quality" >= 0.625, "review").otherwise("drop"))
        .orderBy($"doc_id")
    }),

    // L22: greedy token-budget selection — "the best 40% of tokens".
    // The one-global-window spelling is a single-task sort of the
    // corpus; BudgetSelect gets the identical row set from a bounded
    // per-stratum relation (quality is eighth-grid by construction)
    // plus a two-phase offset prefix-sum on just the boundary stratum.
    // Budget arithmetic stays integral (total * 2 / 5) so both engines
    // compute it exactly.
    "token_budget_select" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // The fraction budget is derived from the strata relation the
      // operator aggregates anyway — no separate total pass. The
      // scoring is recomputed by BudgetSelect's three passes rather
      // than checkpointed here: a checkpoint inside a lazily-consumed
      // query has no unpersist point and would pin O(corpus) blocks
      // until the result frame is GC'd — an operator USER who wants
      // one tokenization pass materializes `scored` under their own
      // lifecycle and hands it in.
      val scored = Tables.documents(s, dir).select($"doc_id",
        qualityOf($"text").as("quality"),
        size(split($"text", " ")).cast("long").as("n_tokens"))
      graft.operators.BudgetSelect.selectFraction(scored, "doc_id",
          "quality", "n_tokens", 2, 5)
        .orderBy($"doc_id")
    }),

    // L5 (statistical quality): per-doc mean unigram log-probability
    // under the corpus's own unigram distribution — the cheap
    // perplexity-style filter (an atypical-token-salad doc scores
    // far below prose). Shape: one token-keyed count (map-side
    // combinable), one token-keyed join (AQE handles the stopword
    // skew like any shuffle join), one doc-keyed mean; the corpus
    // total rides a ONE-ROW broadcast (nested-loop in name only —
    // the build side is a single aggregate row, the canonical
    // scalar-subquery shape, allowlisted in PlanAuditSpec).
    // Per-token log terms are quantized BEFORE summing (the dsum
    // recipe) so the per-doc mean is order-free and engine-exact.
    "unigram_logprob" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
      val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      val totalDf = broadcast(vocab.agg(sum($"n").as("__total")))
      toks
        .join(vocab, "tok")
        .crossJoin(totalDf)
        .select($"doc_id",
          floor(log($"n".cast("double") / $"__total".cast("double")) *
            lit(10000.0) + lit(0.5)).as("qlp"))
        .groupBy($"doc_id")
        .agg((sum($"qlp").cast("double") / lit(10000.0) / count(lit(1)))
          .as("mean_logprob"))
        .orderBy($"doc_id")
    }),

    // L9 (corpus n-gram table): the word-3-gram count table with a
    // min-count threshold — the LM-style corpus statistic ("which
    // phrases recur"), and the raw material for boilerplate mining.
    // Shape: generator → gram-keyed count (map-side combinable: each
    // distinct gram ships at most once per input partition) →
    // threshold filter → bounded top-k (TakeOrderedAndProject), so
    // the result stays bounded whatever the corpus size; grams below
    // the threshold never leave the aggregation.
    "ngram_counts" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(split($"text", " ").as("ws"))
        .filter(size($"ws") >= 3)
        .select(explode(transform(
          sequence(lit(1), size($"ws") - 2),
          i => concat_ws(" ", slice($"ws", i, lit(3))))).as("gram"))
        .groupBy($"gram").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" >= 3)
        .orderBy($"cnt".desc, $"gram")
        .limit(100)
    }),

    // L58: padding-waste audit — the batching decision behind
    // length-bucketed dataloaders: batching examples padded to the
    // next power-of-two length, how many tokens are padding per
    // bucket? (The answer drives bucket granularity and packing-vs-
    // padding tradeoffs.) Bucket = next pow2 via the EXACT
    // binary-string-length log2 (the session_gaps trick — a libm
    // log2 flips floor at pow2 boundaries between engines); one
    // map-combinable agg keyed by ≤ ~16 bucket values.
    "padding_waste" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(size(split($"text", " ")).cast("long").as("n_tokens"))
        .withColumn("bucket", when($"n_tokens" <= 1L, lit(1L))
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_tokens - 1)) AS INT))")))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          sum($"bucket" - $"n_tokens").as("total_padding"),
          q6(sum($"bucket" - $"n_tokens").cast("double") / sum($"bucket"))
            .as("waste_frac"))
        .orderBy($"bucket")
    }),

    // L55: Poisson-bootstrap uncertainty — the error bar on a corpus
    // statistic WITHOUT resampling rows (Chamandy et al., "Estimating
    // Uncertainty for Massive Data Streams", Google TR 2012): each row
    // gets an independent Poisson(1) weight per replicate, drawn
    // DETERMINISTICALLY from the keyed-md5 uniform (the hash_split
    // machinery — retry-stable, partitioning-invariant, and exactly
    // replayable by the oracle). The inverse-CDF thresholds are
    // integer literals in the 2^32 hash space, weights cap at 7
    // (truncated tail mass 1e-5, identical truncation both engines);
    // per-replicate sums are exact integers, so the 32 replicate
    // means are engine-exact. Shape: one shuffle-free 32× explode +
    // one map-combinable agg keyed by the 32-value replicate id —
    // the spread of the replicate means IS the bootstrap CI.
    "bootstrap_means" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val u = graft.operators.Sampling.keyHash32(
        concat($"doc_id".cast("string"), lit(":"), $"rep".cast("string")),
        BootSalt)
      val w = BootThresholds.map(t => (u >= lit(t)).cast("int"))
        .reduce(_ + _)
      Tables.documents(s, dir)
        .select($"doc_id", $"n_chars",
          explode(sequence(lit(1), lit(BootB))).as("rep"))
        .select($"rep".cast("long").as("rep"), $"n_chars", w.as("w"))
        .groupBy($"rep")
        .agg(sum($"w").as("n_eff"),
          q6(sum($"w" * $"n_chars").cast("double") / sum($"w"))
            .as("mean_chars"))
        .orderBy($"rep")
    }),

    // L63: bigram LM scoring — the sharper sibling of L5b's unigram
    // log-prob: per doc, the mean add-one-smoothed bigram log
    // probability under the corpus's own bigram model (fluency
    // filtering — word salad scores far below natural prose even
    // when its unigrams look fine). Per-bigram terms are quantized
    // to integer micro-nats BEFORE the order-free sum, so the score
    // is engine-exact. Shape: one bigram explode feeding BOTH count
    // models (map-combinable), two vocab-keyed equi joins back, one
    // one-row vocab broadcast (the unigram_logprob scalar shape).
    "bigram_logprob" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bg = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("ws"))
        .filter(size($"ws") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("b"))
        .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
      val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy($"w1").agg(count(lit(1)).as("c1"))
      val v = broadcast(Tables.documents(s, dir)
        .select(explode(split($"text", " ")).as("w"))
        .agg(count_distinct($"w").as("vocab")))
      bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1")).crossJoin(v)
        .select($"doc_id",
          floor(log(($"c2" + lit(1L)).cast("double") / ($"c1" + $"vocab")) *
            lit(1000000.0) + lit(0.5)).cast("long").as("t"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum($"t").cast("double") / lit(1000000.0) / count(lit(1)))
            .as("mean_logprob"))
        .orderBy($"doc_id")
    }),

    // L62: per-source duplication rate — "which sources are mostly
    // copies of something" (crawler echo chambers, mirror detection,
    // the dedup-priority input next to L49's pair matrix). Cluster
    // members come from the SAME LSH + closure pass as
    // neardup_clusters; singletons are the non-members (docs never in
    // any near-dup pair). Exact integer counts + one q6 ratio.
    "source_dup_rate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"source")
      val members = nearDupComponents(s, dir)
        .select($"node".as("doc_id"), lit(1L).as("is_dup"))
      docs.join(members, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"is_dup", lit(0L))).as("n_dup_docs"))
        .select($"source", $"n_docs", $"n_dup_docs",
          q6($"n_dup_docs".cast("double") / $"n_docs").as("dup_rate"))
        .orderBy($"source")
    }),

    // L61: per-source quality mix — the tier table a mixture pipeline
    // reweights from ("how much of source X clears quality 0.875?"):
    // the L5 quality score is a small discrete domain (quarters of
    // the four gate scores), so the full (source, quality) histogram
    // is exact, tiny, and map-combinable.
    "source_quality_mix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"source", qualityOf($"text").as("quality"))
        .groupBy($"source", $"quality")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"source", $"quality")
    }),

    // L50: per-source unigram entropy — the diversity/quality scalar a
    // mixture pipeline tracks per source (template farms and spam
    // collapse entropy; natural prose sits near the language's
    // ceiling). H = Σ (c/n)·ln(n/c) over the source's term
    // distribution, each term quantized to integer micro-nats BEFORE
    // the order-free sum (the dsum recipe at 1e-6), so the scalar is
    // engine-exact. Shape: one map-combinable (source, term) count,
    // one tiny per-source total, one broadcast-able join back — the
    // same cost class as ngram_counts.
    "source_entropy" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val counts = Tables.documents(s, dir)
        .select($"source", explode(split($"text", " ")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("cnt"))
      val tot = counts.groupBy($"source")
        .agg(sum($"cnt").as("n"), count(lit(1)).as("types"))
      counts.join(tot, "source")
        .select($"source", $"n", $"types",
          floor(($"cnt".cast("double") / $"n") *
            log($"n".cast("double") / $"cnt") * lit(1000000.0) + lit(0.5))
            .cast("long").as("t"))
        .groupBy($"source")
        .agg(max($"n").as("n_tokens"), max($"types").as("n_types"),
          (sum($"t").cast("double") / lit(1000000.0)).as("entropy_nats"))
        .orderBy($"source")
    }),

    // L51: per-source distribution drift — KL(source ‖ corpus) over
    // unigram distributions, the pairwise companion of L50: "how far
    // has this source drifted from the corpus mixture" (crawler
    // drift alarms, mixture reweighting). D = Σ_w p_s(w)·ln(p_s(w)/
    // p_c(w)) — finite by construction since every source term is in
    // the corpus. Same micro-nat integer-quantization recipe as
    // entropy (engine-exact); shape: the (source, term) count feeds
    // BOTH distributions (corpus counts are one more map-combinable
    // agg over it), joined back on the term key (vocab-keyed equi
    // join, NOT broadcast — vocabulary outgrows broadcast at corpus
    // scale, the tfidf_terms contract).
    // L86: PSI population drift — the deployment-monitoring twin of
    // source_kl: Population Stability Index of the value distribution
    // between two time windows (first vs second half-month), per
    // event type — THE standard "did the feature distribution move"
    // gate before a model retrain. PSI = Σ_bins (pA−pB)·ln(pA/pB)
    // over fixed equal-width bins; per-bin terms are quantized to
    // ln-micro before the order-free integer sum (the source_kl
    // lane), and bins empty on either side are excluded and COUNTED
    // (reported as skipped_bins — the epsilon-smoothing alternative
    // would put a tuning constant inside an exactness contract).
    "psi_drift" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cut = lit("2024-01-16").cast("timestamp")
      val cnt = Tables.events(s, dir)
        .select($"event_type", ($"ts" < cut).as("is_a"),
          floor($"value" / lit(25.0)).cast("long").as("bin"))
        .groupBy($"event_type", $"bin")
        .agg(sum(when($"is_a", 1L).otherwise(0L)).as("ca"),
          sum(when(!$"is_a", 1L).otherwise(0L)).as("cb"))
      val tot = cnt.groupBy($"event_type")
        .agg(sum($"ca").as("na"), sum($"cb").as("nb"),
          sum(when($"ca" === 0L || $"cb" === 0L, 1L).otherwise(0L))
            .as("skipped_bins"),
          count(lit(1)).as("n_bins"))
      val term = ($"ca".cast("double") / $"na" -
        $"cb".cast("double") / $"nb") *
        log(($"ca" * $"nb").cast("double") / ($"cb" * $"na").cast("double"))
      cnt.join(tot, "event_type")
        .filter($"ca" > 0L && $"cb" > 0L)
        .select($"event_type", $"n_bins", $"skipped_bins", $"na", $"nb",
          floor(term * lit(1000000.0) + lit(0.5)).cast("long").as("t"))
        .groupBy($"event_type", $"n_bins", $"skipped_bins", $"na", $"nb")
        .agg((sum($"t").cast("double") / lit(1000000.0)).as("psi"))
        .orderBy($"event_type")
    }),

    "source_kl" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val counts = Tables.documents(s, dir)
        .select($"source", explode(split($"text", " ")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("cs"))
      val corpus = counts.groupBy($"w").agg(sum($"cs").as("cc"))
      val tot = broadcast(counts.agg(sum($"cs").as("ntot")))
      val perSrc = counts.groupBy($"source").agg(sum($"cs").as("ns"))
      counts.join(corpus, "w").join(perSrc, "source").crossJoin(tot)
        .select($"source",
          floor(($"cs".cast("double") / $"ns") *
            log(($"cs".cast("double") / $"ns") /
              ($"cc".cast("double") / $"ntot")) *
            lit(1000000.0) + lit(0.5)).cast("long").as("t"))
        .groupBy($"source")
        .agg((sum($"t").cast("double") / lit(1000000.0)).as("kl_nats"))
        .orderBy($"source")
    }),

    // L9 (faceted text analysis): top TF-IDF terms per source — "what
    // is each source about", the profiling sibling of bm25_search.
    // Shape: one map-side-combinable (source, term) count, one
    // term-keyed equi-join for document frequency (vocab-sized, NOT
    // broadcast — vocabulary outgrows broadcast at corpus scale), the
    // source count on a one-row broadcast, top-5 per source by the
    // integer quantized score (engine-exact ranking).
    "tfidf_terms" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Tables.documents(s, dir).select($"source", $"text")
        .unionAll(tfidfProbes.toDF("source", "text"))
      val tf = d.select($"source", explode(split($"text", " ")).as("term"))
        .groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
      val ns = broadcast(tf.agg(countDistinct($"source").as("n_sources")))
      val dfq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"source").orderBy($"qs".desc, $"term")
      tf.join(dfq, "term")
        .crossJoin(ns)
        .select($"source", $"term",
          floor($"tf".cast("double") *
            log($"n_sources".cast("double") / $"df".cast("double")) *
            lit(1000000.0) + lit(0.5)).as("qs"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .select($"source", $"rank", $"term",
          ($"qs".cast("double") / lit(1000000.0)).as("tfidf"))
        .orderBy($"source", $"rank")
    }),

    // L9 (keyword search): BM25-scored retrieval (k1=1.2, b=0.75,
    // Lucene's +1 idf so scores stay positive) for a set of term
    // queries — the inverted-index scoring loop as ONE dataflow.
    // Scale shape: the query relation is TINY and broadcast; corpus
    // tokens are semi-joined against it BEFORE the tf aggregation, so
    // only matching (doc, term) pairs ever shuffle; document length
    // joins back by doc_id (equi-shuffle); corpus totals ride a
    // one-row broadcast (the allowlisted scalar-subquery shape).
    // Determinism: per-(doc, term) scores are quantized BEFORE the
    // per-(query, doc) sum (the dsum recipe) and the ranking orders
    // by the INTEGER quantized score + doc_id, so both rank and score
    // are engine-exact.
    "bm25_search" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      bm25Ranked(s, dir, 10)
        .select($"query_id", $"rank", $"doc_id",
          ($"sq".cast("double") / lit(10000.0)).as("score"))
        .orderBy($"query_id", $"rank")
    }),

    // L67: hybrid retrieval with reciprocal-rank fusion — the RAG-era
    // retrieval recipe: a lexical arm (the L30 BM25 scorer, top-20)
    // and a semantic arm (brute cosine over the query's anchor
    // embedding — the fixture has no text encoder, so query q's
    // vector is embedding q, the standard eval-harness stand-in;
    // the scale path swaps in ivfpq_ann's pruned scorer unchanged)
    // fused per (query, doc) as RRF: Σ 1/(60 + rank). Determinism:
    // the fusion score is computed in exact integer micro-units
    // (floor(1e6/(60+rank)) — 1e6/x for x ≤ 80 is > 1e4 ulps away
    // from the nearest wrong integer, so floor is engine-exact) and
    // ranking orders by (rrf_micro DESC, doc_id). Scale shape: each
    // arm ends in a per-query top-k (tiny); the fusion join and
    // re-rank touch ≤ 2k rows per query whatever the corpus size.
    "hybrid_rrf" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val lex = bm25Ranked(s, dir, 20)
        .select($"query_id", $"doc_id", $"rank".as("lex_rank"))
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val probes = emb.filter($"vec_id" < 3)
        .select($"vec_id".as("probe_id"), $"v".as("pv"))
      val wSem = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"doc_id")
      val sem = emb.join(broadcast(probes), $"vec_id" =!= $"probe_id")
        .select($"probe_id".as("query_id"), $"vec_id".as("doc_id"),
          q6(dot($"v", $"pv") / (l2norm($"v") * l2norm($"pv")))
            .as("cos_sim"))
        .withColumn("sem_rank", row_number().over(wSem).cast("long"))
        .filter($"sem_rank" <= 20)
        .select($"query_id", $"doc_id", $"sem_rank")
      val wFuse = Window.partitionBy($"query_id")
        .orderBy($"rrf_micro".desc, $"doc_id")
      lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf_micro",
          coalesce(floor(lit(1000000.0) / (lit(60) + $"lex_rank")),
            lit(0L)) +
          coalesce(floor(lit(1000000.0) / (lit(60) + $"sem_rank")),
            lit(0L)))
        .withColumn("rank", row_number().over(wFuse).cast("long"))
        .filter($"rank" <= 10)
        .select($"query_id", $"rank", $"doc_id", $"rrf_micro")
        .orderBy($"query_id", $"rank")
    }),

    // L30 (indexed twin): the SAME BM25 search answered from the
    // written term-bucket layout instead of a corpus scan — build
    // postings, materialize them `partitionBy(bucket)` (+ the one-row
    // stats relation), then read back ONLY the query terms' buckets
    // (directory pruning at listing time; the residual term IN-filter
    // is pushed to the parquet scan). Shares the brute query's oracle
    // SQL verbatim, so the layout's pruning path itself — write,
    // listing-time prune, pushed filter, join-free scoring — is
    // driver-checked to produce identical rows. The layout lands in a
    // per-sfdir temp path at construction time (the learnedCents
    // run-a-job-at-construction pattern); a production caller writes
    // it once and queries it repeatedly.
    "bm25_indexed" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // write-once-per-dir: the layout is the PERSISTED index a
      // production caller builds once and queries repeatedly — repeat
      // invocations in one JVM (bench loops) pay only the read path
      val path = termIndexCache.computeIfAbsent(dir, d => {
        val docs = Tables.documents(s, d).select($"doc_id", $"text")
        val posts = graft.operators.InvertedIndex.buildPostings(docs, 16)
        val stats = docs
          .select(size(split($"text", " ")).cast("long").as("dl"))
          .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_term_index_" +
          math.abs(d.hashCode).toString
        graft.operators.InvertedIndex.writeTermLayout(posts, stats, p)
        p
      })
      graft.operators.InvertedIndex.bm25(s, path, Bm25QueryTerms, 16, 10)
        .orderBy($"query_id", $"rank")
    }),

    // L22 stratified: the mixture-aware budget — the best 2/5 of
    // tokens of EACH language independently (a global budget would
    // let one high-scoring stratum starve the rest). Same bounded
    // decomposition per group; all boundary strata share ONE
    // two-phase prefix-sum pass.
    "budget_select_stratified" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val scored = Tables.documents(s, dir).select($"doc_id", $"lang",
        qualityOf($"text").as("quality"),
        size(split($"text", " ")).cast("long").as("n_tokens"))
      graft.operators.BudgetSelect.selectFractionPerStratum(scored,
          "lang", "doc_id", "quality", "n_tokens", 2, 5)
        .orderBy($"doc_id")
    }),

    // L5 (language-ID heuristic): per-doc stopword-profile scores with
    // an argmax prediction — the standard cheap lang-ID mechanism,
    // fully deterministic so the oracle replicates it verbatim. The
    // corpus rows mostly tie at 0 (tiebreak is part of the contract);
    // the unioned es/de probe docs make the scores separate so the
    // mechanism itself — not just the tie order — is hash-checked.
    "lang_id_heuristic" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = split($"text", " ")
      def ratio(words: Seq[String]) =
        q6(size(filter(t, w => words.map(lit(_) === w).reduce(_ || _)))
          .cast("double") / size(t))
      Tables.documents(s, dir).select($"doc_id", $"lang", $"text")
        .unionAll(langIdProbes.toDF("doc_id", "lang", "text"))
        .select($"doc_id", $"lang",
          ratio(Seq("the", "a", "of")).as("en_score"),
          ratio(Seq("el", "la", "de")).as("es_score"),
          ratio(Seq("der", "die", "das")).as("de_score"))
        .withColumn("predicted_lang",
          when($"en_score" >= $"es_score" && $"en_score" >= $"de_score", "en")
            .when($"es_score" >= $"de_score", "es")
            .otherwise("de"))
        .orderBy($"doc_id")
    }),

    // L98: char-trigram language ID — the generalizing tier above
    // L5's stopword vote (which scores 0-everywhere on text that
    // avoids the few listed function words). A multinomial NB over
    // character trigrams, trained on the LABELED corpus itself (plus
    // planted per-class training rows that give each class genuine
    // characteristic n-grams — the fixture's English-ish salad is
    // per-class identical): per (doc, class), Laplace-smoothed
    // Σ k_t · ln((c_t+1)/(N_class+V)), each per-trigram term
    // quantized to integer micro-nats BEFORE the order-free sum (the
    // unigram_logprob contract), argmax in fixed class order. The
    // scoring probes are real-language text with zero stopword hits:
    // the stopword tier votes en on all of them by tiebreak, the
    // trigram model identifies them — the two mechanisms separate.
    // Shape: model build is one trigram explode + map-combinable
    // conditional counts keyed by trigram (vocabulary-sized, never
    // raw text); scoring is one vocab-keyed equi-join + one doc-keyed
    // agg; totals are a one-row scalar broadcast.
    "lang_id_trigram" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val langs = Seq("de", "en", "es", "fr", "zh")
      val corpus = Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"text")
      // train on a BALANCED per-class sample (the L35 exact-k
      // recipe): with the raw labels the en class carries ~3x the
      // trigram mass, and under add-one smoothing every rare/unseen
      // trigram then votes for the smallest class (its denominator
      // N_class + V is smallest) — a systematic misclassification
      // bias, not noise. Equal-k classes equalize the denominators,
      // and the model build touches k·|classes| docs regardless of
      // corpus size.
      val tw = Window.partitionBy($"lang").orderBy($"thv", $"doc_id")
      val balanced = corpus
        .withColumn("thv",
          graft.operators.Sampling.keyHash32($"doc_id", TrigramSalt))
        .withColumn("trn", row_number().over(tw))
        .filter($"trn" <= TrigramTrainK)
        .select($"doc_id", $"lang", $"text")
      val train = balanced
        .unionAll(trigramTrainProbes.toDF("doc_id", "lang", "text"))
      val scoreSet = corpus
        .unionAll(trigramTrainProbes.toDF("doc_id", "lang", "text"))
        .unionAll(trigramScoreProbes.toDF("doc_id", "lang", "text"))
      val triExpr = expr(
        "CASE WHEN length(text) < 3 THEN array(text) " +
          "ELSE transform(sequence(1, length(text) - 2), " +
          "i -> substring(text, i, 3)) END")
      val mt = train.select($"lang", explode(triExpr).as("tri"))
      val cAggs = langs.map(l =>
        sum(when($"lang" === l, 1L).otherwise(0L)).as(s"c_$l"))
      val model = mt.groupBy($"tri").agg(cAggs.head, cAggs.tail: _*)
      val nAggs = langs.map(l =>
        sum(when($"lang" === l, 1L).otherwise(0L)).as(s"n_$l")) :+
        countDistinct($"tri").as("v")
      val totals = mt.agg(nAggs.head, nAggs.tail: _*)
      val dt = scoreSet
        .select($"doc_id", $"lang", explode(triExpr).as("tri"))
        .groupBy($"doc_id", $"lang", $"tri").agg(count(lit(1)).as("k"))
      val terms = dt.join(model, Seq("tri"), "left_outer")
        .crossJoin(broadcast(totals))
      val lpCols = langs.map { l =>
        sum($"k" * floor(
          log((coalesce(col(s"c_$l"), lit(0L)).cast("double") + lit(1.0)) /
            (col(s"n_$l") + $"v").cast("double")) * lit(1000000.0) +
          lit(0.5)).cast("long")).as(s"lp_$l")
      }
      terms.groupBy($"doc_id", $"lang").agg(lpCols.head, lpCols.tail: _*)
        .withColumn("predicted_lang",
          when($"lp_de" >= $"lp_en" && $"lp_de" >= $"lp_es" &&
            $"lp_de" >= $"lp_fr" && $"lp_de" >= $"lp_zh", "de")
          .when($"lp_en" >= $"lp_es" && $"lp_en" >= $"lp_fr" &&
            $"lp_en" >= $"lp_zh", "en")
          .when($"lp_es" >= $"lp_fr" && $"lp_es" >= $"lp_zh", "es")
          .when($"lp_fr" >= $"lp_zh", "fr")
          .otherwise("zh"))
        .orderBy($"doc_id")
    }),

    // L71: code-switch detection — the language-MIX signal doc-level
    // language ID (L5's lang_id_heuristic) cannot see: a document
    // whose 25-word segments vote for different languages is usually
    // concatenation noise (scraped boilerplate, wrong-merge) and a
    // known quality hazard for language-filtered corpora. Same
    // positional segmentation as segment_dedup (L65), same stopword
    // vote as lang_id_heuristic per segment, then per doc: segment
    // count, adjacent-segment switches, distinct languages, mixed
    // flag. One explode + one doc-partitioned window + one
    // map-combinable agg; shuffle key is doc_id.
    "code_switch" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val SegW = 25
      val segs = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("ws"))
        .select($"doc_id",
          posexplode(transform(
            sequence(lit(0),
              (((size($"ws") + lit(SegW - 1)) / lit(SegW)) - 1).cast("int")),
            i => slice($"ws", i * lit(SegW) + lit(1), lit(SegW)))))
        .withColumnRenamed("pos", "seg_idx")
        .withColumnRenamed("col", "seg_ws")
      def cnt(words: Seq[String]) =
        size(filter($"seg_ws", w => words.map(lit(_) === w).reduce(_ || _)))
      val scored = segs.select($"doc_id", $"seg_idx",
          cnt(Seq("the", "a", "of")).as("en_c"),
          cnt(Seq("el", "la", "de")).as("es_c"),
          cnt(Seq("der", "die", "das")).as("de_c"))
        .withColumn("seg_lang",
          when($"en_c" >= $"es_c" && $"en_c" >= $"de_c", "en")
            .when($"es_c" >= $"de_c", "es")
            .otherwise("de"))
      val w = Window.partitionBy($"doc_id").orderBy($"seg_idx")
      scored
        .withColumn("switch",
          when(lag($"seg_lang", 1).over(w).isNotNull &&
            lag($"seg_lang", 1).over(w) =!= $"seg_lang", 1L).otherwise(0L))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_segs"), sum($"switch").as("n_switches"),
          countDistinct($"seg_lang").as("n_langs"))
        .withColumn("mixed", when($"n_langs" > 1, 1L).otherwise(0L))
        .orderBy($"doc_id")
    }),

    // L5 (faceted): corpus profile per language.
    "lang_profile" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          sum(size(split($"text", " ")).cast("long")).as("total_tokens"),
          countDistinct($"source").as("n_sources"))
        .select($"lang", $"n_docs", $"total_chars", $"total_tokens",
          $"n_sources",
          ($"total_chars".cast("double") / $"n_docs").as("avg_chars"))
        .orderBy($"lang")
    }),

    // L6: multimodal binary columns — payloads ride as opaque binary;
    // the byte-level features are pure Catalyst expressions
    // (Multimodal.featureColumns, with the ByteSum codegen kernel), so
    // the plan keeps codegen + pushdown; the mapPartitions decoder
    // extension point (Multimodal.extractFeatures) is spec-covered
    // separately. The DuckDB oracle is BYTE-true (it decodes the hex
    // image of encode(text), not characters), and both sides union in
    // a multi-byte UTF-8 probe doc whose first chars are non-ASCII —
    // so header_hex and byte_mean are proven over real multi-byte
    // payloads, not just the ASCII fixture.
    "binary_features" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(Seq((-1L, nonAsciiProbeText)).toDF("doc_id", "text"))
      val binaryDocs = docs
        .select($"doc_id", $"text".cast("binary").as("payload"))
      graft.operators.Multimodal.featureColumns(binaryDocs)
        .orderBy($"doc_id")
    }),

    // L6: frame-sample + byte-downsample ("resize") over binary
    // payloads — one row per sampled frame window plus a stride
    // thumbnail, all Catalyst expressions (Multimodal.frameColumns);
    // the same multi-byte probe doc rides along so the byte math is
    // proven off-ASCII.
    "binary_frames" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(Seq((-1L, nonAsciiProbeText)).toDF("doc_id", "text"))
      graft.operators.Multimodal.frameColumns(
          docs.select($"doc_id", $"text".cast("binary").as("payload")))
        .orderBy($"doc_id", $"frame_no")
    }),

    // L6: multimodal relation — text metadata joined to its embedding
    // vector (doc_id ↔ vec_id), vector features computed in-line.
    // L95: per-source embedding centroid + dispersion — the semantic
    // spread audit behind mixture decisions ("is source X one tight
    // topic or a grab-bag"; a drifting centroid between snapshots is
    // the semantic twin of L51's KL drift). Exactness: per-(source,
    // dim) sums run in q4 micro-integers (order-free), the centroid
    // is one double division per dim spelled identically in both
    // engines, and cosines fold sequentially (the cosine_knn dot
    // contract) before q6. Shape: one posexplode shuffle keyed by
    // (source, dim) — 64 slim rows per vector — then one broadcast
    // of the ≤ sources×64 centroid relation back onto the vectors;
    // at 10⁹ vectors both aggregations stay map-combinable and the
    // centroid relation stays tiny.
    // L97: source AFFINITY matrix — pairwise cosine between source
    // centroids, the semantic twin of L49's near-dup overlap matrix:
    // which sources cover the same territory (merge candidates / the
    // redundancy a mixture should discount) vs which add genuinely
    // different material. Rides the SAME per-dir centroid relation as
    // L95 (built once, ≤ sources×64 doubles); the pair join is over
    // the bounded source domain (the kmv_overlap shape), cosines fold
    // sequentially before q6.
    "source_affinity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cent = sourceCentroidRelation(s, dir)
      cent.as("a").join(broadcast(cent.as("b")),
          col("a.source") < col("b.source"))
        .select(col("a.source").as("source_1"),
          col("b.source").as("source_2"),
          q6(dot(col("a.cvec"), col("b.cvec")) /
            (l2norm(col("a.cvec")) * l2norm(col("b.cvec"))))
            .as("cent_cos"))
        .orderBy($"source_1", $"source_2")
    }),

    "source_centroids" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .join(Tables.documents(s, dir)
          .select($"doc_id".as("vec_id"), $"source"), "vec_id")
      val cent = sourceCentroidRelation(s, dir)
      val scored = e.join(broadcast(cent), "source")
        .select($"source",
          q6(dot($"v", $"cvec") / (l2norm($"v") * l2norm($"cvec")))
            .as("cs"))
      val stats = scored.groupBy($"source")
        .agg(count(lit(1)).as("n_vecs"),
          sum(floor($"cs" * lit(1000000.0) + lit(0.5)).cast("long"))
            .as("csum"),
          min($"cs").as("min_cos"))
      stats
        .join(cent.select($"source", q6(l2norm($"cvec"))
          .as("centroid_norm")), "source")
        .select($"source", $"n_vecs", $"centroid_norm",
          q6($"csum".cast("double") / ($"n_vecs" * lit(1000000.0)))
            .as("mean_cos"),
          $"min_cos")
        .orderBy($"source")
    }),

    "doc_embed_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .join(Tables.embeddings(s, dir), $"doc_id" === $"vec_id")
        .select($"doc_id", $"lang", $"n_chars",
          $"label".cast("long").as("label"),
          size($"embedding").cast("long").as("dim"),
          q6(l2norm($"embedding".cast("array<double>"))).as("l2_norm"))
        .orderBy($"doc_id")
    }),

    // L4 (scale path #2): IVF-style ANN. Cell assignment is in-row
    // argmax-dot against the 16 equal-norm ±1 centroids (first-max
    // tiebreak = smallest centroid id); each probe searches its
    // nprobe=4 best cells only. Unlike ann_lsh's sign-signature
    // buckets, cells partition the corpus — the natural layout key for
    // a 100-TB vector table (write bucketed by cell; a probe then
    // touches 4/16 of the data, pruned at the scan). The oracle
    // replicates the identical literal centroids, so this one IS
    // hash-checkable end-to-end.
    "ivf_ann" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      def dotsCol(v: Column): Column =
        transform(array((0 until 16).map(planeLit): _*), p => F.dotd(v, p))
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      // Corpus: one in-row argmax → cell; no explode, no extra shuffle.
      val corpus = emb
        .select($"vec_id", $"v", dotsCol($"v").as("dots"))
        .select($"vec_id", $"v",
          array_position($"dots", array_max($"dots")).as("cell"))
      // Probes (20 rows): explode is fine at probe cardinality.
      val wCell = Window.partitionBy($"probe_id")
        .orderBy($"d".desc, $"cid0")
      val probeCells = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"v".as("pv"),
          posexplode(dotsCol($"v")).as(Seq("cid0", "d")))
        .withColumn("cell", ($"cid0" + 1).cast("long"))
        .withColumn("cr", row_number().over(wCell))
        .filter($"cr" <= 4)
        .select($"probe_id", $"pv", $"cell")
      val wTop = Window.partitionBy($"probe_id")
        .orderBy($"cos_sim".desc, $"vec_id")
      corpus.join(broadcast(probeCells), Seq("cell"))
        .filter($"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id",
          q6(dot($"v", $"pv") / (l2norm($"v") * l2norm($"pv")))
            .as("cos_sim"))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"rn", $"vec_id".as("neighbor_id"), $"cos_sim")
        .orderBy($"probe_id", $"rn")
    }),

    // L2/L3 hybrid: embedding-cosine near-dup at τ=0.99. The raw
    // corpus has no true pairs (max pairwise cosine ≈ 0.51), which
    // would make the oracle row prove only the no-false-positive side
    // — so the query unions in a deterministic planted-duplicate set
    // (scaled copies of vec_id<10, scaled+shifted copies of
    // vec_id∈[10,20), ids offset by 1e6; both perturbations are plain
    // IEEE arithmetic the DuckDB oracle replays exactly). The oracle's
    // all-pairs scan over the same augmented relation must find the
    // same planted pairs the banded LSH path finds: detection AND
    // no-false-positives are now both hash-checked.
    "embed_neardup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val scaled = emb.filter($"vec_id" < 10)
        .select(($"vec_id" + 1000000L).as("vec_id"),
          transform($"v", x => x * lit(1.01)).as("v"))
      val shifted = emb.filter($"vec_id" >= 10 && $"vec_id" < 20)
        .select(($"vec_id" + 1000000L).as("vec_id"),
          transform($"v", x => x * lit(1.01) + lit(0.001)).as("v"))
      // size the banding from the base table's metadata count (+20
      // planted dups) — no eager job over the transformed union
      embedNearDupPairs(emb.unionAll(scaled).unionAll(shifted), 0.99,
        sizeHint = Some(Tables.embeddings(s, dir).count() + 20))
    }),

    // L7 (learned): IVF ANN over k-means centroids — the
    // data-dependent counterpart of ivf_ann's fixed ±1 cells, i.e. the
    // actual index-build path of a production vector store. Centroids
    // come from 3 deterministic Lloyd iterations (IvfIndex: fnv1a-
    // seeded init, argmin-L2 assignment, per-dimension means), the
    // corpus is bucketed by learned cell, probes search their nprobe=4
    // best cells. The centroids are corpus-derived but DETERMINISTIC,
    // so the oracle interpolates the learned values as literals (built
    // from the same [[learnedCents]] cache this query warms — see
    // [[oracle]]): the whole index-BUILD path is hash-checked
    // end-to-end, same as ivf_ann's ±1 literals. PipelineSpec
    // additionally pins determinism, the monotone Lloyd objective, and
    // a recall floor vs the exact scan.
    "ivf_ann_learned" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.IvfIndex
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = learnedCents(s, dir)
      val corpus = IvfIndex.assignCells(emb, cents)
      val wCell = Window.partitionBy($"probe_id")
        .orderBy($"score".desc, $"cid0")
      val probeCells = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"v".as("pv"),
          posexplode(IvfIndex.scoresCol($"v", cents)).as(Seq("cid0", "score")))
        .withColumn("cell", ($"cid0" + 1).cast("long"))
        .withColumn("cr", row_number().over(wCell))
        .filter($"cr" <= 4)
        .select($"probe_id", $"pv", $"cell")
      val wTop = Window.partitionBy($"probe_id")
        .orderBy($"cos_sim".desc, $"vec_id")
      corpus.join(broadcast(probeCells), Seq("cell"))
        .filter($"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id",
          q6(dot($"v", $"pv") / (l2norm($"v") * l2norm($"pv")))
            .as("cos_sim"))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"rn", $"vec_id".as("neighbor_id"), $"cos_sim")
        .orderBy($"probe_id", $"rn")
    }),

    // L64: semantic cluster profile — the k-means view of the corpus
    // the embedding-side curation decisions read (topic balance,
    // semantic dedup candidates, outlier clusters): every vector
    // assigned to its nearest LEARNED centroid (the ivf_ann_learned
    // cells, same deterministic Lloyd centroids, same first-max
    // tiebreak), then per cluster: size, id range, and the integer
    // cosine-affinity mass (sum of q6-quantized cos(v, centroid)
    // micro-units — order-free, engine-exact; divide by n_vecs for
    // the mean affinity). One scan + one map-combinable aggregate
    // keyed by ≤ k cells; centroids ride the plan as literals — no
    // join, no second pass. Oracle replays assignment AND affinity
    // from the interpolated centroids.
    "semantic_clusters" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.IvfIndex
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = learnedCents(s, dir)
      val centsLit = typedlit(cents.map(_.toSeq).toSeq)
      IvfIndex.assignCells(emb, cents)
        .withColumn("c", element_at(centsLit, $"cell".cast("int")))
        .select($"cell", $"vec_id",
          q6(dot($"v", $"c") / (l2norm($"v") * l2norm($"c"))).as("cos"))
        .groupBy($"cell")
        .agg(count(lit(1)).as("n_vecs"),
          min($"vec_id").as("min_vec"), max($"vec_id").as("max_vec"),
          sum(floor($"cos" * lit(1000000.0) + lit(0.5))).cast("long")
            .as("cos_mass_6"))
        .orderBy($"cell")
    }),

    // L72: incremental index append + drift audit — production vector
    // indexes do NOT relearn centroids per ingest batch: arrivals are
    // assigned to the EXISTING cells (shuffle-free per-row argmax, the
    // L7 assignment), and a drift signal decides when relearning is
    // due. Arrivals = vec_id ≡ 0 mod 7 re-ingested; output per cell:
    // existing/appended counts plus the exact integer cos-affinity
    // mass of each population — appended mass per vector falling
    // below the existing population's is the relearn trigger. The
    // oracle replays assignment AND both masses from the interpolated
    // centroids.
    "ivf_append" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.IvfIndex
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = learnedCents(s, dir)
      val centsLit = typedlit(cents.map(_.toSeq).toSeq)
      IvfIndex.assignCells(emb, cents)
        .withColumn("c", element_at(centsLit, $"cell".cast("int")))
        .select($"cell", $"vec_id",
          when($"vec_id" % 7 === 0, 1L).otherwise(0L).as("is_new"),
          floor(q6(dot($"v", $"c") / (l2norm($"v") * l2norm($"c")))
            * lit(1000000.0) + lit(0.5)).cast("long").as("cos6"))
        .groupBy($"cell")
        .agg(sum(lit(1L) - $"is_new").as("n_existing"),
          sum($"is_new").as("n_appended"),
          sum((lit(1L) - $"is_new") * $"cos6").as("cos_mass_existing_6"),
          sum($"is_new" * $"cos6").as("cos_mass_appended_6"))
        .orderBy($"cell")
    }),

    // L53: product-quantization ANN (ADC scoring) — the compression
    // layer of a production vector index: 4 per-subspace 16-centroid
    // codebooks (learned with the same deterministic Lloyd recipe as
    // ivf_ann_learned, cached per dir) encode each 64-dim vector as 4
    // small codes; a probe precomputes its 4×16 dot table and every
    // corpus vector scores as 4 table lookups summed in codebook
    // order — the raw corpus vectors are never read at scoring time
    // (at scale the codes column is what ships: ~64× less wire than
    // the floats, and it composes with the IVF cell layout for
    // IVF-PQ). The scored scan is the cosine_knn brute-force shape at
    // test scale (broadcast probes; at 100 TB the IVF prune runs
    // first); the oracle interpolates the learned codebooks and
    // replays encode + ADC exactly.
    "pq_ann" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      pqAdcTop5(s, dir)
        .select($"probe_id", $"rn", $"vec_id".as("neighbor_id"), $"adc")
        .orderBy($"probe_id", $"rn")
    }),

    // L60: ANN quality report — "measure, don't guess" as a
    // first-class DRIVER-CHECKED query: per probe, how many of the
    // exact inner-product top-5 the PQ-ADC ranking recovered. The
    // evaluation both engines replay end-to-end (codes, tables, both
    // rankings, the overlap count) is the number a 100 TB vector
    // deployment watches when retuning m/k — here it is
    // hash-gated, not a narrative claim.
    "ann_recall" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val probes = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"v".as("pv"))
      val wEx = Window.partitionBy($"probe_id")
        .orderBy($"d".desc, $"vec_id")
      val exact = emb.join(broadcast(probes), $"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id", q6(dot($"v", $"pv")).as("d"))
        .withColumn("rn", row_number().over(wEx).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"vec_id")
      val approx = pqAdcTop5(s, dir)
        .select($"probe_id", $"vec_id", lit(1L).as("hit"))
      exact.join(approx, Seq("probe_id", "vec_id"), "left")
        .groupBy($"probe_id")
        .agg(sum(coalesce($"hit", lit(0L))).as("n_hits"))
        .orderBy($"probe_id")
    }),

    // L53+L7: IVF-PQ — the standard production ANN index shape,
    // composing the two driver-checked pieces: the IVF cell prune
    // (probe searches its nprobe=4 best learned cells, touching
    // nprobe/k of the corpus) and PQ-ADC scoring inside the surviving
    // cells (reading only the 4 codes, never the floats). Both
    // codebook families come from the per-dir deterministic Lloyd
    // caches, so the oracle replays cell assignment, PQ encode, and
    // ADC scoring end-to-end from interpolated literals.
    "ivfpq_ann" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.{IvfIndex, PqIndex}
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = learnedCents(s, dir)
      val books = pqBooks(s, dir)
      val corpus = PqIndex.encode(IvfIndex.assignCells(emb, cents), books)
        .drop("v")
      val wCell = Window.partitionBy($"probe_id")
        .orderBy($"score".desc, $"cid0")
      val pdCols = (1 to PqM).map(j => col(s"pd_$j"))
      val probeCells = PqIndex.probeTables(
          emb.filter($"vec_id" < 20)
            .select($"vec_id".as("probe_id"), $"v"), "v", books)
        .select(($"probe_id" +: pdCols) :+
          posexplode(IvfIndex.scoresCol($"v", cents)).as(Seq("cid0", "score")): _*)
        .withColumn("cell", ($"cid0" + 1).cast("long"))
        .withColumn("cr", row_number().over(wCell))
        .filter($"cr" <= 4)
        .select($"probe_id" +: $"cell" +: pdCols: _*)
      val wTop = Window.partitionBy($"probe_id")
        .orderBy($"adc".desc, $"vec_id")
      corpus.join(broadcast(probeCells), Seq("cell"))
        .filter($"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id", q6(PqIndex.adcDot(PqM)).as("adc"))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"rn", $"vec_id".as("neighbor_id"), $"adc")
        .orderBy($"probe_id", $"rn")
    }),

    // L1-adjacent: deterministic hash-based train/valid/test split
    // (operators.Sampling) — md5-keyed thresholds, so the selection is
    // retry-stable, partitioning-invariant, shuffle-free, and exactly
    // replicable by the oracle (unlike rand()-based sampling).
    "hash_split" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("split",
          graft.operators.Sampling.splitLabel($"doc_id", 0.8, 0.1))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"lang", $"split")
    }),

    // L36: exact corpus heavy hitters WITHOUT a vocabulary shuffle —
    // same one-sided-overshoot-then-confirm shape as the bloom pass:
    // a single ObjectHashAggregate of cap-bounded Misra–Gries
    // summaries (a few KB per partition, whatever the vocabulary)
    // yields a candidate set PROVABLY ⊇ every term with freq ≥ n/64
    // (cap 256 ⇒ guarantee at n/257); the exact recount then touches
    // only those ≤ 256 candidates (broadcast semi-join + a ≤ 256-key
    // groupBy), so the final (term, cnt) set is exact and the full
    // term domain never shuffles.
    "heavy_hitters" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      def toks = Tables.documents(s, dir)
        .select(explode(split($"text", " ")).as("term"))
        .filter(length($"term") > 0)
      val summary = toks
        .agg(graft.functions.GraftFunctions.misra_gries($"term", 256).as("s"))
        .select($"s.n".as("n"), $"s.items.key".as("cands"))
        .localCheckpoint() // 1 row; both branches below reuse it
      val cands = summary.select(explode($"cands").as("term"))
      toks.join(broadcast(cands), Seq("term"), "left_semi")
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(summary.select($"n")))
        .filter($"cnt" * 64 >= $"n")
        .select($"term", $"cnt")
        .orderBy($"cnt".desc, $"term")
    }),

    // L36 grouped: per-SOURCE exact heavy terms — the mixture-audit
    // sibling of heavy_hitters ("which terms dominate each source's
    // slice", the per-domain boilerplate detector). Same two-pass
    // shape, grouped: one ObjectHashAggregate of per-source MG
    // summaries (each a few KB — a million sources is a few GB spread
    // over the cluster, and the raw vocabulary never shuffles), then
    // an exact recount of candidate (source, term) pairs only,
    // broadcast-semi-joined before the count shuffle. Exactness: a
    // term at freq ≥ n_s/64 clears the per-source MG guarantee
    // threshold n_s/257, so candidates cover every qualifying term
    // and the recount+filter restores exact counts.
    "source_heavy_terms" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      def toks = Tables.documents(s, dir)
        .select($"source", explode(split($"text", " ")).as("term"))
        .filter(length($"term") > 0)
      val summaries = toks.groupBy($"source")
        .agg(graft.functions.GraftFunctions.misra_gries($"term", 256).as("s"))
        .select($"source", $"s.n".as("n"), $"s.items.key".as("cands"))
        .localCheckpoint() // one row per source; both branches reuse it
      val cands = summaries.select($"source", explode($"cands").as("term"))
      toks.join(broadcast(cands), Seq("source", "term"), "left_semi")
        .groupBy($"source", $"term").agg(count(lit(1)).as("cnt"))
        .join(broadcast(summaries.select($"source", $"n")), Seq("source"))
        .filter($"cnt" * 64 >= $"n")
        .select($"source", $"term", $"cnt")
        .orderBy($"source", $"cnt".desc, $"term")
    }),

    // S11: schema evolution across parquet snapshots — a corpus that
    // gained columns mid-history must still read as ONE relation:
    // snapshot A carries (doc_id, lang), snapshot B (doc_id, source,
    // n_chars); a mergeSchema read unions the schemas and NULL-fills
    // the absent columns. The query writes both snapshots at
    // construction (write-once per dir) and profiles the merged
    // relation; the oracle replays the union-by-name semantics from
    // the base table, so the merge-read path itself is driver-checked.
    "schema_evolution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val root = schemaEvoCache.computeIfAbsent(dir, d => {
        val docs = Tables.documents(s, d)
        val r = s"${System.getProperty("java.io.tmpdir")}/graft_schema_evo_" +
          math.abs(d.hashCode).toString
        docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"lang")
          .write.mode("overwrite").parquet(s"$r/snap=a")
        docs.filter($"doc_id" % 2 === 1)
          .select($"doc_id", $"source", $"n_chars")
          .write.mode("overwrite").parquet(s"$r/snap=b")
        r
      })
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/snap=a", s"$root/snap=b")
        .agg(count(lit(1)).as("n_rows"),
          count($"lang").as("nn_lang"),
          count($"source").as("nn_source"),
          count($"n_chars").as("nn_chars"),
          count_distinct($"doc_id").as("ndv_doc"))
    }),

    // L42: per-source length outliers — the distribution-shift alarm
    // of a mixture pipeline: docs whose token count sits > 2σ from
    // their own source's mean (truncated scrapes, concatenation bugs,
    // spam padding). Mean/variance come from EXACT integer sums
    // (count, Σx, Σx²) so the z arithmetic is identical IEEE both
    // engines; one map-combinable stats agg + one broadcast-sized
    // join back (stats relation = one row per source).
    "length_outliers" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      val stats = docs.groupBy($"source").agg(
        count(lit(1)).as("n"), sum($"n_tokens").as("s1"),
        sum($"n_tokens" * $"n_tokens").as("s2"))
      val mean = $"s1".cast("double") / $"n"
      val variance = $"s2".cast("double") / $"n" - mean * mean
      docs.join(broadcast(stats), "source")
        .filter(variance > 0.0)
        .select($"doc_id", $"source", $"n_tokens",
          q6(($"n_tokens".cast("double") - mean) / sqrt(variance)).as("z"))
        .filter(abs($"z") > 2.0)
        .orderBy($"doc_id")
    }),

    // L47: per-source discrete length quantiles — the mixture report
    // ("how long are each source's docs") a curation run reads before
    // setting length gates. DISCRETE quantiles (value at row
    // ceil(p·n), 1-based over the (n_tokens, doc_id) order) — pure
    // integer index arithmetic, no interpolation, so both engines
    // select the identical element; one per-source window + one
    // conditional agg. The (n_tokens, doc_id) tiebreak makes the
    // selected row unique even among equal lengths.
    "source_length_quantiles" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir).select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      val w = Window.partitionBy($"source").orderBy($"n_tokens", $"doc_id")
      val ranked = docs
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"source"))
          .cast("long"))
      def at(p: Double) =
        max(when($"rn" === greatest(lit(1L),
          ceil(lit(p) * $"n").cast("long")), $"n_tokens"))
      ranked.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          at(0.5).as("p50"), at(0.9).as("p90"), at(0.99).as("p99"))
        .orderBy($"source")
    }),

    // L45: n-gram novelty score — the inverse of dup_spans: what
    // fraction of a doc's distinct 3-gram shingles appears in NO
    // other document. High novelty = unique content worth keeping;
    // near-zero = templated/boilerplate. Counting runs on shingle
    // HASHES (text never shuffles; exact_dedup's birthday-bound
    // contract), df via one gram-keyed count, reassembly via one
    // doc-keyed sum — both map-combinable.
    "novelty_score" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val grams = withShingleHashes(
        Tables.documents(s, dir).select($"doc_id", $"text")
          .repartition($"doc_id"), Seq("doc_id"))
        .select($"doc_id", explode($"hs").as("g"))
      val df = grams.groupBy($"g")
        .agg(count_distinct($"doc_id").as("df"))
      grams.join(df, "g")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"df" === 1, 1L).otherwise(0L)).as("n_unique"))
        .select($"doc_id", $"n_grams", $"n_unique",
          q6($"n_unique".cast("double") / $"n_grams").as("novelty"))
        .orderBy($"doc_id")
    }),

    // L41: BPE merge-candidate table — the first iteration of
    // byte-pair-encoding tokenizer training: counts of every adjacent
    // character pair over the corpus, top-50. The merge loop repeats
    // this count-and-merge; the count is the distributed heavy step
    // (key space bounded by alphabet², map-combinable, output capped
    // by TakeOrderedAndProject whatever the corpus size).
    "bpe_pairs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(length($"text") >= 2)
        .select(explode(transform(sequence(lit(1), length($"text") - 1),
          i => $"text".substr(i, lit(2)))).as("pair"))
        .groupBy($"pair").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"pair")
        .limit(50)
    }),

    // L90: BPE merge TRAINER — iterate L41's candidate counting into
    // the actual tokenizer-training loop: k rounds of count adjacent
    // pairs → argmax (count desc, pair asc — deterministic tie-break)
    // → apply the merge corpus-wide. The 100 TB shape is the one real
    // trainers use: the corpus is scanned ONCE into a word-frequency
    // table (vocabulary-bounded — Heaps' law, not corpus-bounded);
    // every round then touches only that table with one
    // map-combinable pair count. Symbol sequences live as
    // delimiter-wrapped strings (U+001F sym U+001F per symbol, U+001F
    // any printable char so joined-string order == tuple order) and
    // the merge is ONE literal string replace — both engines' replace
    // is left-to-right non-overlapping, i.e. exactly greedy BPE
    // application, so the spelling is engine-exact by construction.
    // The argmax is a one-row broadcast folded into the plan (no
    // driver collect); the oracle unrolls all k rounds as CTEs
    // replaying count → argmax → merge → vocab census verbatim.
    "bpe_train" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      bpeChain(s, dir)._1.orderBy($"merge_round")
    }),

    // L92: tokenizer APPLICATION — the other half of the trainer
    // pair: encode the corpus with bpe_train's learned merge table
    // and report the per-source compression census (words, chars,
    // BPE tokens, chars/token) a mixture owner reads before fixing
    // token budgets. The corpus is never re-scanned per round: the
    // trained chain's FINAL word table carries each distinct word's
    // symbol count, and per-source totals are one (source, word)
    // count join — Σ cnt·len(w) and Σ cnt·syms(w) in exact integers.
    "bpe_apply" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val U = "\u001f"
      val fin = bpeChain(s, dir)._2
        .select($"w",
          size(split(trim($"seq", U), U + U)).cast("long").as("n_syms"))
      val sourceWords = Tables.documents(s, dir)
        .select($"source", explode(split($"text", " ")).as("w"))
        .filter($"w" =!= "")
        .groupBy($"source", $"w").agg(count(lit(1)).as("cnt"))
      sourceWords.join(fin, "w")
        .groupBy($"source")
        .agg(sum($"cnt").as("n_words"),
          sum($"cnt" * length($"w")).as("n_chars"),
          sum($"cnt" * $"n_syms").as("n_tokens"))
        .select($"source", $"n_words", $"n_chars", $"n_tokens",
          q6($"n_chars".cast("double") / $"n_tokens".cast("double"))
            .as("chars_per_token"))
        .orderBy($"source")
    }),

    // L20 audit: per-cluster quality stats over the near-dup closure —
    // the post-dedup sanity report ("are my clusters tight or is the
    // threshold admitting junk"): size, pair count, min and mean
    // within-cluster Jaccard per cluster. Pairs and components are the
    // L2/L20 machinery unchanged; the mean is summed in QUANTIZED
    // INTEGER space (floor(j*1e6+0.5) per pair) so the order-free sum
    // is engine-exact, then divided back once. Output is bounded by
    // cluster count.
    "cluster_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // the shared per-dir pair checkpoint feeds BOTH the closure and
      // the stats join — the LSH pipeline (the heavy stage) runs once
      // per JVM for the whole closure/audit family
      val pairs = nearDupPairsCached(s, dir)
      val comp = nearDupComponents(s, dir)
      val sizes = comp.groupBy($"component".as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      pairs
        .join(comp.select($"node".as("doc_a"), $"component".as("cluster_id")),
          "doc_a")
        .groupBy($"cluster_id")
        .agg(count(lit(1)).as("n_pairs"),
          min($"jaccard").as("min_jaccard"),
          sum(floor($"jaccard" * 1000000.0 + 0.5).cast("long")).as("__jsum"))
        .join(sizes, "cluster_id")
        .select($"cluster_id", $"cluster_size", $"n_pairs", $"min_jaccard",
          q6($"__jsum".cast("double") / ($"n_pairs" * 1000000.0))
            .as("mean_jaccard"))
        .orderBy($"cluster_id")
    }),

    // L20 policy variant: near-dup dedup keeping the BEST member per
    // cluster — min-id canonicals (neardup_dedup) are reproducible
    // but arbitrary; a curation pipeline keeps the highest-QUALITY
    // member (ties → smallest id, still deterministic). Same closure
    // machinery; the canonical choice is one per-cluster argmax over
    // (quality, −doc_id) struct ordering.
    "neardup_dedup_quality" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val comp = nearDupComponents(s, dir)
      val q = docs.select($"doc_id".as("node"), qualityOf($"text").as("quality"))
      val canon = comp.join(q, "node")
        .groupBy($"component")
        .agg(max(struct($"quality", (-$"node").as("negid"))).as("m"))
        .select($"component", (-$"m.negid").as("keep_doc"))
      val dropped = comp.join(canon, "component")
        .filter($"node" =!= $"keep_doc")
        .select($"node".as("doc_id"))
      docs.join(dropped, Seq("doc_id"), "left_anti")
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // L26 sibling: random-projection dimensionality reduction — the
    // 64d→16d shuffle/storage lever BEFORE quantization: project onto
    // the 16 deterministic ±1 hyperplanes (norm 8 exactly, so dot/8
    // is the unit-direction coordinate), quantize each lane to 1e-6
    // on the integer grid (CSV lanes — driver rows are scalar), and
    // carry the JL norm estimate ||p||·√(64/16) next to the true norm
    // as the per-row quality audit. Pure per-row projection, no
    // shuffle; the oracle replays the identical plane literals.
    "embed_project" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val lanes = emb.select($"vec_id", $"v",
        array((0 until 16).map(h =>
          floor(dot($"v", planeLit(h)) / 8.0 * 1000000.0 + 0.5)
            .cast("long")): _*).as("p"))
      lanes.select($"vec_id",
        array_join(transform($"p", x => x.cast("string")), ",").as("p_csv"),
        q6(sqrt(foldSum(transform($"p", x =>
          (x.cast("double") / 1000000.0) * (x.cast("double") / 1000000.0))))
          * 2.0).as("norm_est"),
        q6(l2norm($"v")).as("norm_in"))
        .orderBy($"vec_id")
    }),

    // L80: distributed Gram matrix — X^T X over the embedding column
    // in ONE aggregation pass via GramMatrixAgg: task state is the
    // d·(d+1)/2 upper-triangle of exact integer micro-sums (O(d²)
    // however many vectors), partials combine map-side, and only 2080
    // longs cross the wire per partition. The covariance/PCA/whitening
    // primitive: at 10⁹ vectors the plan is IDENTICAL — no per-pair
    // explode (which would shuffle N·d² rows), no driver math. The
    // (k → i,j) unflattening is a 2080-row static broadcast; the
    // oracle replays the quantized products from the unnested lists.
    "gram_matrix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = PqDim // the embeddings fixture's vector dimensionality
      val pairIdx = s.createDataFrame(
        (for { i <- 0 until d; j <- i until d }
          yield (i * d - i * (i - 1) / 2 + (j - i), i, j)))
        .toDF("k", "i", "j")
      Tables.embeddings(s, dir)
        .agg(graft.functions.GraftFunctions.gram_matrix($"embedding", d)
          .as("g"))
        .select($"g.cnt".as("n_vecs"), posexplode($"g.cells"))
        .withColumnRenamed("pos", "k").withColumnRenamed("col", "micro")
        .join(broadcast(pairIdx), "k")
        .select($"i", $"j", $"n_vecs",
          ($"micro".cast("double") / lit(1000000.0)).as("gram"))
        .orderBy($"i", $"j")
    }),

    // L84: one-pass correlation matrix — Pearson r for every feature
    // pair of the embedding, derived ENTIRELY from one GramMatrixAgg
    // pass via the constant-padding trick: appending 1.0 to each
    // vector makes the (i, d) cells the per-dimension sums and the
    // (d, d) cell the row count (×10⁶), so ONE O(d²)-state aggregate
    // yields every Σxᵢxⱼ, Σxᵢ and n. r(i,j) = (n·Sij − Si·Sj) /
    // √((n·Sii − Si²)(n·Sjj − Sj²)) — numerator and both variance
    // terms are exact LONG arithmetic on micro-sums (headroom: with
    // micro cells ~5e8 the cross products sit ~2.5e17 < 2⁶³; at 10⁹+
    // rows switch the derivation to DECIMAL(38,0)); the only doubles
    // are the final ÷/√ on exactly-reproduced operands, q6-quantized.
    // The unflatten/derivation joins run on the 2145-cell relation —
    // metadata-sized whatever the corpus.
    "corr_matrix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = PqDim
      val dp = d + 1
      val pairIdx = s.createDataFrame(
        (for { i <- 0 until dp; j <- i until dp }
          yield (i * dp - i * (i - 1) / 2 + (j - i), i, j)))
        .toDF("k", "i", "j")
      val cells = Tables.embeddings(s, dir)
        .select(concat($"embedding".cast("array<double>"),
          array(lit(1.0d))).as("v"))
        .agg(graft.functions.GraftFunctions.gram_matrix($"v", dp).as("g"))
        .select(posexplode($"g.cells"))
        .withColumnRenamed("pos", "k").withColumnRenamed("col", "c")
        .join(broadcast(pairIdx), "k")
      val nMicro = cells.filter($"i" === d && $"j" === d)
        .select($"c".as("n_micro"))
      val sums = cells.filter($"i" < d && $"j" === d)
        .select($"i".as("dim"), $"c".as("s"))
      val diag = cells.filter($"i" === $"j" && $"i" < d)
        .select($"i".as("dim"), $"c".as("ss"))
      val moments = broadcast(sums.join(diag, "dim"))
      cells.filter($"i" < $"j" && $"j" < d)
        .join(moments.select($"dim".as("i"), $"s".as("si"), $"ss".as("sii")), "i")
        .join(moments.select($"dim".as("j"), $"s".as("sj"), $"ss".as("sjj")), "j")
        .crossJoin(broadcast(nMicro))
        .select($"i", $"j",
          q6(($"n_micro" * $"c" - $"si" * $"sj").cast("double") /
            sqrt(($"n_micro" * $"sii" - $"si" * $"si").cast("double") *
              ($"n_micro" * $"sjj" - $"sj" * $"sj").cast("double")))
            .as("corr_q6"))
        .orderBy($"i", $"j")
    }),

    // L81: PMI collocations — the classic phrase-mining score over
    // adjacent word pairs: pmi = ln(p(x,y) / (p(x)·p(y))) with
    // p(x,y) = c_xy/B and p(x) = c_x/N. Computed entirely in exact
    // integer ln-micro units (the zipf_fit lane: each ln quantized
    // per row to 1e-6, then SUMMED as longs — order-free and
    // engine-exact). Shapes: bigrams come from a per-doc slice
    // (never a positional self-join), the min-count filter lands
    // BEFORE the two vocabulary-keyed count joins (equi joins that
    // shuffle on the word — broadcast would not survive a 100 TB
    // vocabulary), and N/B ride a one-row broadcast.
    "pmi_collocations" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables.documents(s, dir).select(split($"text", " ").as("ws"))
      val uni = toks.select(explode($"ws").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c"))
      val big = toks.filter(size($"ws") >= 2)
        .select(explode(transform(
          sequence(lit(1), size($"ws") - 1),
          i => struct(element_at($"ws", i).as("w1"),
            element_at($"ws", i + 1).as("w2")))).as("p"))
        .select($"p.w1".as("w1"), $"p.w2".as("w2"))
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_xy"))
        .filter($"c_xy" >= 5)
      val totals = toks.agg(
        sum(size($"ws")).cast("long").as("n_tok"),
        sum(greatest(size($"ws") - 1, lit(0))).cast("long").as("n_big"))
      def l6(c: org.apache.spark.sql.Column) =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      big
        .join(uni.select($"w".as("w1"), $"c".as("c1")), "w1")
        .join(uni.select($"w".as("w2"), $"c".as("c2")), "w2")
        .crossJoin(broadcast(totals))
        .withColumn("pmi_micro", l6($"c_xy") + lit(2L) * l6($"n_tok") -
          l6($"n_big") - l6($"c1") - l6($"c2"))
        .select($"w1", $"w2", $"c_xy",
          ($"pmi_micro".cast("double") / lit(1000000.0)).as("pmi"))
        .orderBy($"pmi".desc, $"w1", $"w2")
        .limit(50)
    }),

    // L2 incremental: near-dup detection of a NEW batch against the
    // EXISTING corpus — the continuous-ingestion sibling of
    // incremental_dedup, one notch fuzzier: "is today's crawl a
    // near-copy of anything we already hold". Scale shape: the
    // corpus's band keys are its persisted LSH index (16 bytes + band
    // id per row; text stays at rest); the batch's bands SEMI-JOIN
    // that index first, so only corpus members co-bucketed with the
    // batch enter pair generation at all — work scales with the
    // increment, not the corpus. Pair generation itself reuses the
    // skew-proof CandidatePairs path (batch ids sign-flipped so cross
    // pairs are exactly the a<0<=b rows), and the exact string-level
    // Jaccard verify touches text only for candidates. The oracle
    // replays the full cross-product Jaccard scan over the same
    // batch/corpus split — banding recall and the verify are both
    // driver-checked. Probes: appended-token twins of corpus docs
    // planted in the batch (jaccard (W-2)/(W-1) ≥ τ for W ≥ 4).
    "incremental_neardup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.documents(s, dir).select($"doc_id", $"text")
      val corpus = base.filter($"doc_id" % 10 =!= 0)
      val batch = base.filter($"doc_id" % 10 === 0)
        .unionAll(corpus.filter($"doc_id" % 23 === 3)
          .select(($"doc_id" + 10000000L).as("doc_id"),
            concat($"text", lit(" incrementalprobe")).as("text")))
      def bands(docs: DataFrame) = minhashBandsOf(docs, MinHashJaccardTau)
      // sign-flip batch ids so the union's a<b pairs classify by sign
      val batchBands = bands(batch)
        .select((-$"doc_id" - 1L).as("doc_id"), $"band_no", $"band_hash")
      val corpusBands = bands(corpus)
        .join(batchBands.select($"band_no", $"band_hash"),
          Seq("band_no", "band_hash"), "left_semi")
      // unionByName: the semi-join above reorders columns (USING keys
      // first), so a positional union would shear doc_id into band_hash
      val cand = graft.operators.CandidatePairs.fromBuckets(
          batchBands.unionByName(corpusBands),
          Seq("band_no", "band_hash"), "doc_id", "doc_a", "doc_b")
        .filter($"doc_a" < 0 && $"doc_b" >= 0)
        .select((-$"doc_a" - 1L).as("batch_doc"), $"doc_b".as("corpus_doc"))
      val batchTexts = batch.select($"doc_id".as("batch_doc"),
        $"text".as("text_a"))
      val corpusTexts = corpus.select($"doc_id".as("corpus_doc"),
        $"text".as("text_b"))
      cand.join(batchTexts, "batch_doc").join(corpusTexts, "corpus_doc")
        .select($"batch_doc", $"corpus_doc",
          shingles($"text_a").as("sh_a"), shingles($"text_b").as("sh_b"))
        .select($"batch_doc", $"corpus_doc",
          q6(size(array_intersect($"sh_a", $"sh_b")).cast("double") /
            size(array_union($"sh_a", $"sh_b"))).as("jaccard"))
        .filter($"jaccard" >= MinHashJaccardTau)
        .orderBy($"batch_doc", $"corpus_doc")
    }),

    // L96: the CONTINUOUS-ingestion curation cycle as ONE funnel —
    // the incremental twin of full_curation, composing the round's
    // incremental machinery end to end: a batch arrives → exact
    // dedup against the corpus (16-byte fingerprints, text never
    // shuffles) → near-dedup against the corpus (the banded
    // incremental probe: corpus bands semi-joined by batch bands,
    // work ∝ batch) → within-batch near-dup closure folded into the
    // corpus labeling via ConnectedComponents.merge (work ∝ touched
    // components) → admit canonicals. Planted probes force every
    // stage to fire: exact copies of corpus docs, appended-token
    // near-twins, and genuine fresh docs. Output = the stage funnel
    // (arrived / after each stage / admitted / corpus after) the
    // ingest operator reads daily; the oracle replays all four
    // stages in SQL (text IN, brute cross Jaccard, recursive
    // closure), so any stage diverging — or corrupting a later
    // stage's input — fails the hash.
    "incremental_curation" -> ((s: SparkSession, dir: String) => {
      incrementalCurationFunnel(s, dir)
    }),

    // L38: fuzzy key matching / entity resolution at distance 1 —
    // SymSpell deletion-variant blocking: candidates are an equi-join
    // on exploded deletion neighborhoods (|s|+1 slim rows per input,
    // bounded buckets), never an all-pairs cartesian, and recall is
    // exact BY CONSTRUCTION (distance-≤1 strings always share a
    // variant), so the levenshtein verify only removes false
    // candidates. The oracle runs the brute-force all-pairs scan the
    // blocking replaces — if blocking ever lost a pair, the hash
    // compare would catch it. Probes: typo'd names (one substituted
    // character) under negated keys.
    "fuzzy_match" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.customer(s, dir).select($"c_custkey", $"c_name")
      val probes = base.filter($"c_custkey" % 37 === 5)
        .select((-$"c_custkey").as("c_custkey"),
          concat($"c_name".substr(1, 9), lit("X"),
            $"c_name".substr(lit(11), length($"c_name") - 10)).as("c_name"))
      graft.operators.FuzzyMatch.pairsWithin1(
          base.unionByName(probes), "c_custkey", "c_name")
        .select($"key_a", $"key_b", $"dist".cast("long").as("dist"))
        .orderBy($"key_a", $"key_b")
    }),

    // L83: entity resolution — the COMPOSED record-linkage chain:
    // dirty-record union → SymSpell d≤1 candidate pairs (FuzzyMatch;
    // blocking + exact levenshtein verify, skew-proofed through
    // CandidatePairs) → ConnectedComponents transitive closure →
    // per-entity audit. The classic MDM/dedup product flow in one
    // oracle row: two independently-corrupted copies of a record
    // (substitutions at DIFFERENT positions — d=2 from each other,
    // invisible to direct d≤1 matching) link only TRANSITIVELY
    // through their clean parent, which is exactly what the closure
    // is for. Keys are document text prefixes (real entropy — the
    // fuzzy_match2 note: sequential zero-padded ids make d≤1 linkage
    // degenerate by construction). Oracle = brute all-pairs
    // levenshtein + recursive-CTE closure.
    "record_linkage" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.documents(s, dir)
        .select($"doc_id".as("rid"), $"text".substr(1, 20).as("k"))
      val dirtyA = base.filter($"rid" % 37 === 5)
        .select((-$"rid" - 1L).as("rid"),
          concat($"k".substr(1, 8), lit("X"),
            $"k".substr(lit(10), length($"k") - 9)).as("k"))
      val dirtyB = base.filter($"rid" % 37 === 5)
        .select((-$"rid" - 5000000L).as("rid"),
          concat($"k".substr(1, 14), lit("Y"),
            $"k".substr(lit(16), length($"k") - 15)).as("k"))
      val records = base.unionByName(dirtyA).unionByName(dirtyB)
      val pairs = graft.operators.FuzzyMatch
        .pairsWithin(records, "rid", "k", 1)
      graft.operators.ConnectedComponents
        .components(pairs, "key_a", "key_b")
        .groupBy($"component".as("entity"))
        .agg(count(lit(1)).as("n_records"),
          sum(when($"node" < 0L, 1L).otherwise(0L)).as("n_dirty"),
          min($"node").as("min_id"), max($"node").as("max_id"))
        .orderBy($"entity")
    }),

    // L38 at distance 2: the same SymSpell construction one deletion
    // deeper (two-deletion neighborhoods, ~L²/2 variants per key —
    // the documented space/recall trade). The key space matters at
    // distance 2: sequential zero-padded ids (customer names) make a
    // DENSE match graph — any two ids differing in ≤ 2 digit
    // positions match, so the pair OUTPUT is quadratic BY DEFINITION
    // (measured 80 s at sf0.1 — dist-2 dedup of near-sequential keys
    // is a semantic pathology, not an operator one). Document text
    // prefixes carry real entropy (475/500 distinct at sf0.01), so
    // matches are sparse and the planted probes carry the mechanism.
    // Probes: TWO adjacent substitutions, invisible to distance-1
    // matching; the brute all-pairs oracle checks recall AND
    // precision.
    "fuzzy_match2" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.documents(s, dir)
        .select($"doc_id", $"text".substr(1, 20).as("k"))
      val probes = base.filter($"doc_id" % 37 === 5)
        .select((-$"doc_id" - 1L).as("doc_id"),
          concat($"k".substr(1, 8), lit("XY"),
            $"k".substr(lit(11), length($"k") - 10)).as("k"))
      graft.operators.FuzzyMatch.pairsWithin(
          base.unionByName(probes), "doc_id", "k", 2)
        .select($"key_a", $"key_b", $"dist".cast("long").as("dist"))
        .orderBy($"key_a", $"key_b")
    }),

    // L37: deterministic weighted sampling without replacement
    // (Efraimidis–Spirakis): rank by -ln(u)/w with u drawn from the
    // keyed md5 hash — the top-50 by ascending key IS a weight-
    // proportional sample, retry-stable and partitioning-invariant
    // like every sampler here (never rand()). The score is quantized
    // per row pre-ranking so both engines order identically; the scan
    // is a TakeOrderedAndProject (per-partition top-50, merge of 50s).
    "weighted_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val u = (graft.operators.Sampling.keyHash32($"doc_id", "wsamp:v1:") +
        lit(1L)).cast("double") / lit(4294967296.0) // in (0, 1]
      val top = Tables.documents(s, dir)
        .filter($"n_chars" > 0)
        .select($"doc_id", $"n_chars",
          floor(-log(u) / $"n_chars" * lit(1.0e9) + lit(0.5))
            .cast("long").as("qs"))
        .orderBy($"qs".asc, $"doc_id")
        .limit(50)
      top.withColumn("rank",
          row_number().over(Window.orderBy($"qs", $"doc_id")).cast("long"))
        .select($"rank", $"doc_id", $"n_chars", $"qs")
        .orderBy($"rank")
    }),

    // L20b: stratified exact-k sample — "exactly 20 uniform docs per
    // language" (eval-set carving, per-stratum inspection pulls). The
    // uniform order is the keyed md5 hash (retry-stable, partitioning-
    // invariant, oracle-replayable — never rand()); exact-k per
    // stratum is row_number ≤ k, which Spark 4 plans as a
    // WindowGroupLimit: each map task keeps at most k rows per
    // stratum BEFORE the shuffle, so the sample — not the corpus —
    // moves.
    "stratified_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val k = 20
      val w = Window.partitionBy($"lang").orderBy($"hv", $"doc_id")
      Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          graft.operators.Sampling.keyHash32($"doc_id", "strat:v1:").as("hv"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= k)
        .select($"lang", $"rn", $"doc_id")
        .orderBy($"lang", $"rn")
    }),

    // L21: deterministic per-stratum mixture resampling — the
    // data-mixing knob (halve the dominant crawl, double a rare
    // language, drop a stratum outright; zh rides the default rate).
    // A rate's whole part repeats rows unconditionally; its fractional
    // part is a keyed-hash Bernoulli — both folded to integer literals
    // (Sampling.baseCopies/fracThreshold32) so the oracle replays the
    // identical selection. No shuffle, no rand(), nothing driver-side.
    "mixture_resample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Sampling.resampleMixture(
          Tables.documents(s, dir), $"lang", $"doc_id", MixtureRates)
        .select($"doc_id", $"lang", $"copy_no")
        .orderBy($"doc_id", $"copy_no")
    }),

    // L2 guard rail: the candidate-pair budget, driver-checked. Docs
    // bucketed by a plain column (lang — ~100 members each at sf0.01,
    // C(100,2) ≈ 4950 pairs) run through fromBucketsBudgeted with
    // K=100: each bucket keeps its n*=15 smallest doc_ids and emits
    // their first 100 index-lex pairs. The contract is pure SQL (no
    // hash identity), so unlike the LSH front ends the budget
    // semantics themselves get a DuckDB oracle.
    "pair_budget" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bucketed = Tables.documents(s, dir)
        .select($"lang".as("bucket"), $"doc_id")
      graft.operators.CandidatePairs.fromBucketsBudgeted(
          bucketed, Seq("bucket"), "doc_id", "doc_a", "doc_b",
          bucketCap = 64, maxPairsPerBucket = 100L)
        .pairs.orderBy($"doc_a", $"doc_b")
    }),

    // L-curation: C4-style cross-corpus boilerplate line removal
    // (operators.TextCleanup.dropBoilerplateLines). Shuffles are keyed
    // by the 128-bit line fingerprint, the hot-line set broadcasts,
    // and all-boilerplate docs survive as empty text — the probe docs
    // carry the mechanism (the corpus has no newlines).
    "line_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(boilerplateProbes.toDF("doc_id", "text"))
      graft.operators.TextCleanup.dropBoilerplateLines(docs, minDocs = 2)
        .orderBy($"doc_id")
    }),

    // L-curation: PII redaction + audit counts — a narrow per-row
    // projection (no shuffle, codegen'd regex), patterns restricted to
    // the Java/RE2-identical regex subset so the oracle runs the SAME
    // patterns. Counts are over the original text; replacement order
    // (email, ip, phone) is part of the contract.
    "pii_redact" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.TextCleanup
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(piiProbes.toDF("doc_id", "text"))
      docs.select($"doc_id" +:
          TextCleanup.redactPii($"text").as("clean_text") +:
          TextCleanup.piiCounts($"text"): _*)
        .orderBy($"doc_id")
    }),

    // L-quality: Gopher-style repetition signals — top-token fraction
    // (explode + two keyed aggregations, both map-side combinable) and
    // duplicate-bigram fraction (pure array expressions, no shuffle at
    // all). Repetitive docs are the classic low-quality stratum a
    // curation pass filters before training.
    "repetition_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(repetitionProbes.toDF("doc_id", "text"))
      val toks = docs.select($"doc_id", split($"text", " ").as("toks"))
      val top = toks
        .select($"doc_id", explode($"toks").as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("n"))
        .groupBy($"doc_id")
        .agg(q6(max($"n").cast("double") / sum($"n")).as("top_token_frac"))
      val bg = toks.select($"doc_id",
        when(size($"toks") < 2, lit(0.0)).otherwise(
          q6(lit(1.0) -
            size(array_distinct(transform(
              sequence(lit(0), size($"toks") - 2),
              i => concat(element_at($"toks", i + 1), lit(" "),
                element_at($"toks", i + 2))))).cast("double") /
            (size($"toks") - 1)))
          .as("dup_bigram_frac"))
      top.join(bg, Seq("doc_id"))
        .select($"doc_id", $"top_token_frac", $"dup_bigram_frac")
        .orderBy($"doc_id")
    }),

    // L-prep: overlapping token-window chunking — the corpus-to-
    // training-rows step. Pure Generate + array slicing: zero
    // shuffle, bounded amplification, the documents relation never
    // moves (operators.Chunking).
    "doc_chunks" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Chunking.chunkDocs(
          Tables.documents(s, dir).select($"doc_id", $"text"),
          maxTokens = 16, overlap = 4)
        .orderBy($"doc_id", $"chunk_id")
    }),

    // The composed headline pass: corpus → model-ready training rows.
    // Boilerplate line removal → PII redaction → minimum-length gate →
    // overlapping chunking, each stage oracle-proven standalone
    // (line_dedup, pii_redact, doc_chunks); this row proves the
    // COMPOSITION — the plan is still one distinct-agg + one broadcast
    // anti join + one doc_id agg followed by shuffle-free projections
    // and a Generate. Both probe families ride along so every stage
    // actually fires.
    "training_rows" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.{Chunking, TextCleanup}
      val base = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(boilerplateProbes.toDF("doc_id", "text"))
        .unionAll(piiProbes.toDF("doc_id", "text"))
      val cleaned = TextCleanup.dropBoilerplateLines(base, minDocs = 2)
        .select($"doc_id",
          TextCleanup.redactPii(
            regexp_replace($"clean_text", "\n", " ")).as("text"))
      // the length gate rides chunkDocs' minTokens so the corpus is
      // tokenized exactly once
      Chunking.chunkDocs(cleaned, maxTokens = 16, overlap = 4, minTokens = 5)
        .orderBy($"doc_id", $"chunk_id")
    }),

    // L-prep: offset sequence packing — chunks → fixed-token-budget
    // training sequences via ONE bucket-partitioned window (first-fit
    // greedy is a sequential recurrence; offset packing is the
    // distributed, deterministic contract with bounded overflow). The
    // bucket hash is the cross-engine md5 key, so the oracle
    // replicates the assignment exactly (operators.Packing).
    "pack_sequences" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val chunks = graft.operators.Chunking.chunkDocs(
        Tables.documents(s, dir).select($"doc_id", $"text"),
        maxTokens = 16, overlap = 4)
      graft.operators.Packing.packChunks(
          chunks.select($"doc_id", $"chunk_id", $"n_tokens"),
          budget = 64, nBuckets = 8)
        .orderBy($"bucket", $"seq_id")
    }),

    // THE headline: the full corpus→dataloader chain as one query —
    // see [[fullCurationStages]] for the stage list and composition
    // contracts. The oracle replays all ten stages in SQL, so ANY
    // stage diverging (or any stage's exchange profile corrupting a
    // later stage's input) breaks the row hash; the probe docs force
    // every removal stage to fire.
    "full_curation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      fullCurationStages(s, dir).packed.orderBy($"bucket", $"seq_id")
    }),

    // L28 report: the SAME ten-stage chain as a funnel — row counts
    // at each major stage, the run report every curation owner reads
    // ("where did my corpus go"). The oracle shares full_curation's
    // CTE chain verbatim, so the funnel is a per-stage view of the
    // replayed pipeline, never a second implementation. Each count is
    // one scalar agg over an already-planned stage frame.
    "curation_funnel" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val st = fullCurationStages(s, dir)
      val input = Tables.documents(s, dir).select($"doc_id")
        .unionAll(fullCurationProbes.toDF("doc_id", "text").select($"doc_id"))
      def cnt(no: Long, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(no).as("stage_no"), lit(name).as("stage"), $"n_rows")
      cnt(1L, "input", input)
        .unionAll(cnt(2L, "after_exact_dedup", st.afterExact))
        .unionAll(cnt(3L, "train_survivors", st.survivors))
        .unionAll(cnt(4L, "quality_gated", st.gated))
        .unionAll(cnt(5L, "budget_selected", st.selected))
        .unionAll(cnt(6L, "packed_sequences", st.packed))
        .orderBy($"stage_no")
    }),

    // L3: SimHash Hamming-neighbor counts — the fingerprint
    // (bit i = majority vote of bit i over the doc's shingle hashes;
    // SimHash64 codegen kernel, bit-parity-pinned in SimHash64Spec)
    // oracle-gated through its downstream use: for every doc, the
    // number of other docs within Hamming distance ≤ 3. The engine
    // searches by BANDING (4 × 16-bit bands; pigeonhole: ≤ 3
    // differing bits leave ≥ 1 band identical, so band-equality
    // candidates have perfect recall) + exact popcount verify — the
    // scale shape. The oracle recomputes the counts ALL-PAIRS from
    // the engine's own fingerprints, interpolated as literals at
    // oracle-dump time (the ivf_ann_learned pattern): the banded
    // search's recall and the count aggregation are driver-checked;
    // the fingerprint values themselves are spec-pinned. The exact-dup
    // probe pair guarantees a nonzero count fires at any sf.
    "simhash_neighbors" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // The fp frame is 16 bytes/doc; checkpointing it means the
      // shingle+simhash pass runs ONCE even though the plan reads it
      // three times (banding, and the two per-side hash fetches after
      // pair generation) — the production shape is a persisted
      // fingerprint table for exactly this reason.
      val fps = simhashFrame(s, dir).localCheckpoint()
      val banded = fps.select($"doc_id",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_no"),
            shiftrightunsigned($"simhash", b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*)).as("bk"))
        .select($"doc_id",
          $"bk.band_no".as("band_no"), $"bk.band_val".as("band_val"))
      // Skew-proof candidate generation: a 16-bit band value shared by
      // m boilerplate docs would hand a naive self-join task m² pairs;
      // CandidatePairs hash-chunks hot buckets so per-task work stays
      // ≤ cap² regardless of bucket size (same guard as
      // minhash_neardup). Pigeonhole recall is unchanged — the pair
      // set is identical to the self-join's, exactly once each.
      val pairs = graft.operators.CandidatePairs.fromBuckets(
        banded, Seq("band_no", "band_val"), "doc_id", "doc_a", "doc_b")
      val near = pairs
        .join(fps.select($"doc_id".as("doc_a"), $"simhash".as("ha")), Seq("doc_a"))
        .join(fps.select($"doc_id".as("doc_b"), $"simhash".as("hb")), Seq("doc_b"))
        .filter(bit_count($"ha".bitwiseXOR($"hb")) <= 3)
      val cnt = near.select(explode(array($"doc_a", $"doc_b")).as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_near"))
      fps.join(cnt, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"n_near", lit(0L)).as("n_near"))
        .orderBy($"doc_id")
    }),

    // L5: winnowing containment (Schleimer et al., SIGMOD'03 — public
    // algorithm), oracle-gated through its DOWNSTREAM guarantee: any
    // two docs sharing a run of ≥ 6 tokens (w=4 windows of 3-gram
    // hashes) MUST share ≥ 1 winnowing fingerprint. The engine finds
    // the shared-run pairs by positional 6-gram fingerprint equality
    // (the gram hash is the shuffle key — text never shuffles) and
    // reports whether each pair's winnow fingerprint sets intersect;
    // the oracle rebuilds the same pairs from 6-gram STRINGS and
    // asserts TRUE — so a winnowing implementation that ever broke
    // the guarantee (wrong window math, non-positional grams,
    // dedup-before-window) hash-mismatches. The raw fingerprint
    // values stay engine-side ([[winnowFingerprints]]; density and
    // determinism property-tested in PipelineSpec).
    // L4 at scale: LSH-bucketed approximate nearest neighbors with
    // MULTI-PROBE. Bucket key = 8 sign bits of the deterministic
    // hyperplanes (see [[hyperplanes]] — parity-derived, well spread),
    // computed once at plan-construction time. The corpus keeps ONE
    // bucket per vector (the partition/layout key); each probe visits
    // its home bucket plus all 8 Hamming-1 neighbors — the standard
    // recall-recovery at fixed bucket granularity (a near neighbor
    // differs in few sign bits, most likely one). Candidates per
    // probe ≈ 9·n/256; the bit count is the scale knob (bucket bits ≈
    // log₂(n / wanted-candidates); a 10⁹-vector corpus wants ~25 bits
    // and more probes). Oracle-gated since round 6: the bucket is the
    // raw sign-bit fold (SignBandKeys hashes nothing), so DuckDB
    // rebuilds it from the SAME ±1 plane literals the plan embeds and
    // replays the multi-probe search end to end.
    "ann_lsh" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      def bucket(v: Column): Column =
        element_at(F.sign_band_keys(v, flatHyperplanes(8), 64, 8), 1)
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("bucket", bucket($"v"))
      // home bucket + the 8 Hamming-1 flips; distinct by construction
      val probes = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"v".as("pv"),
          explode(array(($"bucket" +: (0 until 8).map(b =>
            $"bucket".bitwiseXOR(lit(1L << b)))): _*)).as("bucket"))
      val w = Window.partitionBy($"probe_id")
        .orderBy($"cos_sim".desc, $"vec_id")
      emb.join(broadcast(probes), Seq("bucket"))
        .filter($"vec_id" =!= $"probe_id")
        .select($"probe_id", $"vec_id", $"bucket",
          q6(dot($"v", $"pv") / (l2norm($"v") * l2norm($"pv"))).as("cos_sim"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 5)
        .select($"probe_id", $"rn", $"vec_id".as("neighbor_id"), $"bucket",
          $"cos_sim")
        .orderBy($"probe_id", $"rn")
    }),

    // U3: group-level MinHash sketches via the typed MinHashAgg
    // Aggregator — one 64-lane signature per source (algebraic:
    // partial signatures merge map-side; 64 longs per group cross the
    // shuffle regardless of group size), then pairwise estimated
    // Jaccard between sources from lane agreement. Oracle-gated since
    // round 6 via the interpolated-constants pattern: the per-source
    // signatures (tiny — sources × 64 longs) ride into the oracle as
    // literals at dump time, and DuckDB independently replays the
    // pairwise join + lane-agreement arithmetic (k/64 is exact in
    // doubles). The sketch-vs-true-Jaccard quality remains
    // property-checked in MinHashAggSpec.
    "source_minhash_sim" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val hashed = withShingleHashes(
        Tables.documents(s, dir).select($"source", $"text")
          .repartition($"source"), Seq("source"))
      val sigs = hashed.select($"source", $"hs").as[(String, Seq[Long])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new graft.functions.MinHashAgg(minhashSeedList.toArray)
          .toColumn.name("sig"))
        .toDF("source", "sig")
      sourceSigCache.put(dir, sigs)
      val a = sigs.select($"source".as("source_a"), $"sig".as("sig_a"))
      val b = sigs.select($"source".as("source_b"), $"sig".as("sig_b"))
      a.join(b, $"source_a" < $"source_b")
        .select($"source_a", $"source_b",
          (aggregate(
            zip_with($"sig_a", $"sig_b", (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") /
            lit(MinHashSeeds.toDouble)).as("est_jaccard"))
        .orderBy($"source_a", $"source_b")
    }),

    // L29: per-source quota caps — the anti-spam curation stage: no
    // domain exceeds its share, whatever its raw volume. Doc cap
    // plans as WindowGroupLimit (map-side partial limits — a spam
    // domain ships maxDocs rows per partition, not its volume); token
    // cap is the per-source greedy prefix via the two-phase offset
    // pattern (no one-task per-source sort, no driver collect) —
    // SourceCapSpec pins both plan shapes.
    "source_cap_docs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.SourceCap.capDocs(
          Tables.documents(s, dir).select($"doc_id", $"source"),
          "source", "doc_id", maxDocs = 15)
        .orderBy($"doc_id")
    }),
    "source_cap_tokens" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      graft.operators.SourceCap.capTokens(
          docs, "source", "doc_id", "n_tokens", budget = 800L)
        .orderBy($"doc_id")
    }),

    "winnow_containment" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(winnowProbes.toDF("doc_id", "text"))
      val W = 6
      val grams = docs.select($"doc_id", split($"text", " ").as("ws"))
        .filter(size($"ws") >= W)
        .select($"doc_id", explode(transform(
          sequence(lit(1), size($"ws") - (W - 1)),
          i => F.fnv1a(concat_ws(" ", slice($"ws", i, lit(W)))))).as("gfp"))
        .distinct()
      // Skew-proof shared-run pair generation: a 6-gram of site-wide
      // boilerplate sits in thousands of docs, and a naive gfp
      // self-join hands one task all C(m,2) pairs of that gram.
      // CandidatePairs hash-chunks hot grams (same guard as
      // minhash_neardup / simhash_neighbors); the pair set is
      // identical to the self-join's.
      val pairs = graft.operators.CandidatePairs.fromBuckets(
        grams, Seq("gfp"), "doc_id", "doc_a", "doc_b")
      val fps = winnowFingerprints(docs)
      val fa = fps.select($"doc_id".as("doc_a"), $"fps".as("fps_a"))
      val fb = fps.select($"doc_id".as("doc_b"), $"fps".as("fps_b"))
      pairs.join(fa, "doc_a").join(fb, "doc_b")
        .select($"doc_a", $"doc_b",
          (size(array_intersect($"fps_a", $"fps_b")) >= 1)
            .as("shares_fingerprint"))
        .orderBy($"doc_a", $"doc_b")
    }),
  )

  /** Learned IVF centroids per sf dir — computed once (deterministic
    * Lloyd iterations, [[graft.operators.IvfIndex.learnCentroids]])
    * and shared by the `ivf_ann_learned` query and its interpolated
    * oracle. Verify runs every query before dumping oracle_sql.json,
    * so the cache is warm by the time [[oracle]] is built; the k·dim
    * doubles held per dir are driver-trivial. */
  private val learnedCentCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** The dir whose data-dependent oracle caches were warmed most
    * recently — consumed only by the no-arg [[oracle]] convenience
    * view (the driver's single-dir contract); each cache is still
    * independently Option-guarded in [[oracleFor]]. */
  @volatile private var lastOracleDir: Option[String] = None

  private def learnedCents(s: SparkSession, dir: String): Array[Array[Double]] = {
    val c = learnedCentCache.computeIfAbsent(dir, d => {
      import s.implicits._
      graft.operators.IvfIndex.learnCentroids(
        Tables.embeddings(s, d)
          .select($"vec_id", $"embedding".cast("array<double>").as("v")),
        16, 3)
    })
    lastOracleDir = Some(dir)
    c
  }

  /** Poisson-bootstrap shape shared by `bootstrap_means` and its
    * oracle: 32 replicates, weights from the Poisson(1) inverse CDF
    * over the 2^32 keyed-hash space, truncated at weight 7 (tail mass
    * ~1e-5 — the SAME truncation in both engines because the
    * thresholds are these exact integer literals). */
  private[graft] val BootB = 32
  private[graft] val BootSalt = "boot:v1:"

  /** The L94 sampled-curve knobs: exact-k per-lang stratum size (the
    * sample — and therefore the pair work — is FIXED regardless of
    * corpus size) and the two keyed-hash salts (doc selection, pair
    * replicate weights). */
  private[graft] val CurveSampleK = 60
  private[graft] val CurveSampleSalt = "curvesamp:v1:"
  private[graft] val CurveBootSalt = "curveboot:v1:"

  /** L98 balanced-training knobs: exact-k per class for the trigram
    * model (equalizes the smoothed denominators across classes) and
    * the selection salt. */
  private[graft] val TrigramTrainK = 60
  private[graft] val TrigramSalt = "trig:v1:"
  private[graft] val BootThresholds: Seq[Long] = {
    var pmf = math.exp(-1.0)
    var cdf = pmf
    (0 until 7).map { k =>
      val t = math.floor(cdf * 4294967296.0).toLong
      pmf = pmf / (k + 1)
      cdf += pmf
      t
    }
  }

  /** The shared PQ-ADC top-5 ranking behind `pq_ann` and
    * `ann_recall`: (probe_id, vec_id, adc, rn ≤ 5). Corpus encoded to
    * codes, probes carry their ADC tables, brute scan at test scale
    * (the cosine_knn shape — at 100 TB the IVF prune runs first). */
  private def pqAdcTop5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.PqIndex
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val books = pqBooks(s, dir)
    val corpus = PqIndex.encode(emb, books).drop("v")
    val probes = PqIndex.probeTables(
      emb.filter($"vec_id" < 20).select($"vec_id".as("probe_id"), $"v"),
      "v", books).drop("v")
    val wTop = Window.partitionBy($"probe_id")
      .orderBy($"adc".desc, $"vec_id")
    corpus.crossJoin(broadcast(probes))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id", q6(PqIndex.adcDot(PqM)).as("adc"))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter($"rn" <= 5)
  }

  /** PQ shape shared by `pq_ann`, its spec, and its oracle: 4
    * subspaces × 16 centroids over the 64-dim embeddings. */
  private[graft] val PqM = 4
  private[graft] val PqK = 16
  private[graft] val PqDim = 64

  /** Per-dir learned PQ codebooks — the [[learnedCents]] pattern: the
    * m·k·(d/m) doubles are driver-trivial, the learn runs once per
    * dir per JVM, and the oracle interpolates the SAME values. */
  private val pqBooksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  private[graft] def pqBooks(s: SparkSession,
      dir: String): Array[Array[Array[Double]]] = {
    val b = pqBooksCache.computeIfAbsent(dir, d => {
      import s.implicits._
      graft.operators.PqIndex.learnCodebooks(
        Tables.embeddings(s, d)
          .select($"vec_id", $"embedding".cast("array<double>").as("v")),
        PqDim, PqM, PqK, 3)
    })
    lastOracleDir = Some(dir)
    b
  }

  /** Empty since round 6 — every Pipeline query is oracle-gated, and
    * since round 8 so is every query repo-wide (`agg_approx` and
    * `hash_fns_native` closed via interpolated-literal oracles in
    * their own modules). Kept so the SparkEntry aggregation stays
    * stable. */
  val noOracleQueries: Map[String, Q] = Map.empty

  /** Probe docs for `simhash_neighbors`: an exact-duplicate pair
    * (identical shingle sets ⇒ identical simhash ⇒ Hamming 0 — a
    * guaranteed nonzero neighbor count at any sf) plus a one-token
    * edit of the same text (small but hash-determined distance). (No
    * single quotes — ids ride into the interpolated oracle.) */
  private[graft] val simhashProbes: Seq[(Long, String)] = {
    def t(last: String) = "the simhash probe family shares almost all " +
      "of its shingles so the banded hamming search must count these " +
      "documents as mutual neighbors in every " + last
    Seq((-91L, t("round")), (-90L, t("round")), (-89L, t("pass")))
  }

  /** The (doc_id, simhash) frame behind `simhash_neighbors` — also
    * registered per dir so [[oracleFor]] can interpolate the
    * fingerprints as literals AT ORACLE-DUMP TIME. The collect happens
    * only when an oracle is dumped (Verify), never inside the query
    * itself — a 100 TB caller of the query pays no driver
    * materialization. */
  private val simhashFrameCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def simhashFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = withShingleHashes(
      Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(simhashProbes.toDF("doc_id", "text"))
        .repartition($"doc_id"), Seq("doc_id"))
      .select($"doc_id", F.simhash64($"hs").as("simhash"))
    simhashFrameCache.put(dir, f)
    f
  }

  /** DuckDB mirror of `simhash_neighbors` given the engine's own
    * fingerprints: all-pairs popcount(xor) ≤ 3 — checks the banded
    * search's recall and the per-doc aggregation. */
  private def simhashNeighborsSql(fps: Array[(Long, Long)]): String = {
    val rows = fps.sortBy(_._1)
      .map { case (id, h) => s"(CAST($id AS BIGINT), CAST($h AS BIGINT))" }
      .mkString(",\n    ")
    s"""WITH f(doc_id, fp) AS (VALUES
       |    $rows),
       |nn AS (
       |  SELECT a.doc_id, COUNT(*) AS n_near
       |  FROM f a JOIN f b
       |    ON b.doc_id <> a.doc_id AND bit_count(xor(a.fp, b.fp)) <= 3
       |  GROUP BY a.doc_id)
       |SELECT f.doc_id, CAST(COALESCE(nn.n_near, 0) AS BIGINT) AS n_near
       |FROM f LEFT JOIN nn USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Probe docs for `winnow_containment`: two docs sharing an 8-token
    * run (the guarantee case), one disjoint doc, and a pair sharing
    * exactly one 6-token run at different positions — the minimal
    * shared-window shape. (No single quotes — interpolated into
    * oracle SQL.) */
  private[graft] val winnowProbes: Seq[(Long, String)] = {
    val run = "a stable shared corridor of eight exact tokens"
    Seq(
      (-82L, s"alpha opening words then $run and a distinct alpha tail"),
      (-81L, s"totally different beta prefix $run closing beta remark"),
      (-80L, "no overlap at all in this probe document text body"))
  }

  /** Winnowing fingerprint sets (Schleimer et al., SIGMOD'03 — public
    * algorithm): positional 3-gram chain hashes (NOT deduplicated —
    * winnowing is positional), then each sliding window of `w` grams
    * contributes its minimum hash; the distinct minima are the doc's
    * fingerprint set. Guarantee: any shared token run covering ≥ w
    * consecutive grams (i.e. ≥ w+2 tokens) between two docs shares at
    * least one fingerprint, at ~1/w the density of full gram hashing.
    * Input: (doc_id, text); output: (doc_id, fps: array<long>). */
  def winnowFingerprints(docs: DataFrame, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id",
        transform(split($"text", " "), t => F.fnv1a(t)).as("th"))
      .select($"doc_id",
        when(size($"th") >= 3,
          transform(sequence(lit(1), size($"th") - 2), i =>
            F.fnv1a(element_at($"th", i), element_at($"th", i + 1),
              element_at($"th", i + 2))))
          .otherwise(array(element_at($"th", 1))).as("grams"))
      .select($"doc_id",
        when(size($"grams") >= w,
          array_distinct(transform(
            sequence(lit(1), size($"grams") - (w - 1)), j =>
              array_min(slice($"grams", j, lit(w))))))
          .otherwise(array(array_min($"grams"))).as("fps"))
  }

  /** DuckDB literal for hyperplane h — the identical ±1 doubles the
    * Spark plan embeds (exact round-trip: every component is ±1.0). */
  private def planeSql(h: Int): String =
    hyperplanes(h).map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"

  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), z -> z[1] * z[2])), (acc, x) -> acc + x)"

  private def sqlNorm(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform($a, x -> x * x)), (acc, x) -> acc + x))"

  /** Shared shingle CTE — mirrors [[shingles]] including its
    * whole-text fallback for docs shorter than the 3-token width. */
  /** The distinct-3-gram shingle CTE over any (doc_id, text) source —
    * ONE spelling shared by every Jaccard oracle (and, via the `ed`
    * source, by the full_curation oracle) so tokenization cannot
    * drift. */
  private def shingleSqlCteFor(src: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= 3 THEN
       |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                     for i in range(1, len(ws) - 1)])
       |    ELSE [text] END AS s
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM $src))""".stripMargin

  private val shingleSqlCte = shingleSqlCteFor("documents")

  /** Chunk-window CTEs (`tk`, `c`) mirrored from
    * [[graft.operators.Chunking.chunkDocs]] with maxTokens=16,
    * overlap=4 — stride 12, integer-exact ceil-div, and the SAME
    * null-text policy as the engine (COALESCE to '' so a null doc
    * yields one empty chunk, never a phantom 16-token one). ONE
    * definition shared by the doc_chunks / pack_sequences /
    * training_rows oracles so the window math cannot drift.
    *
    * @param src  source relation providing (doc_id, text)
    * @param gate extra WHERE predicate on the tokenized length
    *             ('' for none) */
  private def sqlChunkCtes(src: String, gate: String = ""): String =
    s"""tk AS (
       |  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks,
       |    len(string_split(COALESCE(text, ''), ' ')) AS n
       |  FROM $src$gate),
       |c AS (
       |  SELECT doc_id, toks, n,
       |    unnest(range(0, GREATEST((n - 4 + 12 - 1) // 12, 1))) AS chunk_id
       |  FROM tk)""".stripMargin

  /** The chunk output columns shared by the doc_chunks and
    * training_rows oracles (DuckDB list slicing is 1-based inclusive
    * vs Spark slice(start, length) — same token spans). */
  private val sqlChunkCols =
    """CAST(chunk_id AS BIGINT) AS chunk_id,
      |  array_to_string(toks[chunk_id*12+1 : LEAST(chunk_id*12+16, n)], ' ') AS chunk_text,
      |  CAST(LEAST(chunk_id*12+16, n) - chunk_id*12 AS BIGINT) AS n_tokens""".stripMargin

  /** DuckDB spelling of [[graft.operators.Sampling.keyHash32]]: fold
    * the first 8 hex chars of md5(salt ∥ key) to a BIGINT. ONE
    * definition shared by every hash-sampling oracle so the spelling
    * (and any future salt change) cannot drift between them. */
  private def sqlMd5Fold32(salt: String, key: String): String =
    s"""list_reduce(list_transform(range(1, 9), i ->
       |      CAST(strpos('0123456789abcdef',
       |        substring(md5('$salt' || $key), CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, b) -> a * 16 + b)""".stripMargin

  /** The 80/10/10 split CASE over a fold value `v` — integer
    * thresholds floor(0.8·2^32) / floor(0.9·2^32), shared by the
    * hash_split and decontaminate oracles. */
  private val sqlSplitCase =
    """CASE WHEN v < 3435973836 THEN 'train'
      |         WHEN v < 3865470566 THEN 'valid'
      |         ELSE 'test' END""".stripMargin

  /** The `mixture_resample` rates: downsample the dominant stratum,
    * integer-upsample, fractional-upsample, drop — every branch of
    * [[graft.operators.Sampling.resampleMixture]]; unmapped strata
    * (zh) take the default 1.0. */
  private val MixtureRates =
    Map("en" -> 0.5, "es" -> 2.0, "de" -> 1.3, "fr" -> 0.0)

  /** CASE over the mixture strata with `f`'s integer literal per rate
    * (and the default-1.0 literal in ELSE) — the oracle-side spelling
    * of resampleMixture's per-stratum fold. */
  private def mixCaseSql(f: Double => Long): String =
    MixtureRates.toSeq.sortBy(_._1)
      .map { case (k, r) => s"WHEN '$k' THEN ${f(r)}" }
      .mkString("CASE lang ", " ", s" ELSE ${f(1.0)} END")

  /** (doc_id, carry..., n_tokens, quality) — the composite quality
    * scoring CTE mirrored from [[qualityOf]], parameterized over the
    * source relation and carried columns; ONE spelling shared by the
    * doc_quality, token_budget_select and full_curation oracles. */
  private def qualityCteSql(name: String, src: String,
      carry: Seq[String]): String = {
    val cc = carry.map(_ + ", ").mkString
    s"""$name AS (
       |  SELECT doc_id, ${cc}CAST(n_tok AS BIGINT) AS n_tokens,
       |    ${sqlQ6("""(
       |      (CASE WHEN n_tok >= 50 AND n_tok <= 5000 THEN 1.0
       |            WHEN n_tok >= 20 THEN 0.5 ELSE 0.0 END) +
       |      (CASE WHEN ttr >= 0.3 AND ttr <= 0.9 THEN 1.0 ELSE 0.5 END) +
       |      (CASE WHEN stop >= 0.02 AND stop <= 0.3 THEN 1.0 ELSE 0.5 END) +
       |      (CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 1.0 ELSE 0.0 END)
       |    ) / 4.0""")} AS quality
       |  FROM (
       |    SELECT doc_id, $cc
       |      CAST(len(ws) AS DOUBLE) AS n_tok,
       |      ${sqlQ6("CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)")} AS ttr,
       |      ${sqlQ6("CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a' OR w = 'of')) AS DOUBLE) / len(ws)")} AS stop,
       |      ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(ws, w -> CAST(length(w) AS DOUBLE))), (acc, x) -> acc + x) / len(ws)")} AS avg_len
       |    FROM (SELECT doc_id, ${cc}string_split(text, ' ') AS ws FROM $src)))""".stripMargin
  }

  private val qualitySqlCte = qualityCteSql("q", "documents", Seq("lang"))

  /** τ=0.5 exact-Jaccard pairs closed into components: `comp` is the
    * (node, cluster_id = component min) labeling the cluster-closure
    * oracles share. Must open with `WITH RECURSIVE`. */
  private val neardupClosureSqlCte =
    s"""$shingleSqlCte,
       |p AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |      ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
       |  WHERE jaccard >= 0.5),
       |e AS (SELECT doc_a AS u, doc_b AS v FROM p
       |      UNION ALL SELECT doc_b, doc_a FROM p),
       |n AS (SELECT DISTINCT u AS node FROM e),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM n
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.node),
       |comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)""".stripMargin

  /** Static SQL oracles plus — once [[learnedCents]] / [[simhashFrame]]
    * have run, which Verify guarantees by executing every query before
    * the dump — the data-dependent oracles (`ivf_ann_learned` with the
    * learned centroids, `simhash_neighbors` with the engine's
    * fingerprints) interpolated as literals. A `def` (and consumed
    * through `SparkEntry.oracleSql`, also a `def`) precisely so the
    * data-dependent entries can appear. */
  def oracle: Map[String, String] =
    lastOracleDir.map(oracleFor).getOrElse(staticOracle)

  /** One SQL string per dir: the collect behind the interpolation runs
    * ONCE at first dump, never inside the query plan itself. */
  private val simhashSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-dir (source, 64-lane signature) frame behind
    * `source_minhash_sim` — registered at query construction,
    * collected only at oracle-dump time (sources × 64 longs, tiny). */
  private val sourceSigCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val sourceSigSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DuckDB mirror of `source_minhash_sim` given the engine's own
    * signatures: pairwise lane agreement / 64 (exact in doubles) —
    * the join and the agreement arithmetic are driver-checked; the
    * signature values are the MinHashAgg sketch, quality-checked in
    * MinHashAggSpec. */
  private def sourceMinhashSimSql(sigs: Array[(String, Seq[Long])]): String = {
    val rows = sigs.sortBy(_._1).map { case (src, sig) =>
      s"('$src', ${sig.mkString("[", ", ", "]")}::BIGINT[])"
    }.mkString(",\n    ")
    s"""WITH s(source, sig) AS (VALUES
       |    $rows)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(len(list_filter(range(1, ${MinHashSeeds + 1}),
       |    i -> a.sig[i] = b.sig[i])) AS DOUBLE) / $MinHashSeeds
       |    AS est_jaccard
       |FROM s a JOIN s b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin
  }

  /** The oracle map for ONE sf dir, keyed off the per-dir caches —
    * two dirs exercised in one JVM each get their own correct
    * data-dependent SQL (the last-set-dir convenience view above
    * serves the single-dir driver contract; Verify dumps THIS map for
    * the dir it actually ran). Each entry appears once that dir's
    * query has been constructed (which warms its cache); until then
    * the rows-only check applies. */
  def oracleFor(dir: String): Map[String, String] =
    staticOracle ++ Option(learnedCentCache.get(dir))
      .map(c => Map("ivf_ann_learned" -> ivfLearnedSql(c),
        "semantic_clusters" -> semanticClustersSql(c),
        "ivf_append" -> ivfAppendSql(c)))
      .getOrElse(Map.empty) ++ Option(pqBooksCache.get(dir))
      .map(b => Map("pq_ann" -> pqAnnSql(b),
        "ann_recall" -> annRecallSql(b)))
      .getOrElse(Map.empty) ++ (for {
        c <- Option(learnedCentCache.get(dir))
        b <- Option(pqBooksCache.get(dir))
      } yield Map("ivfpq_ann" -> ivfPqSql(c, b)))
      .getOrElse(Map.empty) ++ Option(simhashFrameCache.get(dir))
      .map { f =>
        Map("simhash_neighbors" -> simhashSqlCache.computeIfAbsent(dir,
          _ => simhashNeighborsSql(f.collect()
            .map(r => (r.getLong(0), r.getLong(1))))))
      }.getOrElse(Map.empty) ++ Option(sourceSigCache.get(dir))
      .map { f =>
        Map("source_minhash_sim" -> sourceSigSqlCache.computeIfAbsent(dir,
          _ => sourceMinhashSimSql(f.collect()
            .map(r => (r.getString(0), r.getSeq[Long](1))))))
      }.getOrElse(Map.empty)

  /** DuckDB mirror of `ivf_ann_learned`: identical structure to the
    * `ivf_ann` oracle, with the VALUES rows carrying the learned
    * centroids (and their Scala-computed half-norms, bit-identical to
    * the literals [[graft.operators.IvfIndex.scoresCol]] plants in the
    * Spark plan; `Double.toString` round-trips exactly). */
  private def ivfLearnedSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    s"""WITH cents(cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} - cents.hn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d) t WHERE rn = 1),
       |pc AS (SELECT vec_id AS probe_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d WHERE vec_id < 20) t WHERE rn <= 4),
       |scored AS (
       |  SELECT pc.probe_id, c.vec_id,
       |    ${sqlQ6(sqlDot("a.v", "p.v") + " / (" + sqlNorm("a.v") + " * " + sqlNorm("p.v") + ")")} AS cos_sim
       |  FROM pc JOIN cells c ON c.cell = pc.cell AND c.vec_id <> pc.probe_id
       |  JOIN e a ON a.vec_id = c.vec_id
       |  JOIN e p ON p.vec_id = pc.probe_id),
       |ranked AS (SELECT probe_id, vec_id, cos_sim,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn FROM scored)
       |SELECT probe_id, rn, vec_id AS neighbor_id, cos_sim
       |FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin
  }

  /** DuckDB mirror of `semantic_clusters` given the learned
    * centroids: identical assignment (argmax `dot − hn`, lowest-cid
    * first-max tiebreak via the rank window — the ivfLearnedSql
    * `cells` CTE) and identical per-row q6 cosine, summed as exact
    * integer micro-units so the mass is aggregation-order-free. */
  private def semanticClustersSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    s"""WITH cents(cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} - cents.hn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d) t WHERE rn = 1),
       |j AS (
       |  SELECT cells.cell, cells.vec_id,
       |    ${sqlQ6(sqlDot("e.v", "cents.c") + " / (" + sqlNorm("e.v") + " * " + sqlNorm("cents.c") + ")")} AS cos
       |  FROM cells JOIN e ON e.vec_id = cells.vec_id
       |  JOIN cents ON cents.cid = cells.cell)
       |SELECT cell, COUNT(*) AS n_vecs,
       |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec,
       |  CAST(SUM(CAST(FLOOR(cos * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
       |    AS cos_mass_6
       |FROM j GROUP BY 1 ORDER BY cell""".stripMargin
  }

  /** DuckDB mirror of `ivf_append` — same cells/cos replay as
    * [[semanticClustersSql]], split by the arrival predicate. */
  private def ivfAppendSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    s"""WITH cents(cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} - cents.hn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d) t WHERE rn = 1),
       |j AS (
       |  SELECT cells.cell, cells.vec_id,
       |    CASE WHEN cells.vec_id % 7 = 0 THEN 1 ELSE 0 END AS is_new,
       |    CAST(FLOOR(${sqlQ6(sqlDot("e.v", "cents.c") + " / (" +
            sqlNorm("e.v") + " * " + sqlNorm("cents.c") + ")")}
       |      * 1000000.0 + 0.5) AS BIGINT) AS cos6
       |  FROM cells JOIN e ON e.vec_id = cells.vec_id
       |  JOIN cents ON cents.cid = cells.cell)
       |SELECT cell,
       |  CAST(SUM(1 - is_new) AS BIGINT) AS n_existing,
       |  CAST(SUM(is_new) AS BIGINT) AS n_appended,
       |  CAST(SUM((1 - is_new) * cos6) AS BIGINT) AS cos_mass_existing_6,
       |  CAST(SUM(is_new * cos6) AS BIGINT) AS cos_mass_appended_6
       |FROM j GROUP BY 1 ORDER BY cell""".stripMargin
  }

  /** DuckDB mirror of `pq_ann` given the learned codebooks: identical
    * per-subspace encode (argmax `dot − hn`, lowest-cid tiebreak via
    * the rank window), identical ADC table dots, and the 4-term sum
    * spelled LEFT-ASSOCIATIVE (`p1 + p2 + p3 + p4`) to match the
    * engine's fixed fold order — double addition is not associative,
    * so a SUM() aggregate would not be a faithful replay. */
  /** The VALUES rows of the PQ codebook relation `cb(j, cid, c, hn)`. */
  private def pqCbValues(books: Array[Array[Array[Double]]]): String =
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) =>
        val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
        s"(${j + 1}, ${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
      }
    }.mkString(",\n    ")

  private def pqAnnSql(books: Array[Array[Array[Double]]]): String =
    s"""WITH ${pqCoreCtes(books)}
       |SELECT probe_id, rn, vec_id AS neighbor_id, adc
       |FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin

  /** DuckDB mirror of `ann_recall`: the PQ core CTEs + the exact
    * inner-product ranking + the top-5 overlap count — the recall
    * evaluation replayed end-to-end. */
  private def annRecallSql(books: Array[Array[Array[Double]]]): String =
    s"""WITH ${pqCoreCtes(books)},
       |ex AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id,
       |    CAST(row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY ${sqlQ6(sqlDot("c.v", "p.v"))} DESC, c.vec_id)
       |      AS BIGINT) AS rn
       |  FROM e c JOIN e p ON p.vec_id < 20 AND c.vec_id <> p.vec_id)
       |SELECT ex5.probe_id,
       |  CAST(SUM(CASE WHEN pq5.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hits
       |FROM (SELECT probe_id, vec_id FROM ex WHERE rn <= 5) ex5
       |LEFT JOIN (SELECT probe_id, vec_id FROM ranked WHERE rn <= 5) pq5
       |  ON pq5.probe_id = ex5.probe_id AND pq5.vec_id = ex5.vec_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The PQ encode/table/ADC/rank CTE chain (`cb`, `e`, `sc`, `cd`,
    * `pt`, `adc`, `ranked`) shared by [[pqAnnSql]] and
    * [[annRecallSql]]. */
  private def pqCoreCtes(books: Array[Array[Array[Double]]]): String = {
    val sub = books.head.head.length
    val rows = pqCbValues(books)
    val adcSum = (1 to PqM).map(j => s"p$j").mkString(" + ")
    val pPivots = (1 to PqM).map(j =>
      s"MAX(CASE WHEN cd.j = $j THEN pt.pd END) AS p$j").mkString(",\n    ")
    s"""cb(j, cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sc AS (
       |  SELECT e.vec_id, cb.j, cb.cid,
       |    ${sqlDot(s"list_slice(e.v, (cb.j - 1) * $sub + 1, cb.j * $sub)", "cb.c")} AS pd
       |  FROM e CROSS JOIN cb),
       |cd AS (
       |  SELECT vec_id, j, cid AS code FROM (
       |    SELECT vec_id, j, cid,
       |      row_number() OVER (PARTITION BY vec_id, j
       |        ORDER BY pd - hn DESC, cid) AS rn
       |    FROM sc JOIN cb USING (j, cid)) t
       |  WHERE rn = 1),
       |pt AS (
       |  SELECT vec_id AS probe_id, j, cid, pd FROM sc WHERE vec_id < 20),
       |adc AS (
       |  SELECT pt.probe_id, cd.vec_id,
       |    $pPivots
       |  FROM cd JOIN pt ON pt.j = cd.j AND pt.cid = cd.code
       |    AND cd.vec_id <> pt.probe_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT probe_id, vec_id, ${sqlQ6(adcSum)} AS adc,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY ${sqlQ6(adcSum)} DESC, vec_id) AS BIGINT) AS rn
       |  FROM adc)""".stripMargin
  }

  /** DuckDB mirror of `ivfpq_ann`: the [[ivfLearnedSql]] cell CTEs
    * composed with the [[pqAnnSql]] encode/ADC CTEs — candidates are
    * restricted to (corpus cell ∈ probe's top-4 cells) before the ADC
    * pivot, exactly like the engine's cell join. */
  private def ivfPqSql(cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): String = {
    val sub = books.head.head.length
    val centRows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    val adcSum = (1 to PqM).map(j => s"p$j").mkString(" + ")
    val pPivots = (1 to PqM).map(j =>
      s"MAX(CASE WHEN cd.j = $j THEN pt.pd END) AS p$j").mkString(",\n    ")
    s"""WITH cents(ccid, cc, chn) AS (VALUES
       |    $centRows),
       |cb(j, cid, c, hn) AS (VALUES
       |    ${pqCbValues(books)}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT e.vec_id, cents.ccid,
       |        ${sqlDot("e.v", "cents.cc")} - cents.chn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(ccid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, ccid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, ccid) AS rn
       |    FROM d) t WHERE rn = 1),
       |pcells AS (SELECT vec_id AS probe_id, CAST(ccid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, ccid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, ccid) AS rn
       |    FROM d WHERE vec_id < 20) t WHERE rn <= 4),
       |sc AS (
       |  SELECT e.vec_id, cb.j, cb.cid,
       |    ${sqlDot(s"list_slice(e.v, (cb.j - 1) * $sub + 1, cb.j * $sub)", "cb.c")} AS pd
       |  FROM e CROSS JOIN cb),
       |cd AS (
       |  SELECT vec_id, j, cid AS code FROM (
       |    SELECT vec_id, j, cid,
       |      row_number() OVER (PARTITION BY vec_id, j
       |        ORDER BY pd - hn DESC, cid) AS rn
       |    FROM sc JOIN cb USING (j, cid)) t
       |  WHERE rn = 1),
       |pt AS (
       |  SELECT vec_id AS probe_id, j, cid, pd FROM sc WHERE vec_id < 20),
       |adc AS (
       |  SELECT pt.probe_id, cd.vec_id,
       |    $pPivots
       |  FROM cd JOIN pt ON pt.j = cd.j AND pt.cid = cd.code
       |    AND cd.vec_id <> pt.probe_id
       |  JOIN cells cl ON cl.vec_id = cd.vec_id
       |  JOIN pcells pc ON pc.probe_id = pt.probe_id AND pc.cell = cl.cell
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT probe_id, vec_id, ${sqlQ6(adcSum)} AS adc,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY ${sqlQ6(adcSum)} DESC, vec_id) AS BIGINT) AS rn
       |  FROM adc)
       |SELECT probe_id, rn, vec_id AS neighbor_id, adc
       |FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin
  }

  /** The unrolled BPE trainer CTE chain (w0..wK with the original
    * word carried through, per-round pair counts / argmax / vocab
    * census), shared by the `bpe_train` and `bpe_apply` oracles. */
  private val bpeSqlCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT split_part(pq, chr(31), 1) AS a,
         |    split_part(pq, chr(31), 2) AS b,
         |    CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |    SELECT unnest([s[i] || chr(31) || s[i+1]
         |                   for i in range(1, len(s))]) AS pq, cnt
         |    FROM (SELECT string_split(trim(seq, chr(31)),
         |                   chr(31) || chr(31)) AS s, cnt
         |          FROM w${r - 1}))
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT w, replace(seq,
         |      chr(31) || a || chr(31) || chr(31) || b || chr(31),
         |      chr(31) || a || b || chr(31)) AS seq, cnt
         |  FROM w${r - 1}, b$r),
         |v$r AS (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS vs FROM (
         |  SELECT unnest(string_split(trim(seq, chr(31)),
         |    chr(31) || chr(31))) AS sym FROM w$r))""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT w, regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g')
       |    AS seq, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |$rounds""".stripMargin
  }

  private val bpeSqlRoundSelects: String =
    (1 to BpeRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_round, a AS left_sym,
         |  b AS right_sym, c AS pair_count, vs AS vocab_after
         |FROM b$r, v$r""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** The per-source centroid CTE chain (e/x/cc/cent), shared by the
    * source_centroids and source_affinity oracles. */
  private val centroidSqlCtes: String =
    """e AS (
      |  SELECT d.source, v.vec_id, v.embedding::DOUBLE[] AS emb
      |  FROM embeddings v JOIN documents d ON v.vec_id = d.doc_id),
      |x AS (
      |  SELECT source, u.i AS i,
      |    CAST(FLOOR(u.x * 10000.0 + 0.5) AS BIGINT) AS q
      |  FROM (SELECT source,
      |          unnest([{'i': i, 'x': emb[i]}
      |                  for i in range(1, len(emb) + 1)]) AS u
      |        FROM e)),
      |cc AS (
      |  SELECT source, i,
      |    CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) / 10000.0 AS c
      |  FROM x GROUP BY 1, 2),
      |cent AS (
      |  SELECT source, list(c ORDER BY i) AS cvec FROM cc GROUP BY 1)""".stripMargin

  private val staticOracleBase: Map[String, String] = Map(
    // Oracle partitions by text directly — semantically identical to
    // the 128-bit fingerprint absent a collision (~1e-20 at 4B docs).
    "exact_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // same mx/floor/zip spellings element-for-element; q6 on the two
    // derived doubles
    "embed_quantize" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m AS (
         |  SELECT vec_id, v,
         |    list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
         |      (a, b) -> greatest(a, b)) AS mx
         |  FROM e),
         |qz AS (
         |  SELECT vec_id, v, mx,
         |    CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
         |         ELSE list_transform(v, x ->
         |           CAST(floor((x * 127.0) / mx + 0.5) AS INT)) END AS q
         |  FROM m)
         |SELECT vec_id,
         |  ${sqlQ6("mx / 127.0")} AS scale,
         |  array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',') AS q_csv,
         |  ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(list_zip(v, q), z -> abs(z[1] - (CAST(z[2] AS DOUBLE) * mx) / 127.0))), (a, b) -> greatest(a, b))")} AS max_err
         |FROM qz ORDER BY vec_id""".stripMargin,

    // dedup by TEXT (the fingerprint is engine-side identity only):
    // batch-internal winner window + existing-corpus membership check.
    // NULL-text policy, spelled out so both engines agree if the
    // fixture ever gains null texts: the engine's left_anti keeps the
    // batch's (single, rn=1) null-text winner because null join keys
    // never match — so the oracle passes nulls explicitly and keeps
    // the NOT IN subquery null-free (one null in a NOT IN list would
    // otherwise collapse the whole predicate to NULL = drop all).
    "incremental_dedup" ->
      s"""WITH src AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  UNION ALL SELECT * FROM (VALUES $sqlIngestProbeValues)
         |    p(doc_id, text, lang, source, n_chars)),
         |b AS (
         |  SELECT doc_id, lang, source, n_chars, text,
         |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |  FROM src WHERE doc_id % 4 = 3)
         |SELECT doc_id, lang, source, n_chars FROM b
         |WHERE rn = 1
         |  AND (text IS NULL OR text NOT IN (
         |    SELECT text FROM src WHERE doc_id % 4 <> 3 AND text IS NOT NULL))
         |ORDER BY doc_id""".stripMargin,

    "corpus_curation" ->
      """WITH dedup AS (
        |  SELECT doc_id, lang, text,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM dedup WHERE rn = 1)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  MIN(doc_id) AS first_doc
        |FROM scored WHERE n_tokens >= 30 AND ttr >= 0.3
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "minhash_neardup" ->
      s"""WITH $shingleSqlCte
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         |WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // identical bigram extraction (1-based here, 0-based subscripts
    // engine-side — same pairs), identical smoothing arithmetic and
    // micro-nat quantization
    "bigram_logprob" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
         |  FROM d, UNNEST(range(1, len(ws))) AS u(i)
         |  WHERE len(ws) >= 2),
         |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
         |       FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
         |       FROM bg GROUP BY 1),
         |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab FROM
         |      (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
         |t AS (
         |  SELECT bg.doc_id,
         |    CAST(FLOOR(ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.vocab))
         |      * 1000000.0 + 0.5) AS BIGINT) AS t
         |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(t) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_logprob
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // same recursive closure as the cluster oracles; membership =
    // appearing in `comp`
    "source_dup_rate" ->
      s"""WITH RECURSIVE $neardupClosureSqlCte
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_docs,
         |  ${sqlQ6("CAST(SUM(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)")} AS dup_rate
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same quality CTE (source carried), exact discrete histogram
    "source_quality_mix" ->
      s"""WITH ${qualityCteSql("q", "documents", Seq("source"))}
         |SELECT source, quality, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same binary-string-length pow2 bucket, same sum shapes
    "padding_waste" ->
      s"""WITH d AS (
         |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents),
         |b AS (
         |  SELECT n, CASE WHEN n <= 1 THEN 1
         |    ELSE (CAST(1 AS BIGINT) << length(format('{:b}', n - 1)))
         |    END AS bucket
         |  FROM d)
         |SELECT bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS total_tokens,
         |  CAST(SUM(bucket - n) AS BIGINT) AS total_padding,
         |  ${sqlQ6("CAST(SUM(bucket - n) AS DOUBLE) / CAST(SUM(bucket) AS BIGINT)")} AS waste_frac
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    // same md5 fold (salt boot:v1:), same integer inverse-CDF
    // thresholds, exact integer weighted sums per replicate
    "bootstrap_means" -> {
      val wExpr = BootThresholds.map(t => s"CAST(u >= $t AS INT)")
        .mkString(" + ")
      s"""WITH r AS (
         |  SELECT doc_id, n_chars, unnest(range(1, ${BootB + 1})) AS rep
         |  FROM documents),
         |h AS (
         |  SELECT rep, n_chars,
         |    ${sqlMd5Fold32(BootSalt, "doc_id || ':' || rep")} AS u
         |  FROM r),
         |wts AS (
         |  SELECT rep, n_chars, ($wExpr) AS w FROM h)
         |SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
         |  ${sqlQ6("CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS BIGINT)")} AS mean_chars
         |FROM wts GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // identical IEEE term expression (cs/ns)·ln((cs/ns)/(cc/ntot)),
    // identical micro-nat quantization, order-free integer sum
    // same split, same bins, same ln-micro per-bin quantization
    "psi_drift" ->
      """WITH b AS (
        |  SELECT event_type, ts < TIMESTAMP '2024-01-16' AS is_a,
        |    CAST(FLOOR(value / 25.0) AS BIGINT) AS bin
        |  FROM events),
        |cnt AS (
        |  SELECT event_type, bin,
        |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type,
        |    CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN ca = 0 OR cb = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS skipped_bins,
        |    CAST(COUNT(*) AS BIGINT) AS n_bins
        |  FROM cnt GROUP BY 1)
        |SELECT c.event_type, n_bins, skipped_bins, na, nb,
        |  CAST(SUM(CAST(FLOOR(
        |    (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) *
        |    ln(CAST(ca * nb AS DOUBLE) / CAST(cb * na AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS psi
        |FROM cnt c JOIN tot ON c.event_type = tot.event_type
        |WHERE ca > 0 AND cb > 0
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY c.event_type""".stripMargin,

    "source_kl" ->
      """WITH c AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cs
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |corp AS (SELECT w, CAST(SUM(cs) AS BIGINT) AS cc FROM c GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cs) AS BIGINT) AS ntot FROM c),
        |ns AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM c GROUP BY 1)
        |SELECT c.source,
        |  CAST(SUM(CAST(FLOOR((CAST(cs AS DOUBLE) / ns) *
        |    ln((CAST(cs AS DOUBLE) / ns) / (CAST(cc AS DOUBLE) / ntot)) *
        |    1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS kl_nats
        |FROM c JOIN corp ON c.w = corp.w
        |       JOIN ns ON c.source = ns.source
        |       CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical IEEE term expression (c/n)·ln(n/c), identical 1e-6
    // quantization, order-free integer sum
    "source_entropy" ->
      """WITH c AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |n AS (
        |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS types
        |  FROM c GROUP BY 1)
        |SELECT c.source, MAX(n.n) AS n_tokens, MAX(n.types) AS n_types,
        |  CAST(SUM(CAST(FLOOR((CAST(cnt AS DOUBLE) / n) *
        |    ln(CAST(n AS DOUBLE) / cnt) * 1000000.0 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 1000000.0 AS entropy_nats
        |FROM c JOIN n ON c.source = n.source
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same all-pairs Jaccard CTE as minhash_neardup, aggregated into
    // the source×source matrix; the mass column replays the integer
    // micro-unit sum exactly
    "source_overlap" ->
      s"""WITH $shingleSqlCte,
         |p AS (
         |  SELECT doc_a, doc_b, jaccard FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         |  WHERE jaccard >= 0.5)
         |SELECT LEAST(da.source, db.source) AS source_1,
         |  GREATEST(da.source, db.source) AS source_2,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(CAST(FLOOR(jaccard * 1000000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS jacc_micro_sum
         |FROM p JOIN documents da ON p.doc_a = da.doc_id
         |       JOIN documents db ON p.doc_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // union-by-name semantics replayed from the base table — the
    // engine side must NULL-fill exactly these columns
    "schema_evolution" ->
      """WITH a AS (
        |  SELECT doc_id, lang, NULL AS source, NULL::BIGINT AS n_chars
        |  FROM documents WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT doc_id, NULL AS lang, source, n_chars
        |  FROM documents WHERE doc_id % 2 = 1),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT COUNT(*) AS n_rows,
        |  COUNT(lang) AS nn_lang,
        |  COUNT(source) AS nn_source,
        |  COUNT(n_chars) AS nn_chars,
        |  COUNT(DISTINCT doc_id) AS ndv_doc
        |FROM u""".stripMargin,

    // identical exact-integer-sums z arithmetic, same op order
    "length_outliers" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |st AS (
         |  SELECT source, COUNT(*) AS n,
         |    CAST(SUM(n_tokens) AS BIGINT) AS s1,
         |    CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS s2
         |  FROM d GROUP BY 1)
         |SELECT doc_id, d.source AS source, n_tokens,
         |  ${sqlQ6("(CAST(n_tokens AS DOUBLE) - CAST(s1 AS DOUBLE) / n) / sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))")} AS z
         |FROM d JOIN st ON d.source = st.source
         |WHERE CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) > 0.0
         |  AND abs(${sqlQ6("(CAST(n_tokens AS DOUBLE) - CAST(s1 AS DOUBLE) / n) / sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))")}) > 2.0
         |ORDER BY doc_id""".stripMargin,

    // same discrete ceil-index selection, same IEEE p·n product
    "source_length_quantiles" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_tokens, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM d)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
        |      THEN n_tokens END) AS p50,
        |  MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.9 * n) AS BIGINT))
        |      THEN n_tokens END) AS p90,
        |  MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * n) AS BIGINT))
        |      THEN n_tokens END) AS p99
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // shingle STRINGS stand in for the engine's hash identities —
    // distinct-per-doc grams, df over docs, same ratio arithmetic
    "novelty_score" ->
      s"""WITH $shingleSqlCte,
         |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
         |d AS (SELECT gram, COUNT(DISTINCT doc_id) AS df
         |      FROM g GROUP BY 1)
         |SELECT g.doc_id,
         |  COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unique,
         |  ${sqlQ6("CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)")} AS novelty
         |FROM g JOIN d ON g.gram = d.gram
         |GROUP BY g.doc_id
         |ORDER BY g.doc_id""".stripMargin,

    "bpe_pairs" ->
      """SELECT pair, COUNT(*) AS cnt FROM (
        |  SELECT unnest([substr(text, i, 2) for i in range(1, len(text))])
        |    AS pair
        |  FROM documents WHERE len(text) >= 2)
        |GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

    // every trainer round unrolled as CTEs replaying count -> argmax
    // -> merge -> vocab census; replace() is left-to-right
    // non-overlapping in both engines, i.e. greedy BPE application
    "bpe_train" ->
      s"""WITH $bpeSqlCtes
         |${bpeSqlRoundSelects}
         |ORDER BY merge_round""".stripMargin,

    // the trained chain's final word table joined back to per-source
    // word counts — exact integer census, ratio the only double
    "bpe_apply" ->
      s"""WITH $bpeSqlCtes,
         |fin AS (
         |  SELECT w, CAST(len(string_split(trim(seq, chr(31)),
         |    chr(31) || chr(31))) AS BIGINT) AS n_syms
         |  FROM w$BpeRounds),
         |sw AS (
         |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w
         |    FROM documents)
         |  WHERE w <> '' GROUP BY 1, 2)
         |SELECT source,
         |  CAST(SUM(cnt) AS BIGINT) AS n_words,
         |  CAST(SUM(cnt * len(w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(cnt * n_syms) AS BIGINT) AS n_tokens,
         |  ${sqlQ6("CAST(SUM(cnt * len(w)) AS DOUBLE) / CAST(SUM(cnt * n_syms) AS DOUBLE)")}
         |    AS chars_per_token
         |FROM sw JOIN fin USING (w)
         |GROUP BY source ORDER BY source""".stripMargin,

    // the same recursive closure as neardup_clusters, with jaccard
    // kept at the pair level; the mean sums quantized integers
    "cluster_stats" ->
      s"""WITH RECURSIVE $shingleSqlCte,
         |pj AS (
         |  SELECT doc_a, doc_b, jaccard FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         |  WHERE jaccard >= 0.5),
         |e AS (SELECT doc_a AS u, doc_b AS v FROM pj
         |      UNION ALL SELECT doc_b, doc_a FROM pj),
         |n AS (SELECT DISTINCT u AS node FROM e),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.node),
         |comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
         |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
         |       FROM comp GROUP BY 1),
         |ag AS (
         |  SELECT comp.cluster_id, COUNT(*) AS n_pairs,
         |    MIN(jaccard) AS min_jaccard,
         |    SUM(CAST(FLOOR(jaccard * 1000000.0 + 0.5) AS BIGINT)) AS jsum
         |  FROM pj JOIN comp ON pj.doc_a = comp.node GROUP BY 1)
         |SELECT ag.cluster_id, CAST(sz.cluster_size AS BIGINT) AS cluster_size,
         |  CAST(n_pairs AS BIGINT) AS n_pairs, min_jaccard,
         |  ${sqlQ6("CAST(jsum AS DOUBLE) / (n_pairs * 1000000.0)")} AS mean_jaccard
         |FROM ag JOIN sz ON ag.cluster_id = sz.cluster_id
         |ORDER BY ag.cluster_id""".stripMargin,

    // identical plane literals, identical left-fold dot and floor
    // quantization — the projection is replayed lane by lane
    "embed_project" ->
      s"""WITH pl(pid, c) AS (VALUES
         |    ${(0 until 16).map(h => s"(${h + 1}, ${planeSql(h)})").mkString(",\n    ")}),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pr AS (
         |  SELECT vec_id, pid,
         |    CAST(FLOOR(${sqlDot("e.v", "pl.c")} / 8.0 * 1000000.0 + 0.5)
         |      AS BIGINT) AS p
         |  FROM e CROSS JOIN pl),
         |lanes AS (
         |  SELECT vec_id,
         |    string_agg(CAST(p AS VARCHAR), ',' ORDER BY pid) AS p_csv,
         |    list(CAST(p AS DOUBLE) / 1000000.0 ORDER BY pid) AS pv
         |  FROM pr GROUP BY vec_id)
         |SELECT l.vec_id, l.p_csv,
         |  ${sqlQ6("sqrt(list_reduce(list_prepend(0.0, list_transform(l.pv, x -> x * x)), (acc, x) -> acc + x)) * 2.0")} AS norm_est,
         |  ${sqlQ6(sqlNorm("e.v"))} AS norm_in
         |FROM lanes l JOIN e ON e.vec_id = l.vec_id
         |ORDER BY l.vec_id""".stripMargin,

    // same constant-padding derivation replayed from unnested lists:
    // exact BIGINT moments, one final double ÷/√ per pair (dims
    // interpolated from PqDim so the two sides cannot drift)
    "corr_matrix" ->
      s"""WITH e AS (
        |  SELECT list_append(embedding::DOUBLE[], 1.0) AS v
        |  FROM embeddings),
        |dims AS (SELECT CAST(i AS INTEGER) AS i FROM range(${PqDim + 1}) t(i)),
        |cells AS (
        |  SELECT a.i, b.i AS j,
        |    SUM(CAST(FLOOR(v[a.i + 1] * v[b.i + 1] * 1000000.0 + 0.5)
        |      AS BIGINT)) AS c
        |  FROM e, dims a, dims b WHERE a.i <= b.i
        |  GROUP BY 1, 2),
        |n AS (SELECT c AS n_micro FROM cells
        |      WHERE i = $PqDim AND j = $PqDim),
        |m AS (
        |  SELECT s.i AS dim, s.c AS s, d.c AS ss
        |  FROM (SELECT i, c FROM cells WHERE j = $PqDim AND i < $PqDim) s
        |  JOIN (SELECT i, c FROM cells WHERE i = j AND i < $PqDim) d
        |    ON s.i = d.i)
        |SELECT p.i, p.j,
        |  CAST(FLOOR(
        |    CAST(n_micro * p.c - mi.s * mj.s AS DOUBLE) /
        |    sqrt(CAST(n_micro * mi.ss - mi.s * mi.s AS DOUBLE) *
        |         CAST(n_micro * mj.ss - mj.s * mj.s AS DOUBLE))
        |    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS corr_q6
        |FROM cells p
        |JOIN m mi ON p.i = mi.dim
        |JOIN m mj ON p.j = mj.dim
        |CROSS JOIN n
        |WHERE p.i < p.j AND p.j < $PqDim
        |ORDER BY p.i, p.j""".stripMargin,

    // the unnested-list replay of GramMatrixAgg's quantized products
    // (dimensionality interpolated from PqDim — the engine side's)
    "gram_matrix" ->
      s"""WITH pairs AS (
        |  SELECT CAST(a.i AS INTEGER) AS i, CAST(b.j AS INTEGER) AS j
        |  FROM range($PqDim) a(i), range($PqDim) b(j) WHERE a.i <= b.j),
        |n AS (SELECT COUNT(*) AS n_vecs FROM embeddings)
        |SELECT p.i, p.j, n.n_vecs,
        |  CAST(SUM(CAST(FLOOR(
        |      CAST(embedding[p.i + 1] AS DOUBLE) *
        |      CAST(embedding[p.j + 1] AS DOUBLE) * 1000000.0 + 0.5)
        |    AS BIGINT)) AS DOUBLE) / 1000000.0 AS gram
        |FROM embeddings, pairs p, n
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2""".stripMargin,

    "pmi_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |uc AS (
        |  SELECT w, COUNT(*) AS c
        |  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
        |bg AS (
        |  SELECT p['w1'] AS w1, p['w2'] AS w2
        |  FROM (SELECT unnest([{'w1': ws[i], 'w2': ws[i + 1]}
        |                      for i in range(1, len(ws))]) AS p
        |        FROM toks WHERE len(ws) >= 2)),
        |bc AS (
        |  SELECT w1, w2, COUNT(*) AS c_xy
        |  FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |tot AS (
        |  SELECT CAST(SUM(len(ws)) AS BIGINT) AS n_tok,
        |    CAST(SUM(GREATEST(len(ws) - 1, 0)) AS BIGINT) AS n_big
        |  FROM toks)
        |SELECT w1, w2, c_xy, CAST(
        |    CAST(FLOOR(ln(CAST(c_xy AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |  + 2 * CAST(FLOOR(ln(CAST(n_tok AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |  - CAST(FLOOR(ln(CAST(n_big AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |  - CAST(FLOOR(ln(CAST(u1.c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |  - CAST(FLOOR(ln(CAST(u2.c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |  AS DOUBLE) / 1000000.0 AS pmi
        |FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w, tot
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    // per-source quality rank + the identical deterministic
    // round-robin triple
    "fair_interleave" ->
      s"""WITH ${qualityCteSql("dq", "documents", Seq.empty)},
         |r AS (
         |  SELECT d.doc_id, d.source, dq.quality,
         |    CAST(row_number() OVER (PARTITION BY d.source
         |      ORDER BY dq.quality DESC, d.doc_id) AS BIGINT) AS src_rank
         |  FROM documents d JOIN dq ON dq.doc_id = d.doc_id),
         |h AS (SELECT * FROM r
         |      ORDER BY src_rank, source, doc_id LIMIT 100)
         |SELECT CAST(row_number() OVER (
         |    ORDER BY src_rank, source, doc_id) AS BIGINT) AS out_pos,
         |  doc_id, source, src_rank, quality
         |FROM h ORDER BY out_pos""".stripMargin,

    // brute all-pairs with the identical integer base-cut rule and
    // q6 division; probes replayed verbatim
    "neardup_threshold_curve" -> {
      def probeSql(mod: Int, keepNum: Int, keepDen: Int) =
        s"""SELECT doc_id + 20000000 * $mod AS doc_id,
           |  array_to_string(ws[1:GREATEST((len(ws) * $keepNum) // $keepDen,
           |    3)], ' ') AS text
           |FROM (SELECT doc_id, string_split(text, ' ') AS ws
           |      FROM documents WHERE doc_id % 31 = $mod)""".stripMargin
      s"""WITH curvedocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL ${probeSql(1, 3, 4)}
         |  UNION ALL ${probeSql(2, 11, 20)}
         |  UNION ALL ${probeSql(3, 7, 20)}),
         |${shingleSqlCteFor("curvedocs")},
         |p AS (
         |  SELECT ${sqlQ6("CAST(ni AS DOUBLE) / (na + nb - ni)")} AS jaccard
         |  FROM (
         |    SELECT len(a.s) AS na, len(b.s) AS nb,
         |      len(list_intersect(a.s, b.s)) AS ni
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |  WHERE ni * 13 >= (na + nb) * 3)
         |SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(CAST(FLOOR(jaccard * 1000000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS jacc_micro_sum
         |FROM p, (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
         |                        0.9]::DOUBLE[]) AS tau) g
         |WHERE jaccard >= tau
         |GROUP BY tau ORDER BY tau""".stripMargin
    },

    // sampled twin: same md5 sample selection (salt curvesamp:v1:),
    // same probes and brute pairs over the sample, same Poisson
    // replicate weights (salt curveboot:v1:) from the identical
    // integer thresholds
    "neardup_threshold_curve_sampled" -> {
      def probeSql(mod: Int, keepNum: Int, keepDen: Int) =
        s"""SELECT doc_id + 20000000 * $mod AS doc_id,
           |  array_to_string(ws[1:GREATEST((len(ws) * $keepNum) // $keepDen,
           |    3)], ' ') AS text
           |FROM (SELECT doc_id, string_split(text, ' ') AS ws
           |      FROM smp WHERE doc_id % 31 = $mod)""".stripMargin
      val wExpr = BootThresholds.map(t => s"CAST(u >= $t AS BIGINT)")
        .mkString(" + ")
      s"""WITH hsel AS (
         |  SELECT doc_id, text, lang,
         |    ${sqlMd5Fold32(CurveSampleSalt, "CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM documents),
         |smp AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id)
         |        AS rn
         |    FROM hsel) WHERE rn <= $CurveSampleK),
         |curvedocs AS (
         |  SELECT doc_id, text FROM smp
         |  UNION ALL ${probeSql(1, 3, 4)}
         |  UNION ALL ${probeSql(2, 11, 20)}
         |  UNION ALL ${probeSql(3, 7, 20)}),
         |${shingleSqlCteFor("curvedocs")},
         |p AS (
         |  SELECT doc_a, doc_b,
         |    ${sqlQ6("CAST(ni AS DOUBLE) / (na + nb - ni)")} AS jaccard
         |  FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      len(a.s) AS na, len(b.s) AS nb,
         |      len(list_intersect(a.s, b.s)) AS ni
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |  WHERE ni * 13 >= (na + nb) * 3),
         |pt AS (
         |  SELECT tau, doc_a, doc_b, jaccard
         |  FROM p, (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
         |                          0.9]::DOUBLE[]) AS tau) g
         |  WHERE jaccard >= tau),
         |point AS (
         |  SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CAST(FLOOR(jaccard * 1000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS jacc_micro_sum
         |  FROM pt GROUP BY tau),
         |wts AS (
         |  SELECT tau, rep, ($wExpr) AS w FROM (
         |    SELECT tau, rep,
         |      ${sqlMd5Fold32(CurveBootSalt,
                  "doc_a || ':' || doc_b || ':' || rep")} AS u
         |    FROM pt, (SELECT unnest(range(1, ${BootB + 1})) AS rep) r)),
         |band AS (
         |  SELECT tau, CAST(MIN(wsum) AS BIGINT) AS boot_lo,
         |    CAST(MAX(wsum) AS BIGINT) AS boot_hi
         |  FROM (SELECT tau, rep, SUM(w) AS wsum FROM wts GROUP BY 1, 2)
         |  GROUP BY tau)
         |SELECT tau, n_pairs, jacc_micro_sum, boot_lo, boot_hi
         |FROM point JOIN band USING (tau) ORDER BY tau""".stripMargin
    },

    // every stage replayed independently: text IN for exact, brute
    // cross Jaccard for both near stages, recursive closure for the
    // within-batch clusters
    "incremental_curation" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |batch AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 30000000, text FROM documents
         |  WHERE doc_id % 10 <> 0 AND doc_id % 17 = 2
         |  UNION ALL
         |  SELECT doc_id + 40000000, text || ' ingestprobe' FROM documents
         |  WHERE doc_id % 10 <> 0 AND doc_id % 23 = 3
         |  UNION ALL
         |  SELECT doc_id + 50000000, text || ' twinprobeA' FROM documents
         |  WHERE doc_id % 10 = 0 AND doc_id % 13 = 1
         |  UNION ALL
         |  SELECT doc_id + 60000000, text || ' twinprobeB' FROM documents
         |  WHERE doc_id % 10 = 0 AND doc_id % 13 = 1),
         |s1 AS (
         |  SELECT doc_id, text FROM batch
         |  WHERE text NOT IN (SELECT text FROM corpus)),
         |sh1 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 3 THEN
         |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |                     for i in range(1, len(ws) - 1)])
         |    ELSE [text] END AS s
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
         |        FROM s1)),
         |shc AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 3 THEN
         |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |                     for i in range(1, len(ws) - 1)])
         |    ELSE [text] END AS s
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
         |        FROM corpus)),
         |hits AS (
         |  SELECT DISTINCT a.doc_id FROM sh1 a, shc b
         |  WHERE ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} >= 0.5),
         |s2 AS (
         |  SELECT doc_id, text FROM s1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
         |sh2 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 3 THEN
         |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |                     for i in range(1, len(ws) - 1)])
         |    ELSE [text] END AS s
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
         |        FROM s2)),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |  WHERE ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} >= 0.5),
         |e AS (SELECT doc_a AS u, doc_b AS v FROM p
         |      UNION ALL SELECT doc_b, doc_a FROM p),
         |n AS (SELECT DISTINCT u AS node FROM e),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.node),
         |comp AS (SELECT node, min(lbl) AS cluster_id FROM reach
         |         GROUP BY node),
         |adm AS (
         |  SELECT doc_id FROM s2 WHERE doc_id NOT IN (
         |    SELECT node FROM comp WHERE node <> cluster_id))
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_no, 'arrived' AS stage,
         |    CAST((SELECT COUNT(*) FROM batch) AS BIGINT) AS n_docs
         |  UNION ALL SELECT 2, 'after_exact',
         |    CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
         |  UNION ALL SELECT 3, 'after_corpus_neardup',
         |    CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
         |  UNION ALL SELECT 4, 'admitted',
         |    CAST((SELECT COUNT(*) FROM adm) AS BIGINT)
         |  UNION ALL SELECT 5, 'corpus_after',
         |    CAST((SELECT COUNT(*) FROM corpus) +
         |         (SELECT COUNT(*) FROM adm) AS BIGINT))
         |ORDER BY stage_no""".stripMargin,

    // the cross-split brute scan the banded incremental search must
    // equal: every (batch, corpus) pair at string Jaccard >= tau
    "incremental_neardup" ->
      s"""WITH batch AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 10000000, text || ' incrementalprobe'
         |  FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 23 = 3),
         |corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |shb AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 3 THEN
         |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |                     for i in range(1, len(ws) - 1)])
         |    ELSE [text] END AS s
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM batch)),
         |shc AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 3 THEN
         |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |                     for i in range(1, len(ws) - 1)])
         |    ELSE [text] END AS s
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM corpus))
         |SELECT batch_doc, corpus_doc, jaccard FROM (
         |  SELECT b.doc_id AS batch_doc, c.doc_id AS corpus_doc,
         |    ${sqlQ6("CAST(len(list_intersect(b.s, c.s)) AS DOUBLE) / len(list_distinct(list_concat(b.s, c.s)))")} AS jaccard
         |  FROM shb b CROSS JOIN shc c) t
         |WHERE jaccard >= 0.5
         |ORDER BY batch_doc, corpus_doc""".stripMargin,

    // transitive closure of the SAME exact-Jaccard pair set, via a
    // recursive CTE: reach(node, lbl) holds every label that can flow
    // to node along edges; min per node = the component's smallest id
    "neardup_clusters" ->
      s"""WITH RECURSIVE $neardupClosureSqlCte,
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM comp GROUP BY cluster_id)
         |SELECT comp.node AS doc_id, comp.cluster_id,
         |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
         |FROM comp JOIN sz USING (cluster_id)
         |ORDER BY cluster_id, doc_id""".stripMargin,

    // the incremental merge must equal a from-scratch recompute of
    // the full closure — the neardup_clusters oracle, verbatim
    "incremental_clusters" ->
      s"""WITH RECURSIVE $neardupClosureSqlCte,
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM comp GROUP BY cluster_id)
         |SELECT comp.node AS doc_id, comp.cluster_id,
         |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
         |FROM comp JOIN sz USING (cluster_id)
         |ORDER BY cluster_id, doc_id""".stripMargin,

    "neardup_dedup" ->
      s"""WITH RECURSIVE $neardupClosureSqlCte
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)
         |ORDER BY doc_id""".stripMargin,

    // same closure; canonical = per-cluster argmax (quality, -doc_id)
    "neardup_dedup_quality" ->
      s"""WITH RECURSIVE $neardupClosureSqlCte,
         |${qualityCteSql("dq", "documents", Seq.empty)},
         |keep AS (
         |  SELECT cluster_id, node AS keep_doc FROM (
         |    SELECT comp.cluster_id, comp.node,
         |      row_number() OVER (PARTITION BY comp.cluster_id
         |        ORDER BY dq.quality DESC, comp.node) AS rn
         |    FROM comp JOIN dq ON dq.doc_id = comp.node) t
         |  WHERE rn = 1)
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (
         |  SELECT node FROM comp JOIN keep USING (cluster_id)
         |  WHERE node <> keep_doc)
         |ORDER BY doc_id""".stripMargin,

    // pure-SQL mirror: 8-token span strings built directly (the hash
    // identity only gates engine-side candidates and is invisible in
    // the result contract)
    "dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(ws[i:i+7], ' ')
        |            for i in range(1, len(ws) - 6)]) AS span_text
        |  FROM t WHERE len(ws) >= 8)
        |SELECT span_text, COUNT(DISTINCT doc_id) AS n_docs,
        |  COUNT(*) AS n_occurrences, MIN(doc_id) AS first_doc
        |FROM g GROUP BY span_text
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY span_text""".stripMargin,

    // strings replay the fingerprint identity; the same
    // gaps-and-islands window coalesces diagonal-consecutive shared
    // windows into maximal runs
    "dup_span_runs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, u.pos AS pos, u.sp AS sp FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i, 'sp': array_to_string(ws[i:i+7], ' ')}
        |              for i in range(1, len(ws) - 6)]) AS u
        |    FROM t WHERE len(ws) >= 8)),
        |el AS (SELECT sp FROM g GROUP BY sp
        |       HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 16),
        |sh AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.pos AS pos_a, b.pos AS pos_b
        |  FROM g a JOIN g b ON a.sp = b.sp AND a.doc_id < b.doc_id
        |  JOIN el ON el.sp = a.sp),
        |r AS (
        |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
        |    pos_a - row_number() OVER (
        |      PARTITION BY doc_a, doc_b, pos_a - pos_b
        |      ORDER BY pos_a) AS island
        |  FROM sh)
        |SELECT doc_a, doc_b, MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(COUNT(*) + 7 AS BIGINT) AS run_tokens
        |FROM r GROUP BY doc_a, doc_b, diag, island
        |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin,

    // per-source caps: rank prefix / running-sum strict prefix, both
    // scanned in doc_id order
    "source_cap_docs" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,

    "source_cap_tokens" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM c WHERE cum <= 800
        |ORDER BY doc_id""".stripMargin,

    // the guarantee, not the hash values: every pair sharing a
    // 6-token run (rebuilt here from gram STRINGS) must come out of
    // the engine with shares_fingerprint = TRUE — any FALSE (or any
    // pair-set divergence) breaks the row hash
    "winnow_containment" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(winnowProbes)}) pr(doc_id, text)),
         |g AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(ws[i:i+5], ' ')
         |            for i in range(1, len(ws) - 4)]) AS run
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM d)
         |  WHERE len(ws) >= 6)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  TRUE AS shares_fingerprint
         |FROM g a JOIN g b ON a.run = b.run AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the minhash_neardup pair oracle x the hash_split label oracle,
    // cross-split filtered exactly like the engine
    "decontaminate" ->
      s"""WITH $shingleSqlCte,
         |p AS (
         |  SELECT doc_a, doc_b, jaccard FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         |  WHERE jaccard >= 0.5),
         |lab AS (
         |  SELECT doc_id, $sqlSplitCase AS split
         |  FROM (
         |    SELECT doc_id,
         |      ${sqlMd5Fold32("split:v1:", "CAST(doc_id AS VARCHAR)")} AS v
         |    FROM documents)),
         |x AS (
         |  SELECT p.doc_a, p.doc_b, p.jaccard, la.split AS sa, lb.split AS sb
         |  FROM p JOIN lab la ON la.doc_id = p.doc_a
         |         JOIN lab lb ON lb.doc_id = p.doc_b
         |  WHERE (la.split = 'train') <> (lb.split = 'train'))
         |SELECT
         |  CASE WHEN sa = 'train' THEN doc_a ELSE doc_b END AS train_doc,
         |  CASE WHEN sa = 'train' THEN doc_b ELSE doc_a END AS eval_doc,
         |  CASE WHEN sa = 'train' THEN sb ELSE sa END AS eval_split,
         |  jaccard
         |FROM x ORDER BY train_doc, eval_doc""".stripMargin,

    // exact-text anti-join over the same planted corpus — the bloom
    // bitset is an engine-side pruning detail the oracle need not
    // replay, because the confirm join makes the result exact
    "bloom_decontaminate" ->
      """WITH base AS (
        |  SELECT doc_id, text, lang, source FROM documents),
        |corpus AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT -doc_id, text, lang, source FROM base
        |  WHERE doc_id % 13 = 0 AND doc_id % 2 = 1),
        |ev AS (SELECT text FROM base WHERE doc_id % 13 = 0)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM corpus d
        |WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.text = d.text)
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // byte-true frame/thumb mirror over the hex image of encode(text):
    // frame i covers bytes [i*(n-8) DIV 3, +8); thumb byte j is input
    // byte floor(j*n/16)
    "binary_frames" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT -1, '$nonAsciiProbeText'),
         |b AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |         octet_length(encode(text)) AS n
         |  FROM src),
         |f AS (SELECT doc_id, h, n, unnest(range(0, 4)) AS frame_no FROM b)
         |SELECT doc_id,
         |  CAST(frame_no AS BIGINT) AS frame_no,
         |  CAST(frame_no * greatest(n - 8, 0) // 3 AS BIGINT) AS frame_off,
         |  lower(substring(h, CAST(2 * (frame_no * greatest(n - 8, 0) // 3) + 1 AS INT), 16)) AS frame_hex,
         |  lower(array_to_string(list_transform(range(0, 16), j ->
         |    substring(h, CAST(2 * (j * n // 16) + 1 AS INT), 2)), '')) AS thumb_hex
         |FROM f ORDER BY doc_id, frame_no""".stripMargin,

    // split mirror: same md5-prefix hash (folded from hex digits),
    // same integer thresholds floor(0.8*2^32) / floor(0.9*2^32)
    "hash_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ${sqlMd5Fold32("split:v1:", "CAST(doc_id AS VARCHAR)")} AS v
         |  FROM documents),
         |s AS (
         |  SELECT lang, doc_id, $sqlSplitCase AS split
         |  FROM h)
         |SELECT lang, split, COUNT(*) AS n_docs,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    // pure-SQL mirror: 8-token span STRINGS (the fp identity is an
    // engine-side transport detail, invisible in the result contract)
    // x the hash_split label CTE
    "eval_overlap_rate" ->
      s"""WITH lab AS (
         |  SELECT doc_id, $sqlSplitCase AS split, ws FROM (
         |    SELECT doc_id,
         |      ${sqlMd5Fold32("split:v1:", "CAST(doc_id AS VARCHAR)")} AS v,
         |      string_split(text, ' ') AS ws
         |    FROM documents)),
         |g AS (
         |  SELECT doc_id, split,
         |    unnest([array_to_string(ws[i:i+7], ' ')
         |            for i in range(1, len(ws) - 6)]) AS sp
         |  FROM lab WHERE len(ws) >= 8),
         |train AS (SELECT DISTINCT sp FROM g WHERE split = 'train'),
         |agg AS (
         |  SELECT e.doc_id, e.split,
         |    CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(CASE WHEN t.sp IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_contaminated
         |  FROM g e LEFT JOIN train t ON e.sp = t.sp
         |  WHERE e.split <> 'train'
         |  GROUP BY 1, 2)
         |SELECT doc_id, split, n_grams, n_contaminated,
         |  ${sqlQ6("CAST(n_contaminated AS DOUBLE) / n_grams")}
         |    AS contamination_q6
         |FROM agg ORDER BY doc_id""".stripMargin,

    // the neardup closure x the hash_split labeling: move each
    // clustered doc to its cluster canonical's split
    "split_repair" ->
      s"""WITH RECURSIVE $neardupClosureSqlCte,
         |lab AS (
         |  SELECT doc_id, $sqlSplitCase AS split
         |  FROM (
         |    SELECT doc_id,
         |      ${sqlMd5Fold32("split:v1:", "CAST(doc_id AS VARCHAR)")} AS v
         |    FROM documents)),
         |m AS (
         |  SELECT comp.node, la.split AS from_split, lb.split AS to_split
         |  FROM comp JOIN lab la ON la.doc_id = comp.node
         |            JOIN lab lb ON lb.doc_id = comp.cluster_id
         |  WHERE la.split <> lb.split)
         |SELECT from_split, to_split, CAST(COUNT(*) AS BIGINT) AS n_moved,
         |  MIN(node) AS min_doc, MAX(node) AS max_doc
         |FROM m GROUP BY 1, 2 ORDER BY from_split, to_split""".stripMargin,

    // the MG summary is an engine-side pruning detail the oracle need
    // not replay — the confirm recount makes the result the plain
    // exact frequency filter
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |t AS (SELECT term FROM toks WHERE length(term) > 0),
        |n AS (SELECT COUNT(*) AS n FROM t),
        |c AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term)
        |SELECT term, cnt FROM c CROSS JOIN n
        |WHERE cnt * 64 >= n
        |ORDER BY cnt DESC, term""".stripMargin,

    // the per-source twin: exact grouped heavy terms — the MG
    // candidate pass is engine-side pruning with a per-source
    // guarantee margin, so the oracle is the plain grouped count
    "source_heavy_terms" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |t AS (SELECT source, term, COUNT(*) AS cnt FROM toks
        |      WHERE length(term) > 0 GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n
        |       FROM t GROUP BY 1)
        |SELECT t.source AS source, term, cnt
        |FROM t JOIN ns ON t.source = ns.source
        |WHERE cnt * 64 >= n
        |ORDER BY t.source, cnt DESC, term""".stripMargin,

    // brute-force all-pairs with the same planted probes — the
    // deletion blocking is engine-side pruning with provably exact
    // recall, so the oracle need not replay it
    "fuzzy_match" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name FROM customer
        |  UNION ALL
        |  SELECT -c_custkey,
        |    substr(c_name, 1, 9) || 'X' || substr(c_name, 11)
        |  FROM customer WHERE c_custkey % 37 = 5)
        |SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY key_a, key_b""".stripMargin,

    "fuzzy_match2" ->
      """WITH c AS (
        |  SELECT doc_id, substr(text, 1, 20) AS k FROM documents
        |  UNION ALL
        |  SELECT -doc_id - 1,
        |    substr(substr(text, 1, 20), 1, 8) || 'XY'
        |      || substr(substr(text, 1, 20), 11)
        |  FROM documents WHERE doc_id % 37 = 5)
        |SELECT a.doc_id AS key_a, b.doc_id AS key_b,
        |  CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.k, b.k) <= 2
        |ORDER BY key_a, key_b""".stripMargin,

    // identical integer largest-remainder arithmetic, window spelling
    "penny_allocation" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |o AS (
        |  SELECT o_orderkey,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS t
        |  FROM orders),
        |j AS (
        |  SELECT li.*, o.t,
        |    CAST(SUM(w) OVER (PARTITION BY l_orderkey) AS BIGINT) AS tw
        |  FROM li JOIN o ON l_orderkey = o_orderkey),
        |b AS (
        |  SELECT *, (t * w) // tw AS base, (t * w) % tw AS rem FROM j),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber) AS rk,
        |    t - CAST(SUM(base) OVER (PARTITION BY l_orderkey) AS BIGINT)
        |      AS leftover
        |  FROM b)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc_cents
        |FROM r ORDER BY 1, 2""".stripMargin,

    // brute all-pairs levenshtein + recursive-CTE undirected closure:
    // the independent replay of blocking+verify+components
    "record_linkage" ->
      """WITH RECURSIVE rec AS (
        |  SELECT doc_id AS rid, substr(text, 1, 20) AS k FROM documents
        |  UNION ALL
        |  SELECT -doc_id - 1,
        |    substr(substr(text, 1, 20), 1, 8) || 'X'
        |      || substr(substr(text, 1, 20), 10)
        |  FROM documents WHERE doc_id % 37 = 5
        |  UNION ALL
        |  SELECT -doc_id - 5000000,
        |    substr(substr(text, 1, 20), 1, 14) || 'Y'
        |      || substr(substr(text, 1, 20), 16)
        |  FROM documents WHERE doc_id % 37 = 5),
        |lp AS (
        |  SELECT a.rid AS u, b.rid AS v FROM rec a JOIN rec b
        |  ON a.rid < b.rid AND levenshtein(a.k, b.k) <= 1),
        |e AS (SELECT u, v FROM lp UNION SELECT v, u FROM lp),
        |nodes AS (SELECT DISTINCT u AS node FROM e),
        |r(a, b) AS (
        |  SELECT u, v FROM e
        |  UNION
        |  SELECT r.a, e2.v FROM r JOIN e e2 ON r.b = e2.u),
        |rs AS (SELECT a, b FROM r UNION SELECT node, node FROM nodes),
        |lab AS (SELECT a AS node, MIN(b) AS entity FROM rs GROUP BY 1)
        |SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_records,
        |  CAST(SUM(CASE WHEN node < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dirty,
        |  MIN(node) AS min_id, MAX(node) AS max_id
        |FROM lab GROUP BY 1 ORDER BY entity""".stripMargin,

    // same md5 fold (salt 'wsamp:v1:'), same -ln(u)/w arithmetic
    // quantized pre-ranking — both engines draw the identical sample
    "weighted_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, n_chars,
         |    ${sqlMd5Fold32("wsamp:v1:", "CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM documents WHERE n_chars > 0),
         |q AS (
         |  SELECT doc_id, n_chars,
         |    CAST(FLOOR(-ln((hv + 1) / 4294967296.0) / n_chars
         |      * 1000000000.0 + 0.5) AS BIGINT) AS qs
         |  FROM h),
         |r AS (SELECT * FROM q ORDER BY qs, doc_id LIMIT 50)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY qs, doc_id) AS BIGINT)
         |    AS rank,
         |  doc_id, n_chars, qs
         |FROM r ORDER BY rank""".stripMargin,

    // same md5-prefix fold (salt 'strat:v1:'), same (hv, doc_id)
    // ranking — both engines draw the identical per-language sample
    "stratified_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ${sqlMd5Fold32("strat:v1:", "CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
         |  FROM h)
         |SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id
         |FROM r WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    // same md5-prefix hash as hash_split (salt 'mix:v1:'); whole-copy
    // and fractional-threshold CASEs interpolate the engine's integer
    // literals, so the two sides cannot drift on a float rounding
    "mixture_resample" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ${sqlMd5Fold32("mix:v1:", "CAST(doc_id AS VARCHAR)")} AS v
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang,
         |    ${mixCaseSql(graft.operators.Sampling.baseCopies)}
         |      + CASE WHEN v < ${mixCaseSql(graft.operators.Sampling.fracThreshold32)}
         |             THEN 1 ELSE 0 END AS copies
         |  FROM h)
         |SELECT doc_id, lang, CAST(unnest(range(0, copies)) AS BIGINT) AS copy_no
         |FROM c WHERE copies > 0
         |ORDER BY doc_id, copy_no""".stripMargin,

    // budget contract mirror: per bucket keep the n*=15 smallest
    // members (smallest n with C(n,2) >= K=100), emit the first K
    // pairs in index-lexicographic order
    "pair_budget" ->
      """WITH m AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        |  FROM documents),
        |k AS (SELECT * FROM m WHERE rk <= 15),
        |p AS (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    row_number() OVER (PARTITION BY a.lang ORDER BY a.rk, b.rk) AS pr
        |  FROM k a JOIN k b ON a.lang = b.lang AND b.rk > a.rk)
        |SELECT DISTINCT doc_a, doc_b FROM p WHERE pr <= 100
        |ORDER BY doc_a, doc_b""".stripMargin,

    // boilerplate mirror: hot = trimmed lines in >= 2 distinct docs
    // (the engine groups by the line's 128-bit fingerprint instead of
    // the string — same partition of lines, collisions aside at ~2e-20)
    "line_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(boilerplateProbes)}) p(doc_id, text)),
         |l AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(string_split(text, chr(10))))) AS pos,
         |    unnest(string_split(text, chr(10))) AS line
         |  FROM d),
         |hot AS (
         |  SELECT trim(line) AS lkey FROM l
         |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (SELECT * FROM l WHERE trim(line) NOT IN (SELECT lkey FROM hot)),
         |o AS (
         |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct,
         |    COUNT(*) AS nk
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(o.ct, '') AS clean_text,
         |  CAST(COALESCE(o.nk, 0) AS BIGINT) AS n_kept,
         |  CAST(len(string_split(d.text, chr(10))) - COALESCE(o.nk, 0) AS BIGINT) AS n_dropped
         |FROM d LEFT JOIN o USING (doc_id) ORDER BY doc_id""".stripMargin,

    // identical Java/RE2-subset patterns, identical replacement order;
    // DuckDB regexp_replace needs the explicit 'g' flag
    "pii_redact" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(piiProbes)}) p(doc_id, text))
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${graft.operators.TextCleanup.EmailRe}', '[EMAIL]', 'g'),
         |    '${graft.operators.TextCleanup.Ipv4Re}', '[IP]', 'g'),
         |    '${graft.operators.TextCleanup.PhoneRe}', '[PHONE]', 'g') AS clean_text,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextCleanup.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextCleanup.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextCleanup.PhoneRe}')) AS BIGINT) AS n_phones
         |FROM d ORDER BY doc_id""".stripMargin,

    "repetition_stats" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(repetitionProbes)}) p(doc_id, text)),
         |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d),
         |t AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
         |c AS (SELECT doc_id, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
         |top AS (
         |  SELECT doc_id, ${sqlQ6("CAST(MAX(n) AS DOUBLE) / SUM(n)")} AS top_token_frac
         |  FROM c GROUP BY 1),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 2 THEN 0.0 ELSE ${sqlQ6(
             "1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)), " +
               "i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1)")} END
         |      AS dup_bigram_frac
         |  FROM tk)
         |SELECT top.doc_id, top_token_frac, dup_bigram_frac
         |FROM top JOIN bg ON top.doc_id = bg.doc_id
         |ORDER BY top.doc_id""".stripMargin,

    "doc_chunks" ->
      s"""WITH ${sqlChunkCtes("documents")}
         |SELECT doc_id, $sqlChunkCols
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // offset-packing mirror: same chunk CTEs as doc_chunks, the same
    // md5 bucket fold as hash_split (salt pack:v1:), one window
    "pack_sequences" ->
      s"""WITH ${sqlChunkCtes("documents")},
         |ch AS (
         |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |    CAST(LEAST(chunk_id*12+16, n) - chunk_id*12 AS BIGINT) AS n_tokens
         |  FROM c),
         |b AS (
         |  SELECT doc_id, chunk_id, n_tokens,
         |    CAST(${sqlMd5Fold32("pack:v1:", "CAST(doc_id AS VARCHAR)")} % 8 AS INT) AS bucket
         |  FROM ch),
        |s AS (
        |  SELECT bucket, doc_id, chunk_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket
        |      ORDER BY doc_id, chunk_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM b)
        |SELECT bucket, CAST(bef // 64 AS BIGINT) AS seq_id,
        |  COUNT(*) AS n_chunks, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN({'doc_id': doc_id, 'chunk_id': chunk_id}).doc_id AS first_doc,
        |  MIN({'doc_id': doc_id, 'chunk_id': chunk_id}).chunk_id AS first_chunk
        |FROM s GROUP BY bucket, bef // 64
        |ORDER BY bucket, seq_id""".stripMargin,

    // the composed pass: line-dedup CTEs (over corpus + BOTH probe
    // families) → redaction → length gate → chunk-window math, each
    // mirrored from its standalone oracle above
    "training_rows" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(boilerplateProbes)}) p1(doc_id, text)
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(piiProbes)}) p2(doc_id, text)),
         |l AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(string_split(text, chr(10))))) AS pos,
         |    unnest(string_split(text, chr(10))) AS line
         |  FROM d),
         |hot AS (
         |  SELECT trim(line) AS lkey FROM l
         |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (SELECT * FROM l WHERE trim(line) NOT IN (SELECT lkey FROM hot)),
         |o AS (
         |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct
         |  FROM kept GROUP BY doc_id),
         |r AS (
         |  SELECT d.doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      replace(COALESCE(o.ct, ''), chr(10), ' '),
         |      '${graft.operators.TextCleanup.EmailRe}', '[EMAIL]', 'g'),
         |      '${graft.operators.TextCleanup.Ipv4Re}', '[IP]', 'g'),
         |      '${graft.operators.TextCleanup.PhoneRe}', '[PHONE]', 'g') AS text
         |  FROM d LEFT JOIN o USING (doc_id)),
         |${sqlChunkCtes("r", " WHERE len(string_split(COALESCE(text, ''), ' ')) >= 5")}
         |SELECT doc_id, $sqlChunkCols
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // the full corpus→dataloader replay: every stage of
    // fullCurationStages mirrored from its standalone oracle — exact
    // dedup (by text), md5 split, exact-Jaccard pairs over the
    // post-dedup corpus, recursive closure of the train–train edges,
    // cross-split contamination, line dedup, redaction, quality gate,
    // the greedy cumulative-sum budget, then the chunk + pack math
    "full_curation" ->
      s"""WITH RECURSIVE $fullCurationSqlCtes
         |SELECT bucket, CAST(bef // 64 AS BIGINT) AS seq_id,
         |  COUNT(*) AS n_chunks, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  MIN({'doc_id': doc_id, 'chunk_id': chunk_id}).doc_id AS first_doc,
         |  MIN({'doc_id': doc_id, 'chunk_id': chunk_id}).chunk_id AS first_chunk
         |FROM st GROUP BY bucket, bef // 64
         |ORDER BY bucket, seq_id""".stripMargin,

    // the same ten-stage chain, reported as a funnel: row counts at
    // each major stage — the run report every curation owner reads
    "curation_funnel" ->
      s"""WITH RECURSIVE $fullCurationSqlCtes,
         |sq AS (SELECT DISTINCT bucket, bef // 64 AS seq_id FROM st)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_no, 'input' AS stage,
         |    COUNT(*) AS n_rows FROM d0
         |  UNION ALL SELECT 2, 'after_exact_dedup', COUNT(*) FROM ed
         |  UNION ALL SELECT 3, 'train_survivors', COUNT(*) FROM surv
         |  UNION ALL SELECT 4, 'quality_gated', COUNT(*) FROM g
         |  UNION ALL SELECT 5, 'budget_selected', COUNT(*) FROM sel
         |  UNION ALL SELECT 6, 'packed_sequences', COUNT(*) FROM sq)
         |ORDER BY stage_no""".stripMargin,
  ) ++ staticOracleTail

  /** SQL-twin rows (`*_sql`): the TVF text path must produce the
    * IDENTICAL result, so each twin shares its library row's oracle
    * verbatim (the bm25_indexed pattern). */
  private val staticOracle: Map[String, String] = staticOracleBase ++ Map(
    "neardup_dedup_sql" -> staticOracleBase("neardup_dedup"),
    "pack_sql" -> staticOracleBase("pack_sequences"),
    "budget_select_sql" -> staticOracleBase("token_budget_select"))

  /** The full_curation oracle's CTE chain (everything up to and
    * including `st`) — shared verbatim with `curation_funnel`, so the
    * funnel counts are per-stage views of the SAME replayed pipeline,
    * not a second implementation. Must follow `WITH RECURSIVE`. */
  private def fullCurationSqlCtes: String =
      s"""d0 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${sqlProbeValues(fullCurationProbes)}) pr(doc_id, text)),
         |ed AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |    FROM d0) t WHERE rn = 1),
         |lab AS (
         |  SELECT doc_id, $sqlSplitCase AS split FROM (
         |    SELECT doc_id,
         |      ${sqlMd5Fold32("split:v1:", "CAST(doc_id AS VARCHAR)")} AS v
         |    FROM ed)),
         |${shingleSqlCteFor("ed")},
         |p AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
         |  WHERE jaccard >= 0.5),
         |pl AS (
         |  SELECT p.doc_a, p.doc_b, la.split AS sa, lb.split AS sb
         |  FROM p JOIN lab la ON la.doc_id = p.doc_a
         |         JOIN lab lb ON lb.doc_id = p.doc_b),
         |tp AS (SELECT doc_a, doc_b FROM pl
         |       WHERE sa = 'train' AND sb = 'train'),
         |e AS (SELECT doc_a AS u, doc_b AS v FROM tp
         |      UNION ALL SELECT doc_b, doc_a FROM tp),
         |n AS (SELECT DISTINCT u AS node FROM e),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.node),
         |comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
         |contam AS (
         |  SELECT DISTINCT CASE WHEN sa = 'train' THEN doc_a ELSE doc_b END AS doc_id
         |  FROM pl WHERE (sa = 'train') <> (sb = 'train')),
         |surv AS (
         |  SELECT ed.doc_id, ed.text FROM ed JOIN lab USING (doc_id)
         |  WHERE lab.split = 'train'
         |    AND doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |l AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(string_split(text, chr(10))))) AS pos,
         |    unnest(string_split(text, chr(10))) AS line
         |  FROM surv),
         |hot AS (
         |  SELECT trim(line) AS lkey FROM l
         |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (SELECT * FROM l WHERE trim(line) NOT IN (SELECT lkey FROM hot)),
         |o AS (
         |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct
         |  FROM kept GROUP BY doc_id),
         |r AS (
         |  SELECT surv.doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      replace(COALESCE(o.ct, ''), chr(10), ' '),
         |      '${graft.operators.TextCleanup.EmailRe}', '[EMAIL]', 'g'),
         |      '${graft.operators.TextCleanup.Ipv4Re}', '[IP]', 'g'),
         |      '${graft.operators.TextCleanup.PhoneRe}', '[PHONE]', 'g') AS text
         |  FROM surv LEFT JOIN o USING (doc_id)),
         |${qualityCteSql("q2", "r", Seq("text"))},
         |g AS (SELECT * FROM q2 WHERE quality >= 0.625),
         |cm AS (
         |  SELECT doc_id, text, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |                        ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM g),
         |sel AS (SELECT doc_id, text FROM cm
         |        WHERE cum <= (SELECT SUM(n_tokens) * 2 // 5 FROM g)),
         |${sqlChunkCtes("sel", " WHERE len(string_split(COALESCE(text, ''), ' ')) >= 5")},
         |ch AS (
         |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |    CAST(LEAST(chunk_id*12+16, n) - chunk_id*12 AS BIGINT) AS n_tokens
         |  FROM c),
         |bk AS (
         |  SELECT doc_id, chunk_id, n_tokens,
         |    CAST(${sqlMd5Fold32("pack:v1:", "CAST(doc_id AS VARCHAR)")} % 8 AS INT) AS bucket
         |  FROM ch),
         |st AS (
         |  SELECT bucket, doc_id, chunk_id, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket
         |      ORDER BY doc_id, chunk_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         |  FROM bk)""".stripMargin

  /** The oracle entries that syntactically follow the extracted
    * full-curation CTE chain — concatenated into [[staticOracle]]. */
  private lazy val staticOracleTail: Map[String, String] = Map(
    // positional (NON-distinct) 3-grams — unlike the dedup CTE
    "shingle_vocab" ->
      """WITH g AS (
        |  SELECT unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                 for i in range(1, len(ws) - 1)]) AS gram
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3),
        |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram)
        |SELECT cnt AS gram_count, count(*) AS n_grams
        |FROM c GROUP BY cnt ORDER BY gram_count""".stripMargin,

    "ngram_jaccard" ->
      s"""WITH $shingleSqlCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
         |ORDER BY doc_a""".stripMargin,

    // brute all-pairs over shingle STRINGS — independently verifies
    // the prefix-filter candidates' recall AND precision
    "exact_jaccard_join" ->
      s"""WITH $shingleSqlCte,
         |g AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |sz AS (SELECT doc_id, len(s) AS n FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(sa.n AS BIGINT) AS n_a,
         |  CAST(sb.n AS BIGINT) AS n_b, n_inter,
         |  ${sqlQ6("CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)")} AS jaccard
         |FROM inter
         |JOIN sz sa ON doc_a = sa.doc_id
         |JOIN sz sb ON doc_b = sb.doc_id
         |WHERE 3 * n_inter >= sa.n + sb.n
         |ORDER BY doc_a, doc_b""".stripMargin,

    "mixture_apportion" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM per),
        |quotas AS (
        |  SELECT source, n_docs,
        |    (300 * n_docs) // n_total AS base,
        |    (300 * n_docs) % n_total AS rem
        |  FROM per CROSS JOIN tot),
        |lo AS (SELECT 300 - CAST(SUM(base) AS BIGINT) AS leftover
        |       FROM quotas),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
        |    AS BIGINT) AS rrank
        |  FROM quotas)
        |SELECT source, n_docs,
        |  CAST(base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc
        |FROM ranked CROSS JOIN lo
        |ORDER BY source""".stripMargin,

    // independent tokenization + adjacency spelling (list indexing
    // over string_split), overlap-correct where substring counting
    // is not
    "phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, ws[i + 1] AS tok, i AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents),
        |    unnest(range(0, len(ws))) AS t(i))
        |SELECT a.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM toks a JOIN toks b
        |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.tok = 'table' AND b.tok = 'hash'
        |GROUP BY 1 ORDER BY a.doc_id""".stripMargin,

    "vocab_growth" ->
      s"""WITH d AS (
         |  SELECT DISTINCT source, t.tok
         |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)),
         |np AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new
         |  FROM (SELECT tok, MIN(source) AS source FROM d GROUP BY 1)
         |  GROUP BY 1),
         |dp AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct
         |  FROM d GROUP BY 1)
         |SELECT dp.source, n_distinct,
         |  COALESCE(n_new, 0) AS n_new,
         |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY dp.source
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab,
         |  ${sqlQ6("CAST(COALESCE(n_new, 0) AS DOUBLE) / n_distinct")} AS new_rate
         |FROM dp LEFT JOIN np ON dp.source = np.source
         |ORDER BY dp.source""".stripMargin,

    "zipf_fit" ->
      s"""WITH spec AS (
         |  SELECT source, cnt, CAST(COUNT(*) AS BIGINT) AS n_toks
         |  FROM (
         |    SELECT source, t.tok, COUNT(*) AS cnt
         |    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
         |    GROUP BY 1, 2)
         |  GROUP BY 1, 2),
         |sums AS (
         |  SELECT source, COUNT(*) AS n,
         |    CAST(SUM(CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(FLOOR(ln(CAST(n_toks AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(19,0))
         |           * CAST(FLOOR(ln(CAST(n_toks AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
         |    CAST(SUM(CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(19,0))
         |           * CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(19,0))) AS DOUBLE) AS sxx
         |  FROM spec GROUP BY 1
         |  HAVING COUNT(*) >= 2)
         |SELECT source, n AS n_points,
         |  ${sqlQ6("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS slope_q6,
         |  ${sqlQ6("((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) / 1000000.0")} AS intercept_q6
         |FROM sums ORDER BY source""".stripMargin,

    "cosine_knn" ->
      s"""WITH scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id,
         |    ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(list_zip(c.embedding::DOUBLE[], p.embedding::DOUBLE[]), z -> z[1] * z[2])), (acc, x) -> acc + x) / (sqrt(list_reduce(list_prepend(0.0, list_transform(c.embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x)))")} AS cos_sim
         |  FROM embeddings c JOIN embeddings p
         |    ON p.vec_id < 20 AND c.vec_id <> p.vec_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
         |  FROM scored)
         |SELECT probe_id, rn, vec_id AS neighbor_id, cos_sim
         |FROM ranked WHERE rn <= 5
         |ORDER BY probe_id, rn""".stripMargin,

    // micro-integer centroid lanes + the cosine_knn sequential-fold
    // dot, per source
    "source_centroids" ->
      s"""WITH $centroidSqlCtes,
         |scored AS (
         |  SELECT e.source,
         |    ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(list_zip(emb, cvec), z -> z[1] * z[2])), (acc, x) -> acc + x) / (sqrt(list_reduce(list_prepend(0.0, list_transform(emb, x -> x * x)), (acc, x) -> acc + x)) * sqrt(list_reduce(list_prepend(0.0, list_transform(cvec, x -> x * x)), (acc, x) -> acc + x)))")} AS cs
         |  FROM e JOIN cent ON e.source = cent.source),
         |st AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(SUM(CAST(FLOOR(cs * 1000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS csum,
         |    MIN(cs) AS min_cos
         |  FROM scored GROUP BY 1)
         |SELECT st.source, n_vecs,
         |  ${sqlQ6("sqrt(list_reduce(list_prepend(0.0, list_transform(cvec, x -> x * x)), (acc, x) -> acc + x))")} AS centroid_norm,
         |  ${sqlQ6("CAST(csum AS DOUBLE) / (n_vecs * 1000000.0)")} AS mean_cos,
         |  min_cos
         |FROM st JOIN cent ON st.source = cent.source
         |ORDER BY st.source""".stripMargin,

    // same centroid chain; pairwise sequential-fold cosine over the
    // bounded source domain
    "source_affinity" ->
      s"""WITH $centroidSqlCtes
         |SELECT a.source AS source_1, b.source AS source_2,
         |  ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(list_zip(a.cvec, b.cvec), z -> z[1] * z[2])), (acc, x) -> acc + x) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.cvec, x -> x * x)), (acc, x) -> acc + x)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.cvec, x -> x * x)), (acc, x) -> acc + x)))")} AS cent_cos
         |FROM cent a JOIN cent b ON a.source < b.source
         |ORDER BY source_1, source_2""".stripMargin,

    // the cosine ranking CTE + NOT EXISTS against the (probe-bounded)
    // near-dup pair set, re-ranked after the filter
    "hard_negatives" ->
      s"""WITH $shingleSqlCte,
         |prs AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      ${sqlQ6("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |      AND (a.doc_id < 20 OR b.doc_id < 20)) t
         |  WHERE jaccard >= 0.5),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id,
         |    ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(list_zip(c.embedding::DOUBLE[], p.embedding::DOUBLE[]), z -> z[1] * z[2])), (acc, x) -> acc + x) / (sqrt(list_reduce(list_prepend(0.0, list_transform(c.embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x)))")} AS cos_sim
         |  FROM embeddings c JOIN embeddings p
         |    ON p.vec_id < 20 AND c.vec_id <> p.vec_id),
         |filt AS (
         |  SELECT * FROM scored k WHERE NOT EXISTS (
         |    SELECT 1 FROM prs
         |    WHERE (prs.doc_a = k.probe_id AND prs.doc_b = k.vec_id)
         |       OR (prs.doc_b = k.probe_id AND prs.doc_a = k.vec_id))),
         |ranked AS (
         |  SELECT probe_id, vec_id, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
         |  FROM filt)
         |SELECT probe_id, rn, vec_id AS negative_id, cos_sim
         |FROM ranked WHERE rn <= 5
         |ORDER BY probe_id, rn""".stripMargin,

    "doc_quality" ->
      s"""WITH $qualitySqlCte
         |SELECT doc_id, lang, quality,
         |  CASE WHEN quality >= 0.875 THEN 'keep'
         |       WHEN quality >= 0.625 THEN 'review'
         |       ELSE 'drop' END AS band
         |FROM q ORDER BY doc_id""".stripMargin,

    // identical ln/division shapes; per-token terms quantized before
    // the (order-free) integer sum, mirrored from the dsum recipe
    "unigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM v),
        |q AS (
        |  SELECT t.doc_id,
        |    CAST(FLOOR(ln(CAST(v.n AS DOUBLE) / CAST(tot.total AS DOUBLE))
        |      * 10000.0 + 0.5) AS BIGINT) AS qlp
        |  FROM t JOIN v USING (tok) CROSS JOIN tot)
        |SELECT doc_id,
        |  CAST(SUM(qlp) AS DOUBLE) / 10000.0 / COUNT(*) AS mean_logprob
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the count table is hash-free, so the oracle replays it verbatim
    // from the gram strings (same slicing as winnow_containment)
    "ngram_counts" ->
      """WITH g AS (
        |  SELECT unnest([array_to_string(ws[i:i+2], ' ')
        |                 for i in range(1, len(ws) - 1)]) AS gram
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3)
        |SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram
        |HAVING COUNT(*) >= 3
        |ORDER BY cnt DESC, gram LIMIT 100""".stripMargin,

    // tf · ln(n_sources/df) with identical expression shape, ranked
    // on the integer quantized score; the planted zephyr/quark/glome
    // rows make the idf mechanism discriminating
    "tfidf_terms" ->
      s"""WITH d AS (
         |  SELECT source, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES ${tfidfProbes.map {
            case (src, tx) => s"(${sqlText(src)}, ${sqlText(tx)})"
          }.mkString(", ")}) pr(source, text)),
         |tf AS (
         |  SELECT source, term, COUNT(*) AS tf
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
         |        FROM d)
         |  GROUP BY source, term),
         |ns AS (SELECT COUNT(DISTINCT source) AS n_sources FROM tf),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |q AS (
         |  SELECT source, term,
         |    CAST(FLOOR(CAST(tf AS DOUBLE) *
         |      ln(CAST(n_sources AS DOUBLE) / CAST(df AS DOUBLE)) *
         |      1000000.0 + 0.5) AS BIGINT) AS qs
         |  FROM tf JOIN dfq USING (term) CROSS JOIN ns),
         |r AS (SELECT source, term, qs,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |                           ORDER BY qs DESC, term) AS rank
         |      FROM q)
         |SELECT source, CAST(rank AS BIGINT) AS rank, term,
         |  CAST(qs AS DOUBLE) / 1000000.0 AS tfidf
         |FROM r WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin,

    // identical expression shape per (doc, term): ln-idf times the
    // k1/b-normalized tf, quantized per row, integer-summed per
    // (query, doc), ranked on the integer score — engine-exact
    "bm25_search" -> Bm25OracleSql,
    // the indexed twin must produce the identical result set — same
    // oracle, so the layout path is driver-checked end to end
    "bm25_indexed" -> Bm25OracleSql,

    // the same BM25 chain (top-20) full-joined with the brute cosine
    // ranking (top-20), fused in exact integer micro-units
    "hybrid_rrf" ->
      s"""WITH $Bm25CtesSql,
         |lex AS (
         |  SELECT * FROM (
         |    SELECT query_id, doc_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY sq DESC, doc_id) AS BIGINT) AS lex_rank
         |    FROM sc) WHERE lex_rank <= 20),
         |semsc AS (
         |  SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
         |    ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(list_zip(c.embedding::DOUBLE[], p.embedding::DOUBLE[]), z -> z[1] * z[2])), (acc, x) -> acc + x) / (sqrt(list_reduce(list_prepend(0.0, list_transform(c.embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x)))")} AS cos_sim
         |  FROM embeddings c JOIN embeddings p
         |    ON p.vec_id < 3 AND c.vec_id <> p.vec_id),
         |sem AS (
         |  SELECT * FROM (
         |    SELECT query_id, doc_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS sem_rank
         |    FROM semsc) WHERE sem_rank <= 20),
         |fused AS (
         |  SELECT COALESCE(l.query_id, m.query_id) AS query_id,
         |    COALESCE(l.doc_id, m.doc_id) AS doc_id,
         |    COALESCE(CAST(FLOOR(1000000.0 / (60 + l.lex_rank))
         |      AS BIGINT), 0) +
         |    COALESCE(CAST(FLOOR(1000000.0 / (60 + m.sem_rank))
         |      AS BIGINT), 0) AS rrf_micro
         |  FROM lex l FULL JOIN sem m
         |    ON l.query_id = m.query_id AND l.doc_id = m.doc_id),
         |r AS (
         |  SELECT query_id, doc_id, rrf_micro,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
         |  FROM fused)
         |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
         |  CAST(rrf_micro AS BIGINT) AS rrf_micro
         |FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // positional 25-word segmenter, first-occurrence winner on the
    // RAW segment text (the fingerprint election is collision-
    // equivalent at any conceivable test scale), ordered string_agg
    // reassembly
    "segment_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |tot AS (
        |  SELECT doc_id,
        |    CAST(CEIL(len(ws) / 25.0) AS BIGINT) AS total_segs FROM w),
        |seg AS (
        |  SELECT w.doc_id, g.i AS seg_idx,
        |    array_to_string(ws[(g.i*25+1):(g.i*25+25)], ' ') AS seg_text
        |  FROM w, LATERAL (SELECT unnest(range(
        |    CAST(CEIL(len(ws) / 25.0) AS BIGINT))) AS i) g),
        |keep AS (
        |  SELECT * FROM (
        |    SELECT seg.*, ROW_NUMBER() OVER (PARTITION BY seg_text
        |      ORDER BY doc_id, seg_idx) AS rn FROM seg) WHERE rn = 1),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_segs,
        |    CAST(length(string_agg(seg_text, ' ' ORDER BY seg_idx))
        |      AS BIGINT) AS new_len
        |  FROM keep GROUP BY doc_id)
        |SELECT t.doc_id, t.total_segs,
        |  CAST(COALESCE(a.kept_segs, 0) AS BIGINT) AS kept_segs,
        |  CAST(COALESCE(a.new_len, 0) AS BIGINT) AS new_len
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // the same token-descending global rank, the same snake fold
    "shard_assign" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM s),
        |a AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(CASE WHEN ((rn - 1) // 8) % 2 = 0 THEN (rn - 1) % 8
        |      ELSE 7 - ((rn - 1) % 8) END AS BIGINT) AS shard
        |  FROM r)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
        |  MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,

    // per-language greedy scans: strict prefix of (quality DESC,
    // doc_id) within each language, each under an integral 2/5 of
    // that language's own token total
    "budget_select_stratified" ->
      s"""WITH $qualitySqlCte,
         |o AS (
         |  SELECT doc_id, lang, quality, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY quality DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    SUM(n_tokens) OVER (PARTITION BY lang) * 2 // 5 AS budget
         |  FROM q)
         |SELECT doc_id, lang, quality, n_tokens FROM o
         |WHERE cum <= budget
         |ORDER BY doc_id""".stripMargin,

    // the sequential greedy scan the engine reproduces without a
    // global window: strict prefix of (quality DESC, doc_id) under an
    // integral 2/5-of-total token budget
    "token_budget_select" ->
      s"""WITH $qualitySqlCte,
         |o AS (
         |  SELECT doc_id, quality, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |                        ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM q)
         |SELECT doc_id, quality, n_tokens FROM o
         |WHERE cum <= (SELECT SUM(n_tokens) * 2 // 5 FROM q)
         |ORDER BY doc_id""".stripMargin,

    "lang_id_heuristic" ->
      s"""SELECT doc_id, lang, en_score, es_score, de_score,
         |  CASE WHEN en_score >= es_score AND en_score >= de_score THEN 'en'
         |       WHEN es_score >= de_score THEN 'es'
         |       ELSE 'de' END AS predicted_lang
         |FROM (
         |  SELECT doc_id, lang,
         |    ${sqlQ6("CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a' OR w = 'of')) AS DOUBLE) / len(ws)")} AS en_score,
         |    ${sqlQ6("CAST(len(list_filter(ws, w -> w = 'el' OR w = 'la' OR w = 'de')) AS DOUBLE) / len(ws)")} AS es_score,
         |    ${sqlQ6("CAST(len(list_filter(ws, w -> w = 'der' OR w = 'die' OR w = 'das')) AS DOUBLE) / len(ws)")} AS de_score
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM (
         |    SELECT doc_id, lang, text FROM documents
         |    ${langIdProbes.map { case (id, lg, tx) =>
              s"UNION ALL SELECT $id, '$lg', '$tx'" }.mkString("\n    ")})))
         |ORDER BY doc_id""".stripMargin,

    // same trigram extraction, same Laplace term with the identical
    // micro-nat quantization before the sum, same fixed argmax order
    "lang_id_trigram" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      def probesSql(ps: Seq[(Long, String, String)]) =
        ps.map { case (id, lg, tx) =>
          s"UNION ALL SELECT $id, '$lg', '$tx'" }.mkString("\n  ")
      val triOf =
        """CASE WHEN len(text) < 3 THEN [text]
          |    ELSE [text[i:i+2] for i in range(1, len(text) - 1)] END"""
          .stripMargin
      val cSums = langs.map(l =>
        s"SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS c_$l")
        .mkString(", ")
      val nSums = langs.map(l =>
        s"SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS n_$l")
        .mkString(", ")
      val termCols = langs.map(l =>
        s"k * CAST(FLOOR(ln((COALESCE(c_$l, 0) + 1.0) / (n_$l + v)) " +
          s"* 1000000.0 + 0.5) AS BIGINT) AS t_$l").mkString(",\n    ")
      val lpCols = langs.map(l => s"CAST(SUM(t_$l) AS BIGINT) AS lp_$l")
        .mkString(", ")
      s"""WITH bal AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text,
         |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
         |        ${sqlMd5Fold32(TrigramSalt, "CAST(doc_id AS VARCHAR)")},
         |        doc_id) AS trn
         |    FROM documents) WHERE trn <= $TrigramTrainK),
         |train AS (
         |  SELECT doc_id, lang, text FROM bal
         |  ${probesSql(trigramTrainProbes)}),
         |scoreset AS (
         |  SELECT doc_id, lang, text FROM documents
         |  ${probesSql(trigramTrainProbes)}
         |  ${probesSql(trigramScoreProbes)}),
         |mt AS (
         |  SELECT lang, unnest($triOf) AS tri FROM train),
         |model AS (SELECT tri, $cSums FROM mt GROUP BY tri),
         |tot AS (SELECT $nSums, COUNT(DISTINCT tri) AS v FROM mt),
         |dt AS (
         |  SELECT doc_id, lang, tri, COUNT(*) AS k FROM (
         |    SELECT doc_id, lang, unnest($triOf) AS tri FROM scoreset)
         |  GROUP BY 1, 2, 3),
         |terms AS (
         |  SELECT doc_id, d.lang AS lang,
         |    $termCols
         |  FROM dt d LEFT JOIN model USING (tri), tot),
         |lp AS (SELECT doc_id, lang, $lpCols FROM terms GROUP BY 1, 2)
         |SELECT doc_id, lang, lp_de, lp_en, lp_es, lp_fr, lp_zh,
         |  CASE WHEN lp_de >= lp_en AND lp_de >= lp_es AND lp_de >= lp_fr
         |         AND lp_de >= lp_zh THEN 'de'
         |       WHEN lp_en >= lp_es AND lp_en >= lp_fr AND lp_en >= lp_zh
         |         THEN 'en'
         |       WHEN lp_es >= lp_fr AND lp_es >= lp_zh THEN 'es'
         |       WHEN lp_fr >= lp_zh THEN 'fr'
         |       ELSE 'zh' END AS predicted_lang
         |FROM lp ORDER BY doc_id""".stripMargin
    },

    // same positional segmentation as segment_dedup, same stopword
    // vote as lang_id_heuristic, per segment
    "code_switch" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |seg AS (
        |  SELECT w.doc_id, g.i AS seg_idx,
        |    ws[(g.i*25+1):(g.i*25+25)] AS seg_ws
        |  FROM w, LATERAL (SELECT unnest(range(
        |    CAST(CEIL(len(ws) / 25.0) AS BIGINT))) AS i) g),
        |sc AS (
        |  SELECT doc_id, seg_idx,
        |    len(list_filter(seg_ws, x -> x = 'the' OR x = 'a' OR x = 'of')) AS en_c,
        |    len(list_filter(seg_ws, x -> x = 'el' OR x = 'la' OR x = 'de')) AS es_c,
        |    len(list_filter(seg_ws, x -> x = 'der' OR x = 'die' OR x = 'das')) AS de_c
        |  FROM seg),
        |lng AS (
        |  SELECT doc_id, seg_idx,
        |    CASE WHEN en_c >= es_c AND en_c >= de_c THEN 'en'
        |         WHEN es_c >= de_c THEN 'es' ELSE 'de' END AS seg_lang
        |  FROM sc),
        |sw AS (
        |  SELECT doc_id, seg_lang,
        |    CASE WHEN lag(seg_lang) OVER (PARTITION BY doc_id
        |        ORDER BY seg_idx) IS NOT NULL
        |      AND lag(seg_lang) OVER (PARTITION BY doc_id
        |        ORDER BY seg_idx) <> seg_lang
        |      THEN 1 ELSE 0 END AS switch
        |  FROM lng)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(SUM(switch) AS BIGINT) AS n_switches,
        |  CAST(COUNT(DISTINCT seg_lang) AS BIGINT) AS n_langs,
        |  CASE WHEN COUNT(DISTINCT seg_lang) > 1
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS mixed
        |FROM sw GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique,
         |  CAST(len(regexp_extract_all(text, '(\\S{1,4})', 1)) AS BIGINT) AS n_subword_tokens,
         |  ${sqlQ6("CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)")} AS ttr,
         |  ${sqlQ6("list_reduce(list_prepend(0.0, list_transform(ws, w -> CAST(length(w) AS DOUBLE))), (acc, x) -> acc + x) / len(ws)")} AS avg_token_len,
         |  ${sqlQ6("CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) AS DOUBLE) / len(ws)")} AS stopword_ratio
         |FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "lang_profile" ->
      """SELECT lang, n_docs, total_chars, total_tokens, n_sources,
        |  CAST(total_chars AS DOUBLE) / n_docs AS avg_chars
        |FROM (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |    COUNT(DISTINCT source) AS n_sources
        |  FROM documents GROUP BY lang)
        |ORDER BY lang""".stripMargin,

    // Byte-true mirror: every feature is computed from the hex image
    // of encode(text) — the raw UTF-8 bytes — so it agrees with the
    // engine's binary features for ANY text, and the unioned probe doc
    // (leading multi-byte chars) proves it.
    "binary_features" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT -1, '$nonAsciiProbeText'),
         |b AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |         octet_length(encode(text)) AS n
         |  FROM src)
         |SELECT doc_id,
         |  CAST(n AS BIGINT) AS n_bytes,
         |  lower(h[1:8]) AS header_hex,
         |  CASE WHEN n = 0 THEN 0.0 ELSE
         |    CAST(list_sum(list_transform(range(0, n), i ->
         |      (strpos('0123456789ABCDEF', h[2*i+1:2*i+1]) - 1) * 16
         |      + (strpos('0123456789ABCDEF', h[2*i+2:2*i+2]) - 1))) AS DOUBLE)
         |    / n END AS byte_mean
         |FROM b ORDER BY doc_id""".stripMargin,

    // the multi-probe search replayed end to end: the bucket is the
    // MSB-first fold of 8 sign bits over the SAME ±1 plane literals
    // the Spark plan embeds (SignBandKeys hashes nothing), probes
    // visit home + all Hamming-1 flips, same q6 cosine + rank
    "ann_lsh" ->
      s"""WITH pl(h, p) AS (VALUES
         |    ${(0 until 8).map(h => s"($h, ${planeSql(h)})").mkString(",\n    ")}),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bits AS (
         |  SELECT e.vec_id, pl.h,
         |    CASE WHEN ${sqlDot("e.v", "pl.p")} >= 0 THEN 1 ELSE 0 END AS bit
         |  FROM e CROSS JOIN pl),
         |bk AS (
         |  SELECT vec_id, CAST(SUM(bit * (1 << (7 - h))) AS BIGINT) AS bucket
         |  FROM bits GROUP BY vec_id),
         |probes AS (
         |  SELECT vec_id AS probe_id,
         |    unnest([bucket,
         |      xor(bucket, CAST(1 AS BIGINT)), xor(bucket, CAST(2 AS BIGINT)),
         |      xor(bucket, CAST(4 AS BIGINT)), xor(bucket, CAST(8 AS BIGINT)),
         |      xor(bucket, CAST(16 AS BIGINT)), xor(bucket, CAST(32 AS BIGINT)),
         |      xor(bucket, CAST(64 AS BIGINT)), xor(bucket, CAST(128 AS BIGINT))])
         |      AS bucket
         |  FROM bk WHERE vec_id < 20),
         |cand AS (
         |  SELECT p.probe_id, c.vec_id, c.bucket
         |  FROM probes p JOIN bk c
         |    ON c.bucket = p.bucket AND c.vec_id <> p.probe_id),
         |scored AS (
         |  SELECT cand.probe_id, cand.vec_id, cand.bucket,
         |    ${sqlQ6(sqlDot("a.v", "b.v") + " / (" + sqlNorm("a.v") + " * " + sqlNorm("b.v") + ")")} AS cos_sim
         |  FROM cand JOIN e a ON a.vec_id = cand.vec_id
         |            JOIN e b ON b.vec_id = cand.probe_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, bucket, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
         |  FROM scored)
         |SELECT probe_id, rn, vec_id AS neighbor_id, bucket, cos_sim
         |FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,

    "ivf_ann" ->
      s"""WITH cents(cid, c) AS (VALUES
         |    ${(0 until 16).map(h => s"(${h + 1}, ${planeSql(h)})").mkString(",\n    ")}),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} AS d
         |      FROM e CROSS JOIN cents),
         |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM d) t WHERE rn = 1),
         |pc AS (SELECT vec_id AS probe_id, CAST(cid AS BIGINT) AS cell FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
         |    FROM d WHERE vec_id < 20) t WHERE rn <= 4),
         |scored AS (
         |  SELECT pc.probe_id, c.vec_id,
         |    ${sqlQ6(sqlDot("a.v", "p.v") + " / (" + sqlNorm("a.v") + " * " + sqlNorm("p.v") + ")")} AS cos_sim
         |  FROM pc JOIN cells c ON c.cell = pc.cell AND c.vec_id <> pc.probe_id
         |  JOIN e a ON a.vec_id = c.vec_id
         |  JOIN e p ON p.vec_id = pc.probe_id),
         |ranked AS (SELECT probe_id, vec_id, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn FROM scored)
         |SELECT probe_id, rn, vec_id AS neighbor_id, cos_sim
         |FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,

    // All-pairs — feasible only at oracle/test scale; the engine side
    // arrives via banded sign-LSH buckets (recall ≈ 0.9992 at τ=0.99).
    // Same planted-duplicate augmentation as the engine query, so the
    // oracle checks detected pairs, not just absence of false ones.
    "embed_neardup" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |e AS (
         |  SELECT vec_id, v FROM e0
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(v, x -> x * 1.01)
         |  FROM e0 WHERE vec_id < 10
         |  UNION ALL
         |  SELECT vec_id + 1000000, list_transform(v, x -> x * 1.01 + 0.001)
         |  FROM e0 WHERE vec_id >= 10 AND vec_id < 20)
         |SELECT va, vb, cos_sim FROM (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${sqlQ6(sqlDot("a.v", "b.v") + " / (" + sqlNorm("a.v") + " * " + sqlNorm("b.v") + ")")} AS cos_sim
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id) t
         |WHERE cos_sim >= 0.99 ORDER BY va, vb""".stripMargin,

    "doc_embed_join" ->
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(label AS BIGINT) AS label,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  ${sqlQ6("sqrt(list_reduce(list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x))")} AS l2_norm
         |FROM documents JOIN embeddings ON doc_id = vec_id
         |ORDER BY doc_id""".stripMargin,
  )
}
