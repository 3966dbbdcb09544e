package graft.queries

import graft.Tables
import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Query registry, part 2: LM scoring, source statistics,
  * retrieval (tf-idf/BM25/RRF), language ID, multimodal binary
  * features and the embedding/ANN family (SURVEY §2 L3–L9,
  * L12/L26/L31/L36/L44/L50/L51/L53/L54/L58–L64/L71/L72/L95/L97,
  * L98, L5/L5b). */
private[queries] trait PipelineScoreQueries extends PipelineCore {
  protected def scoreQueries: Map[String, Q] = Map(

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

    // L102 (CCNet-style perplexity filter; Wenzek et al., "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data", 2020): the canonical LM-quality gate — train a language
    // model on a TRUSTED reference corpus (CCNet uses Wikipedia; the
    // fixture stand-in is a fixed literal source allowlist), score
    // EVERY doc by mean negative log-likelihood under that model, and
    // split each source into head/middle/tail TERCILES of the score
    // (CCNet keeps head+middle, drops tail). Differs from L5's
    // unigram_logprob — which scores the corpus under ITSELF — in
    // exactly the way that matters: a boilerplate-flooded source
    // cannot launder its own junk into high probability.
    // Exactness: Laplace-smoothed per-token NLL quantized to integer
    // micro-nats BEFORE the order-free sum (unigram_logprob contract);
    // the per-doc mean is one identically-spelled double division, so
    // the tercile ordering (mean, doc_id tiebreak) is engine-exact;
    // bucket aggregates use the davg 4-decimal lane.
    // Shape: one token-keyed count over the reference slice, one
    // token-keyed left join (unseen tokens take the smoothed floor),
    // one doc-keyed agg, one SOURCE-partitioned window (docs relation,
    // not tokens), one bounded rollup. Totals ride a one-row
    // broadcast (scalar-subquery shape, allowlisted).
    "perplexity_filter" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      perplexityBuckets(
          Tables.documents(s, dir).select($"doc_id", $"source", $"text"),
          Seq("src0", "src1", "src2", "src3"))
        .groupBy($"source", $"ppl_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          davg($"mean_nll").as("mean_nll_bucket"))
        .orderBy($"source", $"ppl_bucket")
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
        // materialized ONCE: the count models and the final scoring
        // join all read this relation through DIFFERENT exchanges, so
        // nothing else dedupes the tokenize + explode pass (the
        // dup_span_runs pattern)
        .localCheckpoint()
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

    // L104 (interpolated Kneser–Ney bigram LM; Kneser & Ney 1995,
    // Chen & Goodman 1999 — the standard n-gram smoothing): upgrades
    // L63's add-one bigram with the two ideas add-one lacks —
    // absolute discounting (a fixed D = 0.75, binary-exact 3/4, carved
    // off every observed bigram) and the CONTINUATION unigram backoff
    // (a word's probability mass comes from how many distinct contexts
    // it follows, not its raw frequency — "San Francisco" makes
    // "Francisco" frequent but it still only ever follows "San"):
    //   P(w2|w1) = (c(w1,w2) − D)/c(w1)
    //            + (D·N1+(w1·)/c(w1)) · (N1+(·w2)/B)
    // with N1+(w1·) = distinct successors of w1, N1+(·w2) = distinct
    // predecessors of w2, B = distinct bigram types. Train == score
    // corpus, so every scored bigram is observed (the max(·,0) clamp
    // never binds — documented envelope, unseen pairs need the L63
    // lane). All inputs are exact integers; the per-pair double is one
    // identically-spelled expression, quantized to integer micro-nats
    // before the order-free sum (unigram_logprob contract).
    // Shape: the bigram relation shuffles three times by small keys
    // (w1,w2)/(w1)/(w2) — all map-combinable counts; B rides a
    // one-row broadcast (scalar-subquery shape, allowlisted).
    "kn_bigram_logprob" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bg = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("ws"))
        .filter(size($"ws") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("b"))
        .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
        // materialized ONCE: the count models and the final scoring
        // join all read this relation through DIFFERENT exchanges, so
        // nothing else dedupes the tokenize + explode pass (the
        // dup_span_runs pattern)
        .localCheckpoint()
      val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val ctx = bg.groupBy($"w1").agg(count(lit(1)).as("c1"),
        count_distinct($"w2").as("n1"))
      val cont = bg.groupBy($"w2").agg(count_distinct($"w1").as("nc"))
      val b = broadcast(c2.agg(count(lit(1)).as("btypes")))
      val p = ($"c2".cast("double") - lit(0.75)) / $"c1".cast("double") +
        lit(0.75) * $"n1".cast("double") / $"c1".cast("double") *
          ($"nc".cast("double") / $"btypes".cast("double"))
      bg.join(c2, Seq("w1", "w2")).join(ctx, Seq("w1"))
        .join(cont, Seq("w2")).crossJoin(b)
        .select($"doc_id",
          floor(log(p) * lit(1000000.0) + lit(0.5)).cast("long").as("t"))
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

    // S27: the SAME indexed BM25 resolved through the TableCatalog
    // plugin (graft.sources.GraftCatalog) — the layout registers by
    // its own geometry stamp under a catalog root, and
    // `spark.table("<cat>.search.terms")` resolves to the identical
    // connector table the format/load spelling builds (same pushdown,
    // same pruned listing, same stats). Shares bm25_indexed's oracle
    // verbatim, so the catalog resolution path itself is what the
    // driver hash-checks. The catalog name is per-dir (catalog
    // options freeze at first use; Verify and Bench run one dir per
    // session, the cache key rule).
    "bm25_catalog" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val h = math.abs(dir.hashCode).toString
      val catRoot = termCatalogCache.computeIfAbsent(dir, d => {
        val docs = Tables.documents(s, d).select($"doc_id", $"text")
        val posts = graft.operators.InvertedIndex.buildPostings(docs, 16)
        val stats = docs
          .select(size(split($"text", " ")).cast("long").as("dl"))
          .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
        val rootDir = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_catalog_$h"
        graft.operators.InvertedIndex.writeTermLayout(posts, stats,
          s"$rootDir/search/terms", nBuckets = 16)
        rootDir
      })
      val cat = s"graft_idx_$h"
      s.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", catRoot)
      val posts = s.table(s"$cat.search.terms")
        .filter($"term".isin(Bm25QueryTerms.map(_._2).distinct: _*))
      graft.operators.InvertedIndex.bm25Over(posts,
          graft.operators.InvertedIndex.readStats(s,
            s"$catRoot/search/terms"),
          Bm25QueryTerms, 10)
        .orderBy($"query_id", $"rank")
    }),

    // L22 stratified: the mixture-aware budget — the best 2/5 of
    // tokens of EACH language independently (a global budget would
    // let one high-scoring stratum starve the rest). Same bounded
    // decomposition per group; all boundary strata share ONE
    // two-phase prefix-sum pass.
    "budget_select_stratified" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // constructed frame cached per dir (the budgetSqlCache pattern,
      // skill-documented): selectFractionPerStratum's construction
      // COLLECTS the bounded (stratum × score grid) relation to derive
      // thresholds — a driver-side job that belongs to the build, not
      // to every read of the selection
      budgetStratCache.get(s, dir) { d =>
        val scored = Tables.documents(s, d).select($"doc_id", $"lang",
          qualityOf($"text").as("quality"),
          size(split($"text", " ")).cast("long").as("n_tokens"))
        graft.operators.BudgetSelect.selectFractionPerStratum(scored,
          "lang", "doc_id", "quality", "n_tokens", 2, 5)
      }.orderBy($"doc_id")
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
      // Score TRIGRAM INSTANCES directly against the BROADCAST model:
      // the model is built from the FIXED-k balanced sample
      // (k·|classes| docs regardless of corpus size), so its trigram
      // vocabulary is bounded — shipping it to the corpus side removes
      // the two tri-keyed exchanges (the old per-(doc, tri) count and
      // the model side of its join) that re-shuffled the whole corpus
      // trigram relation (guide §2.4/§3.1). The per-(doc, tri)
      // multiplicity k is absorbed into the instance sum exactly:
      // Σ_distinct k·⌊term⌋ = Σ_instances ⌊term⌋ (the floor'd term is
      // constant per trigram), so the released integers are unchanged
      // and the one remaining exchange is the map-combinable
      // (doc_id, lang) partial aggregate.
      val dt = scoreSet
        .select($"doc_id", $"lang", explode(triExpr).as("tri"))
      val terms = dt.join(broadcast(model), Seq("tri"), "left_outer")
        .crossJoin(broadcast(totals))
      val lpCols = langs.map { l =>
        sum(floor(
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
      // Corpus: the PERSISTED cell layout (write-once-per-dir — the
      // bm25_indexed pattern), read back through the DSv2 connector so
      // the nprobe/k prune is ON the scan node (cell predicates pushed
      // to file-listing time, pruned-listing statistics) instead of a
      // path helper's claim. Cell assignment at build: one in-row
      // argmax → cell; no explode, no extra shuffle.
      val layout = ivfCellCache.computeIfAbsent(dir, d => {
        val assigned = emb
          .select($"vec_id", $"v", dotsCol($"v").as("dots"))
          .select($"vec_id", $"v",
            array_position($"dots", array_max($"dots")).as("cell"))
        val dim = emb.select(size($"v")).head.getInt(0)
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_cells_" +
          math.abs(d.hashCode).toString
        graft.operators.IvfIndex.writeCellLayout(assigned, p, 16, dim)
        p
      })
      val corpus = s.read.format("graft.sources.CellsSource")
        .option("path", layout).load()
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
    // L103 (SemDeDup; Abbas et al., "SemDeDup: Data-efficient learning
    // at web-scale through semantic deduplication", 2023): the
    // embedding-space dedup that catches PARAPHRASED redundancy lexical
    // dedup (L1/L2) cannot — cluster the corpus into IVF cells, verify
    // exact cosine ONLY within each cell (the paper's trick: the
    // k-means partition bounds the pair domain, so work is Σ|cell|²,
    // never n²), connect the above-τ pairs into dup groups, and keep
    // per group the member with the LOWEST cosine to its cell centroid
    // (the paper's diversity-preserving retention; deterministic
    // (ccos, vec_id) tiebreak). Output per cell: vectors, dup pairs,
    // dup groups, removed count, and the kept members' q6
    // centroid-cosine mass — the retention policy is observable, not
    // just the counts. Cells/centroids are the SAME learned relation
    // as L7/L64/L72 (one Lloyd run per dir, persisted); the pair
    // labeling is a persisted artifact (the neardup_components
    // pattern). Oracle replays assignment, pairs, recursive closure
    // and the argmin retention from the interpolated centroids.
    "semdedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.IvfIndex
      val emb = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = learnedCents(s, dir)
      val centsLit = typedlit(cents.map(_.toSeq).toSeq)
      val cc = IvfIndex.assignCells(emb, cents)
        .withColumn("c", element_at(centsLit, $"cell".cast("int")))
        .select($"cell", $"vec_id",
          q6(dot($"v", $"c") / (l2norm($"v") * l2norm($"c"))).as("ccos"))
      val pairs = semDedupPairs(s, dir)
      val member = semDedupComponents(s, dir)
        .join(cc, col("node") === cc("vec_id"))
        .select($"component", $"node", $"cell", $"ccos")
      val groups = member.groupBy($"component")
        .agg(min($"cell").as("cell"), count(lit(1)).as("sz"),
          min(struct($"ccos", $"node")).as("keep"))
      val grpAgg = groups.groupBy($"cell")
        .agg(count(lit(1)).as("n_dup_groups"),
          sum($"sz" - lit(1L)).as("n_removed"),
          sum(floor($"keep.ccos" * lit(1000000.0) + lit(0.5)))
            .cast("long").as("kept_cos_mass_6"))
      val pairAgg = pairs.groupBy($"cell")
        .agg(count(lit(1)).as("n_dup_pairs"))
      cc.groupBy($"cell").agg(count(lit(1)).as("n_vecs"))
        .join(pairAgg, Seq("cell"), "left_outer")
        .join(grpAgg, Seq("cell"), "left_outer")
        .na.fill(0L,
          Seq("n_dup_pairs", "n_dup_groups", "n_removed",
            "kept_cos_mass_6"))
        .orderBy($"cell")
    }),

    // L112: incremental SemDeDup closure maintenance — the SEMANTIC
    // twin of L89's lexical merge-fold, completing this round's story
    // (append → live pairs → label maintenance): yesterday's dup-group
    // labeling is the persisted artifact a daily pipeline carries
    // forward, and a batch of newly-embedded vectors folds in through
    // ConnectedComponents.merge — work ∝ touched components + batch,
    // never the historical closure. The fixture derives both sides
    // from ONE SemDedup.pairs pass (localCheckpoint'ed so the CC loops
    // never re-run the pair join): corpus-internal pairs replay
    // yesterday's labeling, batch-touching pairs (vec_id ≡ 0 mod 10)
    // are the day's fold. The oracle is the FULL recursive closure
    // over all pairs — merge ≡ full recompute is the exactness claim,
    // the incremental_clusters gate applied to the embedding lane.
    "incremental_semdedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // the merged labeling is cached per dir (the incrClustersCache
      // pattern of the LEXICAL twin, verbatim): the labeling is the
      // persisted artifact a daily pipeline carries forward, and the
      // driver-stepped CC loops (yesterday's closure + the batch
      // merge) are its build, not per-read work
      val merged = incrSemDedupCache.get(s, dir) { d =>
        val pairs = semDedupPairs(s, d)
          .select($"vec_a", $"vec_b").localCheckpoint()
        val isBatch = (c: Column) => c % 10 === 0
        val oldPairs = pairs.filter(!isBatch($"vec_a") && !isBatch($"vec_b"))
        val newPairs = pairs.filter(isBatch($"vec_a") || isBatch($"vec_b"))
        val yesterday = graft.operators.ConnectedComponents
          .components(oldPairs, "vec_a", "vec_b")
        graft.operators.ConnectedComponents
          .merge(yesterday, "node", "component", newPairs, "vec_a", "vec_b")
          .localCheckpoint()
      }
      val sizes = merged.groupBy($"component")
        .agg(count(lit(1)).as("cluster_size"))
      merged.join(sizes, "component")
        .select($"node".as("vec_id"), $"component".as("cluster_id"),
          $"cluster_size")
        .orderBy($"cluster_id", $"vec_id")
    }),

    // L113: SEMANTIC decontamination — the embedding-space twin of
    // L23's lexical `decontaminate`, closing the gap SemDeDup (Abbas
    // et al. 2023) documents: a PARAPHRASED copy of an eval document
    // shares no 8-gram (lexical decontamination misses it) but sits
    // at cosine ≈ 1 in embedding space. Train-split vectors whose
    // embedding near-duplicates (within-cell exact q6 cosine ≥ 0.40)
    // a valid/test vector are flagged with the leaked eval id and
    // split. Planted probes: exact copies of vec_id ≡ 1 (mod 12)
    // under +2·10⁶ ids ride along in query and oracle — identical
    // embedding ⇒ identical cell and cosine 1.0, and the
    // hash-deterministic 80/10/10 split scatters the copies across
    // splits, so cross-split hits EXIST and are exactly replayable.
    // Shape: the SemDedup.pairs path (cells bound the pair domain,
    // CandidatePairs chunks hot cells) + two broadcast-able id joins
    // against the split labels — the decontaminate composition with
    // the LSH pass swapped for the IVF-cell cosine pass.
    "semantic_decontaminate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // the planted copies ride a conditional EXPLODE, not a union —
      // ONE scan (the better 100 TB shape), and no Union node for
      // SemDedup's downstream self-joins to trip Spark's
      // UnionBase.rewriteConstraints over (key not found: embedding#N
      // when a self-derived union branch is joined back to itself)
      val all = Tables.embeddings(s, dir)
        .select(explode(
          when($"vec_id" % 12 === 1,
            array(struct($"vec_id", $"embedding"),
              struct(($"vec_id" + 2000000L).as("vec_id"), $"embedding")))
            .otherwise(array(struct($"vec_id", $"embedding")))).as("r"))
        .select($"r.vec_id".as("vec_id"),
          $"r.embedding".cast("array<double>").as("v"))
      val pairs = graft.operators.SemDedup
        .pairs(all, learnedCents(s, dir), 0.40)
      val lab = all.select($"vec_id",
        graft.operators.Sampling.splitLabel($"vec_id", 0.8, 0.1)
          .as("split"))
      pairs
        .join(lab.select($"vec_id".as("vec_a"), $"split".as("split_a")),
          "vec_a")
        .join(lab.select($"vec_id".as("vec_b"), $"split".as("split_b")),
          "vec_b")
        .filter(($"split_a" === "train" && $"split_b" =!= "train") ||
          ($"split_b" === "train" && $"split_a" =!= "train"))
        .select(
          when($"split_a" === "train", $"vec_a").otherwise($"vec_b")
            .as("train_vec"),
          when($"split_a" === "train", $"vec_b").otherwise($"vec_a")
            .as("eval_vec"),
          when($"split_a" === "train", $"split_b").otherwise($"split_a")
            .as("eval_split"),
          $"cos")
        .orderBy($"train_vec", $"eval_vec")
    }),

    // L105 (perceptual-hash near-dup over binary payloads): the
    // multimodal dedup lane — aHash (average hash, the classic
    // perceptual fingerprint: stride-sample the payload to a 64-byte
    // grid, bit_j = sample_j above the grid mean) over the opaque
    // binary column, then Hamming-≤3 pairing via the pigeonhole band
    // split (4 × 16-bit bands: any pair within distance 3 shares at
    // least one EXACT band — the SimHash recipe at the byte level).
    // The stub "decode" is the frameColumns stride sample (the
    // documented decoder seam: a real deployment swaps in the codec's
    // grayscale grid, nothing else changes). All arithmetic is
    // integer: the bit test cross-multiplies (64·g_j > Σg), bands are
    // exact 16-bit ints, verify is bit_count(xor) — no double
    // anywhere. Planted probe payloads (verbatim copy, 1- and 2-byte
    // corruptions at SAMPLED positions, one unrelated control) ride
    // along in query and oracle, proving hit/miss both ways — the
    // fixture's own texts never collide at τ=3 (verbatim-level byte
    // similarity is what the lane detects).
    // Shape: one bounded 64-sample pass per doc (never a per-byte
    // loop); pairing rides CandidatePairs over the (band_no, band_val)
    // buckets — NOT a raw band self-join — because identical payloads
    // (empty/placeholder assets, the NORMAL degenerate case in a crawl)
    // all share one band value, and a raw join hands that bucket's
    // O(m²) pairs to one shuffle key. CandidatePairs chunks hot
    // buckets so no task exceeds ~cap² pair checks, and its built-in
    // distinct IS the first-shared-band dedup (the old ×4-band
    // `distinct()` is gone with the raw join). The 8-byte fingerprints
    // then hash-join back for the exact bit_count verify — the payload
    // column never reaches the pair shuffle (at scale the fingerprint
    // relation is the thing a pipeline persists once per corpus, the
    // ArtifactStore pattern, so the three uses here share one decode).
    "phash_neardup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        .unionAll(phashProbes.toDF("doc_id", "text"))
      val hashes = docs
        .select($"doc_id",
          F.ahash64($"text".cast("binary")).as("h"))
        .filter($"h".isNotNull)
      val banded = hashes.select($"doc_id",
        posexplode(array((0 to 3).map(bb =>
          shiftrightunsigned($"h", bb * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band_no", "band_val")))
      graft.operators.CandidatePairs
        .fromBuckets(banded, Seq("band_no", "band_val"), "doc_id",
          "doc_a", "doc_b")
        .join(hashes.select($"doc_id".as("doc_a"), $"h".as("ha")), Seq("doc_a"))
        .join(hashes.select($"doc_id".as("doc_b"), $"h".as("hb")), Seq("doc_b"))
        .select($"doc_a", $"doc_b",
          bit_count($"ha".bitwiseXOR($"hb")).cast("long").as("hamming"))
        .filter($"hamming" <= 3L)
        .orderBy($"doc_a", $"doc_b")
    }),

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
      // the IVF-PQ index at rest: per-vector (cell, code_1..code_m) —
      // 4 bytes of payload per vector, never the floats — persisted
      // cell-partitioned and read through the DSv2 connector (the
      // ivf_ann lane): the probe's 4-cell read is pruned at
      // file-listing time on the scan node itself
      val layout = ivfpqCellCache.computeIfAbsent(dir, d => {
        val encoded = PqIndex.encode(IvfIndex.assignCells(emb, cents),
          books).drop("v")
        val dim = emb.select(size($"v")).head.getInt(0)
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_cells_" +
          math.abs(d.hashCode).toString
        IvfIndex.writeCellLayout(encoded, p, cents.length, dim)
        p
      })
      val corpus = s.read.format("graft.sources.CellsSource")
        .option("path", layout).load()
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
  )
}
