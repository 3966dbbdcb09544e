package graft.queries

import graft.Tables
import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Query registry, part 1: exact/near dedup, overlap and
  * decontamination audits, threshold curves, budget selection
  * (SURVEY §2 L1/L2/L10/L11/L14/L20–L25/L34/L49/L65/L66/L70,
  * L73/L74/L88/L89/L91/L93/L94/O10, U5 TVF twins). */
private[queries] trait PipelineDedupQueries extends PipelineCore {
  protected def dedupQueries: Map[String, Q] = Map(
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

    // L110: cross-source duplication matrix — the provenance audit
    // OVER L1's fingerprints: which sources copy which (mirror sites,
    // aggregator re-posts, eval-set leakage BETWEEN corpus slices) —
    // the pairwise answer L49's per-pair overlap rate summarizes and
    // the mixture owner reads before weighting "independent" sources.
    // Shape: the distinct (fingerprint, source) relation self-joins on
    // the 128-bit fingerprint — per-fingerprint fan-out is bounded by
    // C(n_sources, 2) (the SOURCE domain, never corpus size), and the
    // text never shuffles (16-byte fingerprints do). Oracle partitions
    // by text directly (the L1 equivalence, collision odds ~1e-20).
    // The fixture's sources share no verbatim text, so a planted
    // mirror source (every 53rd doc re-posted verbatim) rides along in
    // query and oracle — the aggregator-re-post shape the audit exists
    // to expose.
    "cross_source_dups" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val base = Tables.documents(s, dir)
        .select($"doc_id", $"source", $"text")
      val mirror = base.filter($"doc_id" % 53 === 0)
        .select(lit("mirror_probe").as("source"), $"text")
      val d = base.select($"source", $"text").unionByName(mirror)
        .select($"source",
          F.fnv1a($"text").as("fp1"),
          F.fnv1a_seeded(Lane2Seed, $"text").as("fp2"))
        .distinct()
      val a = d.select($"fp1", $"fp2", $"source".as("source_a"))
      val b = d.select($"fp1", $"fp2", $"source".as("source_b"))
      a.join(b, Seq("fp1", "fp2"))
        .filter($"source_a" < $"source_b")
        .groupBy($"source_a", $"source_b")
        .agg(count(lit(1)).as("n_shared_texts"))
        .orderBy($"source_a", $"source_b")
    }),

    // X13: homoglyph-skeleton dedup — the adversarial-dedup gap exact
    // fingerprints (L1) cannot close: a scraped or spammy copy that
    // swaps Latin letters for Unicode CONFUSABLES (Cyrillic а/е/о/р/
    // с/х/у/і read identically) or salts the text with zero-width
    // characters hashes differently while reading identically (the
    // Unicode TR39 skeleton idea, applied at the dedup layer).
    // Skeleton = lowercase + one translate() pass mapping the
    // confusable table to ASCII, dropping ZWSP/ZWNJ/ZWJ/BOM and
    // folding NBSP to space — translate is code-point-wise in BOTH
    // engines, so the skeletons agree byte-for-byte. Groups key on
    // the engine-portable 60-bit md5 fold of the skeleton (the M14
    // recipe — the skeleton string itself never shuffles at scale).
    // Planted probes (Cyrillic-substituted + zero-width-salted copies
    // of real docs under new ids) prove the catch; n_raw_variants ≥ 2
    // distinguishes true homoglyph hits from byte-identical dups.
    "homoglyph_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      val probes = docs.filter($"doc_id" % 41 === 0)
        .select(($"doc_id" + lit(90000000L)).as("doc_id"),
          concat(lit("\u200B"),
            translate($"text", "aeo", "аео")).as("text"))
      val from = "аеорсхуі" +
        "\u00A0\u200B\u200C\u200D\uFEFF"
      val to = "aeopcxyi "
      docs.unionByName(probes)
        .withColumn("skel", translate(lower($"text"), from, to))
        .withColumn("skel_fp",
          conv(substring(md5($"skel"), 1, 15), 16, 10).cast("long"))
        .groupBy($"skel_fp")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"text").as("n_raw_variants"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .filter($"n_docs" >= 2L)
        .orderBy($"min_doc")
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
      // join-back against the RAW documents and tokenize AFTER the
      // join: only the few representative rows pay the split, instead
      // of re-tokenizing the whole corpus below the join (same value —
      // a representative doc produced grams, so size(ws) >= W holds)
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      hot.join(docs, hot("rep_doc") === docs("doc_id"))
        .select(
          concat_ws(" ", slice(split($"text", " "), $"rep_pos", lit(W)))
            .as("span_text"),
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
      // materialized ONCE: three plan arms read this relation (the df
      // gate plus BOTH sides of the position self-join) — without the
      // checkpoint each arm re-runs the tokenize + explode + double-FNV
      // pass (the eval_overlap_rate / Graph.pairCounts pattern)
      val grams = toks.select($"doc_id",
        explode(transform(sequence(lit(1), size($"ws") - (W - 1)), i =>
          struct(i.cast("long").as("pos"),
            concat_ws(" ", slice($"ws", i, lit(W))).as("sp")))).as("g"))
        .select($"doc_id", $"g.pos".as("pos"), F.fnv1a($"g.sp").as("fp1"),
          F.fnv1a_seeded(Lane2Seed, $"g.sp").as("fp2"))
        .localCheckpoint()
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
      // scoring is recomputed by BudgetSelect's passes rather than
      // checkpointed here: a checkpoint inside a lazily-consumed
      // query has no unpersist point and would pin O(corpus) blocks
      // until the result frame is GC'd — an operator USER who wants
      // one tokenization pass materializes `scored` under their own
      // lifecycle and hands it in. The CONSTRUCTED frame is cached per
      // dir (the budgetSqlCache pattern, skill-documented): the
      // operator's construction collects the bounded score grid to
      // derive the threshold — a driver-side job that belongs to the
      // build, not to every read of the selection.
      budgetSelectCache.get(s, dir) { d =>
        val scored = Tables.documents(s, d).select($"doc_id",
          qualityOf($"text").as("quality"),
          size(split($"text", " ")).cast("long").as("n_tokens"))
        graft.operators.BudgetSelect.selectFraction(scored, "doc_id",
          "quality", "n_tokens", 2, 5)
      }.orderBy($"doc_id")
    }),

    // L99: arbitrary-length exact-substring runs via distributed
    // suffix ranking — the true longest-match contract (Lee et al.)
    // that L91's fixed 8-token windows approximate: per position, the
    // longest token span that occurs ANYWHERE else (same or another
    // doc), reported as maximal per-doc duplicated regions at
    // threshold 4 (sub-window granularity). Machinery: prefix
    // doubling (log maxlen rounds of two-phase dense ranking — the
    // iterative equi-shuffle family, no global sort), SA adjacency by
    // rank equi-join, LCP by rank descent, interval union per doc.
    // Planted 5- and 13-token verbatim copies under unique markers
    // pin both the below-window and the multi-window contract. The
    // oracle replays the brute quadratic diagonal-run scan over the
    // same %7 slice — exact parity, suffix ranks vs all-pairs.
    "dup_substring_runs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      dupSubstringRuns(s, dir)
        .orderBy($"doc_id", $"run_start")
    }),

    // L100: per-source verbatim-memorization audit — the roll-up a
    // curation owner reads over L99's exact duplicated regions: per
    // source, how many docs carry a duplicated region ≥ the threshold
    // and what share of the source's tokens sits inside one. Rides
    // the persisted dup-run artifact (zero suffix work here); probe
    // doc ids never match the documents table, so the join keeps the
    // stats over real docs while probe-induced regions in REAL docs
    // still count (text duplicated anywhere is duplicated).
    "dup_region_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val perDoc = dupSubstringRuns(s, dir)
        .groupBy($"doc_id").agg(sum($"run_len").as("dup_tokens"))
      Tables.documents(s, dir)
        .filter($"doc_id" % DupRunMod === 0)
        .select($"doc_id", $"source",
          size(split($"text", " ")).cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left_outer")
        .withColumn("dup_tokens", coalesce($"dup_tokens", lit(0L)))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"dup_tokens" > 0L, 1L).otherwise(0L))
            .as("n_docs_with_dup"),
          sum($"n_tokens").as("total_tokens"),
          sum($"dup_tokens").as("dup_tokens"),
          q6(sum($"dup_tokens").cast("double") /
            sum($"n_tokens").cast("double")).as("dup_share"))
        .orderBy($"source")
    }),

    // L101: dedup SURGERY — the action taken on L99's regions (the
    // second half of the Lee et al. recipe): strip every duplicated
    // region ≥ the threshold from every REAL doc and reassemble the
    // survivors' text from the kept positions. Removal is symmetric
    // (every occurrence goes — the conservative memorization-scrub
    // contract; canonical-occurrence retention is a policy layered on
    // top via L100's per-source view). Shape: the positions relation
    // anti-joins the run intervals on ONE equi key (doc_id) with the
    // range residual riding it, then one doc-keyed reassembly agg
    // (array_sort of collected (pos, tok) structs — never relying on
    // collect order). Probe docs are excluded the L100 way.
    "dedup_surgery" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val runs = dupSubstringRuns(s, dir)
        .filter($"doc_id" < 70000000L)
      val toks = Tables.documents(s, dir)
        .filter($"doc_id" % DupRunMod === 0)
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", $"pos".cast("long").as("pos"),
          $"col".as("tok"))
      val kept = toks.alias("t").join(runs.alias("r"),
        col("t.doc_id") === col("r.doc_id") &&
          $"pos" >= $"run_start" && $"pos" <= $"run_end", "left_anti")
      kept.groupBy($"doc_id")
        .agg(count(lit(1)).as("kept_tokens"),
          concat_ws(" ", expr(
            "transform(array_sort(collect_list(struct(pos, tok))), " +
              "p -> p.tok)")).as("kept_text"))
        .join(Tables.documents(s, dir)
          .filter($"doc_id" % DupRunMod === 0)
          .select($"doc_id",
            size(split($"text", " ")).cast("long").as("n_tokens")),
          Seq("doc_id"), "right_outer")
        .select($"doc_id", $"n_tokens",
          coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
          ($"n_tokens" - coalesce($"kept_tokens", lit(0L)))
            .as("removed_tokens"),
          coalesce($"kept_text", lit("")).as("kept_text"))
        .orderBy($"doc_id")
    }),
  )
}
