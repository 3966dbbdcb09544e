package graft.queries

import graft.Tables
import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Query registry, part 3: heavy terms, BPE train/apply, cluster
  * and correlation audits, fuzzy linkage, deterministic sampling,
  * chunk/pack/curation composition, simhash/winnowing (SURVEY §2
  * L15–L19/L21/L28/L29/L32?/L35/L37–L43/L45/L46/L52?/L55/L56?,
  * L75–L87 text rows, L90/L92/L96, L8). */
private[queries] trait PipelineCurationQueries extends PipelineCore {
  protected def curationQueries: Map[String, Q] = Map(

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

    // L109: embedding drift monitor — the vector-space member of the
    // drift family (PSI/KS watch scalar columns; embedding pipelines
    // drift when the ENCODER or the upstream mix changes, visible as
    // per-class centroid movement between ingestion batches): per
    // label, the cosine and L2 distance between the batch-A and
    // batch-B centroids (A/B = vec_id parity — the replica/batch
    // split). Exactness: components quantize to q6-micro longs at the
    // scan; per-dim centroids are one identically-spelled double
    // division rounded BACK to the micro grid, so the dot/norm/L2
    // sums are order-free longs (≤ 10¹² per dim — safe at any corpus
    // size because centroids, not sums, multiply); the final
    // cosine/L2 are q6 doubles over grid values. Shape: one
    // map-combinable (label, dim) agg; everything after runs on the
    // bounded label × 64-dim relation.
    "embedding_drift" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cent = Tables.embeddings(s, dir)
        .select($"label".cast("long").as("label"),
          ($"vec_id" % 2 === 0).as("ina"),
          posexplode($"embedding".cast("array<double>"))
            .as(Seq("dim", "x")))
        .select($"label", $"ina", $"dim".cast("long").as("dim"),
          floor($"x" * lit(1000000.0) + lit(0.5)).cast("long").as("xq"))
        .groupBy($"label", $"dim")
        .agg(sum(when($"ina", $"xq").otherwise(0L)).as("sa"),
          sum(when(!$"ina", $"xq").otherwise(0L)).as("sb"),
          sum(when($"ina", 1L).otherwise(0L)).as("na"),
          sum(when(!$"ina", 1L).otherwise(0L)).as("nb"))
        .select($"label", $"na", $"nb",
          floor($"sa".cast("double") / $"na".cast("double") + lit(0.5))
            .cast("long").as("ca"),
          floor($"sb".cast("double") / $"nb".cast("double") + lit(0.5))
            .cast("long").as("cb"))
      cent.groupBy($"label")
        .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
          sum($"ca" * $"cb").as("dotq"),
          sum($"ca" * $"ca").as("aq"),
          sum($"cb" * $"cb").as("bq"),
          sum(($"ca" - $"cb") * ($"ca" - $"cb")).as("d2q"))
        .select($"label", $"n_a", $"n_b",
          q6($"dotq".cast("double") /
            (sqrt($"aq".cast("double")) * sqrt($"bq".cast("double"))))
            .as("centroid_cos"),
          q6(sqrt($"d2q".cast("double")) / lit(1000000.0)).as("l2_shift"))
        .orderBy($"label")
    }),

    // L108: distinct-n diversity audit — the Texygen/self-BLEU-family
    // diversity gate a mixture owner reads next to L50's entropy:
    // distinct-1/2/3 = (distinct n-grams) / (total n-grams) per
    // source; a source whose ratios collapse is template spam or a
    // degenerate generator even when its unigram entropy looks fine
    // (bigram/trigram collapse is invisible to L50). On this fixture
    // the 31-token vocabulary saturates distinct-1 to ≈ 31/n — which
    // IS the report (the salad has no lexical diversity to find).
    // Exactness: all counts are exact longs (countDistinct over the
    // (source, gram) domain); ratios are q6. Shape: three
    // map-combinable distinct-aggregations keyed by (source, gram);
    // the gram relations shuffle hashed gram strings, never documents
    // (at 100 TB the distinct count swaps to HLL via G5's lane, same
    // query shape).
    "distinct_ngrams" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ws = Tables.documents(s, dir)
        .select($"source", split($"text", " ").as("ws"))
      def grams(n: Int) = ws.filter(size($"ws") >= n)
        .select($"source", explode(
          expr(s"transform(sequence(1, size(ws) - ${n - 1}), i -> " +
            (0 until n).map(k => s"element_at(ws, i + $k)")
              .mkString("concat_ws(' ', ", ", ", ")") + ")"))
          .as("g"))
        .groupBy($"source")
        .agg(count(lit(1)).as(s"n_${n}grams"),
          countDistinct($"g").as(s"d_${n}grams"))
      grams(1).join(grams(2), "source").join(grams(3), "source")
        .select($"source", $"n_1grams".as("n_tokens"),
          $"d_1grams", q6($"d_1grams".cast("double") /
            $"n_1grams".cast("double")).as("distinct_1"),
          $"d_2grams", q6($"d_2grams".cast("double") /
            $"n_2grams".cast("double")).as("distinct_2"),
          $"d_3grams", q6($"d_3grams".cast("double") /
            $"n_3grams".cast("double")).as("distinct_3"))
        .orderBy($"source")
    }),

    // L108b: the documented 100 TB swap of L108 made a REAL row, not a
    // narrative — the same three gram relations with the exact
    // countDistinct swapped for the G5 HLL lane
    // (approx_count_distinct, rsd 0.05): sketch state is KB per
    // (source, n) whatever the gram domain, merges map-side, and the
    // full distinct gram domain never shuffles — at 100 TB the exact
    // lane's (source, gram) shuffle IS the bottleneck this row
    // removes. Output keeps the exact count alongside the estimate
    // and asserts |approx − exact| ≤ 3·rsd·exact per (source, n) —
    // the agg_approx bound-check pattern — so the swap's accuracy
    // claim is itself driver-checked (the oracle interpolates the
    // engine's estimates and recomputes exact + bound in DuckDB).
    "distinct_ngrams_approx" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ws = Tables.documents(s, dir)
        .select($"source", split($"text", " ").as("ws"))
      def grams(n: Int) = ws.filter(size($"ws") >= n)
        .select($"source", explode(
          expr(s"transform(sequence(1, size(ws) - ${n - 1}), i -> " +
            (0 until n).map(k => s"element_at(ws, i + $k)")
              .mkString("concat_ws(' ', ", ", ", ")") + ")"))
          .as("g"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_grams"),
          countDistinct($"g").as("d_exact"),
          approx_count_distinct($"g", 0.05).as("d_approx"))
        .select($"source", lit(n.toLong).as("gram_n"),
          $"n_grams", $"d_exact", $"d_approx")
      val out = grams(1).unionByName(grams(2)).unionByName(grams(3))
        .withColumn("within_bound",
          abs($"d_approx" - $"d_exact") <= lit(0.15) * $"d_exact")
        .orderBy($"source", $"gram_n")
      distinctNgramsApproxCache.put(dir,
        out.select($"source", $"gram_n", $"d_approx"))
      out
    }),

    // L107: temperature-scaled mixture allocation — the multilingual
    // data-balancing recipe (the XLM-R / mT5 `p_s^α` upsampling rule,
    // α = 1/2): raw shares over-serve head sources and starve tails;
    // temperature scaling flattens the mixture, and a training run
    // that needs EXACTLY K examples then apportions the scaled shares
    // by largest remainder (the L79 machinery over the TRANSFORMED
    // weights — both honest recipes, different questions: L79 hits
    // the observed mix, this row hits the rebalanced one). Exactness:
    // sqrt is correctly-rounded IEEE in both engines, so the scaled
    // weight quantizes to an exact q6-micro long; the Hare quota
    // (K·w DIV Σw), remainders and the leftover walk are then pure
    // integers (envelope K·w < 2⁶³ documented). Shape: one
    // map-combinable source count; everything after runs on the
    // bounded source-domain relation (the gini window contract).
    "mixture_temperature" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val K = 10000L
      val sw = Tables.documents(s, dir)
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .withColumn("sw",
          floor(sqrt($"n_docs".cast("double")) * lit(1000000.0) +
            lit(0.5)).cast("long"))
      val tot = broadcast(sw.agg(sum($"sw").as("s_tot"),
        sum($"n_docs").as("n_tot")))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val wRk = Window.orderBy($"rem".desc, $"source")
      sw.crossJoin(tot)
        .withColumn("base", expr(s"($K * sw) DIV s_tot"))
        .withColumn("rem", expr(s"($K * sw) % s_tot"))
        .withColumn("leftover", lit(K) - sum($"base").over(wAll))
        .withColumn("rk", row_number().over(wRk).cast("long"))
        .select($"source", $"n_docs",
          q6($"n_docs".cast("double") / $"n_tot".cast("double"))
            .as("raw_share"),
          q6($"sw".cast("double") / $"s_tot".cast("double"))
            .as("temp_share"),
          ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
            .as("alloc"))
        .orderBy($"source")
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
}
