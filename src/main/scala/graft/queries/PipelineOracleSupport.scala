package graft.queries

import graft.Tables
import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** DuckDB-oracle support: the shared SQL spellings (shingle CTEs,
  * md5 fold, quality CTE, IVF/PQ/BPE/centroid CTE builders) and
  * the tail oracle map the base map concatenates. */
private[queries] trait PipelineOracleSupport extends PipelineCore {
  /** Implemented by [[PipelineOracleBase]] (the literal map). */
  private[queries] def staticOracle: Map[String, String]
  private[queries] def planeSql(h: Int): String =
    hyperplanes(h).map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"

  private[queries] def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), z -> z[1] * z[2])), (acc, x) -> acc + x)"

  private[queries] def sqlNorm(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform($a, x -> x * x)), (acc, x) -> acc + x))"

  /** Shared shingle CTE — mirrors [[shingles]] including its
    * whole-text fallback for docs shorter than the 3-token width. */
  /** The distinct-3-gram shingle CTE over any (doc_id, text) source —
    * ONE spelling shared by every Jaccard oracle (and, via the `ed`
    * source, by the full_curation oracle) so tokenization cannot
    * drift. */
  private[queries] def shingleSqlCteFor(src: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= 3 THEN
       |      list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                     for i in range(1, len(ws) - 1)])
       |    ELSE [text] END AS s
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM $src))""".stripMargin

  private[queries] val shingleSqlCte = shingleSqlCteFor("documents")

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
  private[queries] def sqlChunkCtes(src: String, gate: String = ""): String =
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
  private[queries] val sqlChunkCols =
    """CAST(chunk_id AS BIGINT) AS chunk_id,
      |  array_to_string(toks[chunk_id*12+1 : LEAST(chunk_id*12+16, n)], ' ') AS chunk_text,
      |  CAST(LEAST(chunk_id*12+16, n) - chunk_id*12 AS BIGINT) AS n_tokens""".stripMargin

  /** DuckDB spelling of [[graft.operators.Sampling.keyHash32]]: fold
    * the first 8 hex chars of md5(salt ∥ key) to a BIGINT. ONE
    * definition shared by every hash-sampling oracle so the spelling
    * (and any future salt change) cannot drift between them. */
  private[queries] def sqlMd5Fold32(salt: String, key: String): String =
    s"""list_reduce(list_transform(range(1, 9), i ->
       |      CAST(strpos('0123456789abcdef',
       |        substring(md5('$salt' || $key), CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, b) -> a * 16 + b)""".stripMargin

  /** The 80/10/10 split CASE over a fold value `v` — integer
    * thresholds floor(0.8·2^32) / floor(0.9·2^32), shared by the
    * hash_split and decontaminate oracles. */
  private[queries] val sqlSplitCase =
    """CASE WHEN v < 3435973836 THEN 'train'
      |         WHEN v < 3865470566 THEN 'valid'
      |         ELSE 'test' END""".stripMargin


  /** CASE over the mixture strata with `f`'s integer literal per rate
    * (and the default-1.0 literal in ELSE) — the oracle-side spelling
    * of resampleMixture's per-stratum fold. */
  private[queries] def mixCaseSql(f: Double => Long): String =
    MixtureRates.toSeq.sortBy(_._1)
      .map { case (k, r) => s"WHEN '$k' THEN ${f(r)}" }
      .mkString("CASE lang ", " ", s" ELSE ${f(1.0)} END")

  /** (doc_id, carry..., n_tokens, quality) — the composite quality
    * scoring CTE mirrored from [[qualityOf]], parameterized over the
    * source relation and carried columns; ONE spelling shared by the
    * doc_quality, token_budget_select and full_curation oracles. */
  private[queries] def qualityCteSql(name: String, src: String,
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

  private[queries] val qualitySqlCte = qualityCteSql("q", "documents", Seq("lang"))

  /** τ=0.5 exact-Jaccard pairs closed into components: `comp` is the
    * (node, cluster_id = component min) labeling the cluster-closure
    * oracles share. Must open with `WITH RECURSIVE`. */
  private[queries] val neardupClosureSqlCte =
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
  private[queries] val simhashSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] val sourceSigSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DuckDB mirror of `source_minhash_sim` given the engine's own
    * signatures: pairwise lane agreement / 64 (exact in doubles) —
    * the join and the agreement arithmetic are driver-checked; the
    * signature values are the MinHashAgg sketch, quality-checked in
    * MinHashAggSpec. */
  private[queries] def sourceMinhashSimSql(sigs: Array[(String, Seq[Long])]): String = {
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
        "semdedup" -> semDedupSql(c),
        "incremental_semdedup" -> incrementalSemDedupSql(c),
        "semantic_decontaminate" -> semanticDecontaminateSql(c),
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
      }.getOrElse(Map.empty) ++
      Option(distinctNgramsApproxCache.get(dir))
      .map { f =>
        Map("distinct_ngrams_approx" ->
          distinctNgramsApproxSqlCache.computeIfAbsent(dir,
            _ => distinctNgramsApproxSql(f.collect()
              .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))))
      }.getOrElse(Map.empty)

  private[queries] val distinctNgramsApproxSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DuckDB mirror of `distinct_ngrams_approx` given the engine's HLL
    * estimates as VALUES literals: exact gram counts recomputed with
    * the independent list-comprehension n-gram spelling (the
    * distinct_ngrams oracle), and the 3·rsd bound check re-derived
    * from DuckDB's own exact counts — the agg_approx pattern. */
  private[queries] def distinctNgramsApproxSql(
      rows: Array[(String, Long, Long)]): String = {
    val vals = rows.sortBy(r => (r._1, r._2))
      .map { case (src, n, a) => s"('$src', $n, $a)" }
      .mkString(",\n    ")
    s"""WITH est(source, gram_n, d_approx) AS (VALUES
       |    $vals),
       |ws AS (
       |  SELECT source, string_split(text, ' ') AS ws FROM documents),
       |ex AS (
       |  SELECT source, 1 AS gram_n, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d_exact
       |  FROM (SELECT source, unnest(ws) AS g FROM ws) GROUP BY 1
       |  UNION ALL
       |  SELECT source, 2, CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT g) AS BIGINT)
       |  FROM (SELECT source, unnest([ws[i] || ' ' || ws[i + 1]
       |          for i in range(1, len(ws))]) AS g FROM ws)
       |  GROUP BY 1
       |  UNION ALL
       |  SELECT source, 3, CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT g) AS BIGINT)
       |  FROM (SELECT source,
       |          unnest([ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
       |            for i in range(1, len(ws) - 1)]) AS g FROM ws)
       |  GROUP BY 1)
       |SELECT ex.source, CAST(ex.gram_n AS BIGINT) AS gram_n,
       |  ex.n_grams, ex.d_exact, CAST(est.d_approx AS BIGINT) AS d_approx,
       |  abs(est.d_approx - ex.d_exact) <= 0.15 * ex.d_exact
       |    AS within_bound
       |FROM ex JOIN est USING (source, gram_n)
       |ORDER BY source, gram_n""".stripMargin
  }

  /** DuckDB mirror of `ivf_ann_learned`: identical structure to the
    * `ivf_ann` oracle, with the VALUES rows carrying the learned
    * centroids (and their Scala-computed half-norms, bit-identical to
    * the literals [[graft.operators.IvfIndex.scoresCol]] plants in the
    * Spark plan; `Double.toString` round-trips exactly). */
  private[queries] def ivfLearnedSql(cents: Array[Array[Double]]): String = {
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
  private[queries] def semanticClustersSql(cents: Array[Array[Double]]): String = {
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

  /** DuckDB mirror of `semdedup` — the semanticClustersSql cell/ccos
    * replay, plus brute within-cell pairs at τ = 0.40, the recursive
    * min-label closure, and the (ccos, vec_id)-argmin retention. */
  private[queries] def semDedupSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    s"""WITH RECURSIVE cents(cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} - cents.hn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d) t WHERE rn = 1),
       |cc AS (
       |  SELECT cells.vec_id, cells.cell,
       |    ${sqlQ6(sqlDot("e.v", "cents.c") + " / (" + sqlNorm("e.v") + " * " + sqlNorm("cents.c") + ")")} AS ccos
       |  FROM cells JOIN e USING (vec_id)
       |  JOIN cents ON cents.cid = cells.cell),
       |p AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb, a.cell
       |  FROM cc a JOIN cc b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE ${sqlQ6(sqlDot("ea.v", "eb.v") + " / (" + sqlNorm("ea.v") + " * " + sqlNorm("eb.v") + ")")} >= 0.40),
       |ed AS (SELECT va AS u, vb AS w FROM p UNION ALL SELECT vb, va FROM p),
       |n AS (SELECT DISTINCT u AS node FROM ed),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM n
       |  UNION
       |  SELECT ed.w, r.lbl FROM reach r JOIN ed ON ed.u = r.node),
       |comp AS (SELECT node, MIN(lbl) AS comp_id FROM reach GROUP BY node),
       |member AS (
       |  SELECT comp.comp_id, comp.node, cc.cell, cc.ccos
       |  FROM comp JOIN cc ON cc.vec_id = comp.node),
       |keep AS (
       |  SELECT comp_id, ccos FROM (
       |    SELECT comp_id, ccos, row_number() OVER (
       |      PARTITION BY comp_id ORDER BY ccos, node) AS rn
       |    FROM member) t WHERE rn = 1),
       |grp AS (
       |  SELECT m.comp_id, MIN(m.cell) AS cell,
       |    CAST(COUNT(*) AS BIGINT) AS sz,
       |    MIN(CAST(FLOOR(keep.ccos * 1000000.0 + 0.5) AS BIGINT)) AS kq
       |  FROM member m JOIN keep ON keep.comp_id = m.comp_id
       |  GROUP BY 1),
       |pa AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
       |       FROM p GROUP BY 1),
       |ga AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
       |    CAST(SUM(sz - 1) AS BIGINT) AS n_removed,
       |    CAST(SUM(kq) AS BIGINT) AS kept_cos_mass_6
       |  FROM grp GROUP BY 1),
       |cv AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
       |       FROM cells GROUP BY 1)
       |SELECT cv.cell, cv.n_vecs,
       |  CAST(COALESCE(pa.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       |  CAST(COALESCE(ga.n_dup_groups, 0) AS BIGINT) AS n_dup_groups,
       |  CAST(COALESCE(ga.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(COALESCE(ga.kept_cos_mass_6, 0) AS BIGINT) AS kept_cos_mass_6
       |FROM cv LEFT JOIN pa USING (cell) LEFT JOIN ga USING (cell)
       |ORDER BY cell""".stripMargin
  }

  /** DuckDB mirror of `incremental_semdedup`: the FULL recursive
    * closure over the same within-cell cosine pairs — the engine's
    * merge-fold must equal a from-scratch recompute (the
    * incremental_clusters gate applied to the embedding lane). */
  private[queries] def incrementalSemDedupSql(
      cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    s"""WITH RECURSIVE cents(cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} - cents.hn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d) t WHERE rn = 1),
       |p AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE ${sqlQ6(sqlDot("ea.v", "eb.v") + " / (" + sqlNorm("ea.v") + " * " + sqlNorm("eb.v") + ")")} >= 0.40),
       |ed AS (SELECT va AS u, vb AS w FROM p UNION ALL SELECT vb, va FROM p),
       |n AS (SELECT DISTINCT u AS node FROM ed),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM n
       |  UNION
       |  SELECT ed.w, r.lbl FROM reach r JOIN ed ON ed.u = r.node),
       |comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM comp GROUP BY 1)
       |SELECT comp.node AS vec_id, comp.cluster_id, sz.cluster_size
       |FROM comp JOIN sz USING (cluster_id)
       |ORDER BY cluster_id, vec_id""".stripMargin
  }

  /** DuckDB mirror of `semantic_decontaminate`: the same augmented
    * relation (planted exact copies under +2·10⁶ ids), cells, exact
    * q6 within-cell cosine pairs and hash split — cross-split pairs
    * oriented train → eval. */
  private[queries] def semanticDecontaminateSql(
      cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
    }.mkString(",\n    ")
    s"""WITH cents(cid, c, hn) AS (VALUES
       |    $rows),
       |e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 2000000, embedding::DOUBLE[] FROM embeddings
       |  WHERE vec_id % 12 = 1),
       |d AS (SELECT e.vec_id, cents.cid, ${sqlDot("e.v", "cents.c")} - cents.hn AS s
       |      FROM e CROSS JOIN cents),
       |cells AS (SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM d) t WHERE rn = 1),
       |p AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb,
       |    ${sqlQ6(sqlDot("ea.v", "eb.v") + " / (" + sqlNorm("ea.v") + " * " + sqlNorm("eb.v") + ")")} AS cos
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE ${sqlQ6(sqlDot("ea.v", "eb.v") + " / (" + sqlNorm("ea.v") + " * " + sqlNorm("eb.v") + ")")} >= 0.40),
       |lab AS (
       |  SELECT vec_id, $sqlSplitCase AS split FROM (
       |    SELECT vec_id,
       |      ${sqlMd5Fold32("split:v1:", "CAST(vec_id AS VARCHAR)")} AS v
       |    FROM e))
       |SELECT
       |  CASE WHEN la.split = 'train' THEN p.va ELSE p.vb END AS train_vec,
       |  CASE WHEN la.split = 'train' THEN p.vb ELSE p.va END AS eval_vec,
       |  CASE WHEN la.split = 'train' THEN lb.split ELSE la.split END
       |    AS eval_split,
       |  p.cos
       |FROM p
       |  JOIN lab la ON la.vec_id = p.va
       |  JOIN lab lb ON lb.vec_id = p.vb
       |WHERE (la.split = 'train' AND lb.split <> 'train')
       |   OR (lb.split = 'train' AND la.split <> 'train')
       |ORDER BY train_vec, eval_vec""".stripMargin
  }

  /** DuckDB mirror of `ivf_append` — same cells/cos replay as
    * [[semanticClustersSql]], split by the arrival predicate. */
  private[queries] def ivfAppendSql(cents: Array[Array[Double]]): String = {
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
  private[queries] def pqCbValues(books: Array[Array[Array[Double]]]): String =
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) =>
        val lit = c.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"
        s"(${j + 1}, ${i + 1}, $lit, ${(c.map(x => x * x).sum / 2.0).toString})"
      }
    }.mkString(",\n    ")

  private[queries] def pqAnnSql(books: Array[Array[Array[Double]]]): String =
    s"""WITH ${pqCoreCtes(books)}
       |SELECT probe_id, rn, vec_id AS neighbor_id, adc
       |FROM ranked WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin

  /** DuckDB mirror of `ann_recall`: the PQ core CTEs + the exact
    * inner-product ranking + the top-5 overlap count — the recall
    * evaluation replayed end-to-end. */
  private[queries] def annRecallSql(books: Array[Array[Array[Double]]]): String =
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
  private[queries] def pqCoreCtes(books: Array[Array[Array[Double]]]): String = {
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
  private[queries] def ivfPqSql(cents: Array[Array[Double]],
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
  private[queries] val bpeSqlCtes: String = {
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

  private[queries] val bpeSqlRoundSelects: String =
    (1 to BpeRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_round, a AS left_sym,
         |  b AS right_sym, c AS pair_count, vs AS vocab_after
         |FROM b$r, v$r""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** The per-source centroid CTE chain (e/x/cc/cent), shared by the
    * source_centroids and source_affinity oracles. */
  private[queries] val centroidSqlCtes: String =
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


  /** The full_curation oracle's CTE chain (everything up to and
    * including `st`) — shared verbatim with `curation_funnel`, so the
    * funnel counts are per-stage views of the SAME replayed pipeline,
    * not a second implementation. Must follow `WITH RECURSIVE`. */
  private[queries] def fullCurationSqlCtes: String =
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
  private[queries] lazy val staticOracleTail: Map[String, String] = Map(
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
    // trained on the literal reference-source slice, scored on all;
    // per-token micro-nat quantization before the order-free sum, the
    // tercile ordering is (mean_nll, doc_id), bucket means on the
    // davg lane — all mirrored from the Spark side
    "perplexity_filter" ->
      s"""WITH t AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |refc AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cr
        |  FROM t WHERE source IN ('src0','src1','src2','src3')
        |  GROUP BY tok),
        |tot AS (
        |  SELECT CAST(SUM(cr) AS BIGINT) AS n_ref,
        |    (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM t) AS v
        |  FROM refc),
        |docs AS (
        |  SELECT t.doc_id, t.source,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CAST(FLOOR(-ln(CAST(COALESCE(refc.cr, 0) + 1 AS DOUBLE)
        |        / CAST(tot.n_ref + tot.v AS DOUBLE)) * 1000000.0 + 0.5)
        |      AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_nll
        |  FROM t LEFT JOIN refc USING (tok) CROSS JOIN tot
        |  GROUP BY t.doc_id, t.source),
        |bucketed AS (
        |  SELECT source, doc_id, n_tokens, mean_nll,
        |    NTILE(3) OVER (PARTITION BY source ORDER BY mean_nll, doc_id)
        |      AS b
        |  FROM docs)
        |SELECT source, CAST(b AS BIGINT) AS ppl_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  ${QueryUtil.sqlDavg("mean_nll")} AS mean_nll_bucket
        |FROM bucketed GROUP BY 1, 2 ORDER BY source, ppl_bucket""".stripMargin,

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

    // the catalog-resolved twin shares the SAME oracle verbatim: the
    // catalog must change nothing but the resolution path
    "bm25_catalog" -> Bm25OracleSql,

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
    // identical 64-sample stride grid, integer mean test (64·g > Σg),
    // 16-bit bands, pigeonhole band join and bit_count verify; probe
    // payloads interpolated as the same literals
    "phash_neardup" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES
         |    $phashProbeValuesSql) pr(doc_id, text)),
         |b AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    octet_length(encode(text)) AS n
         |  FROM src WHERE octet_length(encode(text)) > 0),
         |g AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 64), j ->
         |      (strpos('0123456789ABCDEF',
         |         h[2*((j*n)//64)+1:2*((j*n)//64)+1]) - 1) * 16
         |      + (strpos('0123456789ABCDEF',
         |         h[2*((j*n)//64)+2:2*((j*n)//64)+2]) - 1)) AS gs
         |  FROM b),
         |hb AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 4), bb ->
         |      list_sum(list_transform(range(0, 16), k ->
         |        CASE WHEN 64 * gs[bb*16+k+1] > list_sum(gs)
         |             THEN 1<<k ELSE 0 END))) AS bands
         |  FROM g),
         |banded AS (
         |  SELECT doc_id, bands, unnest(range(0, 4)) AS band_no FROM hb),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |    a.bands AS ba, c.bands AS bc
         |  FROM banded a JOIN banded c
         |    ON a.band_no = c.band_no
         |   AND a.bands[a.band_no+1] = c.bands[c.band_no+1]
         |   AND a.doc_id < c.doc_id),
         |p AS (
         |  SELECT doc_a, doc_b,
         |    CAST(list_sum(list_transform(range(0, 4), i ->
         |      bit_count(xor(CAST(ba[i+1] AS BIGINT),
         |        CAST(bc[i+1] AS BIGINT))))) AS BIGINT) AS hamming
         |  FROM cand)
         |SELECT doc_a, doc_b, hamming FROM p
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

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
