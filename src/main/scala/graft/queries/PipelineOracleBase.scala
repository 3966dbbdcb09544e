package graft.queries

import graft.Tables
import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** The static DuckDB oracle map (one SQL twin per query; the
  * data-dependent interpolated rows live in oracleFor). */
private[queries] trait PipelineOracleBase extends PipelineOracleSupport {
  /** The L99 brute suffix-scan CTE chain (docs+probes -> token
    * matches -> diagonal runs -> per-position dup_len -> interval
    * union islands `g`) — ONE spelling shared by the
    * dup_substring_runs and dup_region_stats oracles. */
  private[queries] def dupRunsSqlCtes: String = {
    def probeSql(mod: Int, offset: Long, mark: String, lo: Int,
        hi: Int, minToks: Int) =
      s"""SELECT doc_id + $offset AS doc_id,
         |    '$mark' || doc_id || ' ' ||
         |    array_to_string(ws[$lo:$hi], ' ') ||
         |    ' ${mark}z' || doc_id AS text
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM base)
         |  WHERE len(ws) >= $minToks AND doc_id % $mod = 0""".stripMargin
    s"""base AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % $DupRunMod = 0),
       |docs AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL ${probeSql(21, 70000000L, "pa", 6, 10, 10)}
       |  UNION ALL ${probeSql(35, 80000000L, "pb", 3, 15, 15)}),
       |tk AS (
       |  SELECT doc_id, unnest([{'pos': i - 1, 'tok': ws[i]}
       |      for i in range(1, len(ws) + 1)], recursive := true)
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM docs)),
       |m AS (
       |  SELECT a.doc_id AS da, a.pos AS pa, b.doc_id AS db, b.pos AS pb
       |  FROM tk a JOIN tk b ON a.tok = b.tok
       |  WHERE a.doc_id <> b.doc_id OR a.pos <> b.pos),
       |isl AS (
       |  SELECT da, db, pa - pb AS d, pa,
       |    pa - ROW_NUMBER() OVER (PARTITION BY da, db, pa - pb
       |      ORDER BY pa) AS grp
       |  FROM m),
       |rn AS (
       |  SELECT da, db, d, grp, MAX(pa) AS re
       |  FROM isl GROUP BY 1, 2, 3, 4),
       |dl AS (
       |  SELECT i.da AS doc_id, i.pa AS pos,
       |    MAX(r.re - i.pa + 1) AS dup_len
       |  FROM isl i JOIN rn r ON i.da = r.da AND i.db = r.db
       |    AND i.d = r.d AND i.grp = r.grp
       |  GROUP BY 1, 2),
       |iv AS (
       |  SELECT doc_id, pos AS s, pos + dup_len AS e
       |  FROM dl WHERE dup_len >= $DupRunMinLen),
       |u AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > COALESCE(MAX(e) OVER (
       |        PARTITION BY doc_id ORDER BY s
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS brk
       |  FROM iv),
       |g AS (
       |  SELECT doc_id, s, e,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM u)""".stripMargin
  }

  private[queries] val staticOracleBase: Map[String, String] = Map(
    // oracle partitions by text directly — the L1 fingerprint
    // equivalence
    "cross_source_dups" ->
      """WITH alldocs AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT 'mirror_probe' AS source, text FROM documents
        |  WHERE doc_id % 53 = 0),
        |d AS (SELECT DISTINCT text, source FROM alldocs)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared_texts
        |FROM d a JOIN d b ON a.text = b.text AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // same confusable translate pass (code-point-wise in both
    // engines), same 60-bit md5 fold of the skeleton
    "homoglyph_dedup" ->
      s"""WITH probes AS (
         |  SELECT doc_id + 90000000 AS doc_id,
         |    chr(8203) || translate(text, 'aeo', 'аео') AS text
         |  FROM documents WHERE doc_id % 41 = 0),
         |alldocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM probes),
         |sk AS (
         |  SELECT doc_id, text,
         |    translate(lower(text),
         |      'аеорсхуі' || chr(160) || chr(8203) || chr(8204) ||
         |        chr(8205) || chr(65279),
         |      'aeopcxyi ') AS skel
         |  FROM alldocs),
         |fp AS (
         |  SELECT doc_id, text,
         |    list_reduce(list_transform(range(1, 16), i ->
         |      CAST(strpos('0123456789abcdef', md5(skel)[i:i]) - 1
         |        AS BIGINT)),
         |      (a, x) -> a * 16 + x) AS skel_fp
         |  FROM sk)
         |SELECT skel_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_raw_variants,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM fp GROUP BY 1 HAVING COUNT(*) >= 2
         |ORDER BY min_doc""".stripMargin,

    // same q6-micro component grid, same centroid re-quantization,
    // order-free long dot/norm/L2 sums
    "embedding_drift" ->
      s"""WITH comp AS (
         |  SELECT CAST(label AS BIGINT) AS label,
         |    vec_id % 2 = 0 AS ina,
         |    CAST(dim AS BIGINT) AS dim,
         |    CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
         |      AS BIGINT) AS xq
         |  FROM (SELECT label, vec_id,
         |          unnest([{'dim': i - 1, 'x': embedding[i]}
         |            for i in range(1, len(embedding) + 1)],
         |            recursive := true)
         |        FROM embeddings)),
         |cent AS (
         |  SELECT label, dim,
         |    CAST(SUM(CASE WHEN ina THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(SUM(CASE WHEN NOT ina THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nb,
         |    CAST(FLOOR(CAST(SUM(CASE WHEN ina THEN xq ELSE 0 END)
         |        AS DOUBLE) /
         |      CAST(SUM(CASE WHEN ina THEN 1 ELSE 0 END) AS DOUBLE)
         |      + 0.5) AS BIGINT) AS ca,
         |    CAST(FLOOR(CAST(SUM(CASE WHEN NOT ina THEN xq ELSE 0 END)
         |        AS DOUBLE) /
         |      CAST(SUM(CASE WHEN NOT ina THEN 1 ELSE 0 END) AS DOUBLE)
         |      + 0.5) AS BIGINT) AS cb
         |  FROM comp GROUP BY 1, 2)
         |SELECT label, CAST(MAX(na) AS BIGINT) AS n_a,
         |  CAST(MAX(nb) AS BIGINT) AS n_b,
         |  ${sqlQ6("CAST(SUM(ca * cb) AS DOUBLE) / " +
             "(sqrt(CAST(SUM(ca * ca) AS DOUBLE)) * " +
             "sqrt(CAST(SUM(cb * cb) AS DOUBLE)))")} AS centroid_cos,
         |  ${sqlQ6("sqrt(CAST(SUM((ca - cb) * (ca - cb)) AS DOUBLE)) " +
             "/ 1000000.0")} AS l2_shift
         |FROM cent GROUP BY 1 ORDER BY label""".stripMargin,

    // independent n-gram spelling (list comprehension vs transform);
    // identical exact distinct counts and q6 ratios
    "distinct_ngrams" ->
      s"""WITH ws AS (
         |  SELECT source, string_split(text, ' ') AS ws FROM documents),
         |g1 AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
         |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d1
         |  FROM (SELECT source, unnest(ws) AS g FROM ws) GROUP BY 1),
         |g2 AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n2,
         |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d2
         |  FROM (SELECT source, unnest([ws[i] || ' ' || ws[i + 1]
         |          for i in range(1, len(ws))]) AS g FROM ws)
         |  GROUP BY 1),
         |g3 AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n3,
         |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d3
         |  FROM (SELECT source,
         |          unnest([ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
         |            for i in range(1, len(ws) - 1)]) AS g FROM ws)
         |  GROUP BY 1)
         |SELECT source, n1 AS n_tokens,
         |  d1 AS d_1grams,
         |  ${sqlQ6("CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE)")}
         |    AS distinct_1,
         |  d2 AS d_2grams,
         |  ${sqlQ6("CAST(d2 AS DOUBLE) / CAST(n2 AS DOUBLE)")}
         |    AS distinct_2,
         |  d3 AS d_3grams,
         |  ${sqlQ6("CAST(d3 AS DOUBLE) / CAST(n3 AS DOUBLE)")}
         |    AS distinct_3
         |FROM g1 JOIN g2 USING (source) JOIN g3 USING (source)
         |ORDER BY source""".stripMargin,

    // same q6-micro sqrt weights, same integer Hare quota + largest
    // remainder
    "mixture_temperature" ->
      s"""WITH src AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1),
         |sw AS (
         |  SELECT source, n_docs,
         |    CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS sw
         |  FROM src),
         |tot AS (
         |  SELECT CAST(SUM(sw) AS BIGINT) AS s_tot,
         |    CAST(SUM(n_docs) AS BIGINT) AS n_tot
         |  FROM sw),
         |j AS (
         |  SELECT source, n_docs, sw, s_tot, n_tot,
         |    (10000 * sw) // s_tot AS base,
         |    (10000 * sw) % s_tot AS rem
         |  FROM sw CROSS JOIN tot),
         |l AS (
         |  SELECT *, 10000 - SUM(base) OVER () AS leftover,
         |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
         |  FROM j)
         |SELECT source, n_docs,
         |  ${sqlQ6("CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE)")}
         |    AS raw_share,
         |  ${sqlQ6("CAST(sw AS DOUBLE) / CAST(s_tot AS DOUBLE)")}
         |    AS temp_share,
         |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc
         |FROM l ORDER BY source""".stripMargin,

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

    // identical bigram extraction and Kneser–Ney arithmetic: the
    // per-pair double is one identically-spelled expression over
    // exact integer counts, micro-nat quantized before the sum
    "kn_bigram_logprob" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
         |  FROM d, UNNEST(range(1, len(ws))) AS u(i)
         |  WHERE len(ws) >= 2),
         |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
         |       FROM bg GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1,
         |         CAST(COUNT(DISTINCT w2) AS BIGINT) AS n1
         |       FROM bg GROUP BY 1),
         |cont AS (SELECT w2, CAST(COUNT(DISTINCT w1) AS BIGINT) AS nc
         |       FROM bg GROUP BY 1),
         |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS btypes FROM c2),
         |t AS (
         |  SELECT bg.doc_id,
         |    CAST(FLOOR(ln(
         |      (CAST(c2.c2 AS DOUBLE) - 0.75) / CAST(ctx.c1 AS DOUBLE) +
         |      0.75 * CAST(ctx.n1 AS DOUBLE) / CAST(ctx.c1 AS DOUBLE) *
         |        (CAST(cont.nc AS DOUBLE) / CAST(bt.btypes AS DOUBLE)))
         |      * 1000000.0 + 0.5) AS BIGINT) AS t
         |  FROM bg JOIN c2 USING (w1, w2) JOIN ctx USING (w1)
         |    JOIN cont USING (w2) CROSS JOIN bt)
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
    // brute twin of the suffix ranking: every token-match pair, LCP
    // as the forward diagonal run (gaps-and-islands per (da, db,
    // pa-pb)), per-position max, then the identical interval union —
    // the CTE chain is shared with the dup_region_stats oracle
    "dup_substring_runs" ->
      s"""WITH $dupRunsSqlCtes
         |SELECT doc_id, CAST(MIN(s) AS BIGINT) AS run_start,
         |  CAST(MAX(e) - 1 AS BIGINT) AS run_end,
         |  CAST(MAX(e) - MIN(s) AS BIGINT) AS run_len
         |FROM g GROUP BY doc_id, grp
         |ORDER BY doc_id, run_start""".stripMargin,

    // same CTE chain folded per doc, joined back to sources; probe
    // doc ids never match documents, so the stats cover real docs
    "dup_region_stats" ->
      s"""WITH $dupRunsSqlCtes,
         |runs AS (
         |  SELECT doc_id, MAX(e) - MIN(s) AS run_len
         |  FROM g GROUP BY doc_id, grp),
         |dt AS (
         |  SELECT doc_id, SUM(run_len) AS dup_tokens
         |  FROM runs GROUP BY 1),
         |dstat AS (
         |  SELECT d.source, len(string_split(d.text, ' ')) AS n_tokens,
         |    COALESCE(dt.dup_tokens, 0) AS dup_tokens
         |  FROM documents d LEFT JOIN dt ON dt.doc_id = d.doc_id
         |  WHERE d.doc_id % $DupRunMod = 0)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_with_dup,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens,
         |  ${sqlQ6("CAST(SUM(dup_tokens) AS DOUBLE) / SUM(n_tokens)")}
         |    AS dup_share
         |FROM dstat GROUP BY source ORDER BY source""".stripMargin,

    // same CTE chain; kept positions are the anti-range of the run
    // intervals, reassembled in position order
    "dedup_surgery" ->
      s"""WITH $dupRunsSqlCtes,
         |runs AS (
         |  SELECT doc_id, MIN(s) AS run_start, MAX(e) - 1 AS run_end
         |  FROM g GROUP BY doc_id, grp),
         |tk2 AS (
         |  SELECT doc_id, unnest([{'pos': i - 1, 'tok': ws[i]}
         |      for i in range(1, len(ws) + 1)], recursive := true)
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM base)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok FROM tk2 t
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM runs r WHERE r.doc_id = t.doc_id
         |      AND t.pos BETWEEN r.run_start AND r.run_end)),
         |ka AS (
         |  SELECT doc_id, COUNT(*) AS kept_tokens,
         |    string_agg(tok, ' ' ORDER BY pos) AS kept_text
         |  FROM kept GROUP BY 1)
         |SELECT b.doc_id,
         |  CAST(len(string_split(b.text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(ka.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  CAST(len(string_split(b.text, ' ')) -
         |    COALESCE(ka.kept_tokens, 0) AS BIGINT) AS removed_tokens,
         |  COALESCE(ka.kept_text, '') AS kept_text
         |FROM base b LEFT JOIN ka ON ka.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin,

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
  private[queries] val staticOracle: Map[String, String] = staticOracleBase ++ Map(
    "neardup_dedup_sql" -> staticOracleBase("neardup_dedup"),
    "pack_sql" -> staticOracleBase("pack_sequences"),
    "budget_select_sql" -> staticOracleBase("token_budget_select"))
}
