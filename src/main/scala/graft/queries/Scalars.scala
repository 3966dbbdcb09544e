package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families — SURVEY.md §2 rows X1–X7, X9.
  *
  * Cross-engine determinism notes: regexp_replace needs the 'g' flag in
  * DuckDB to match Spark's replace-all; `sqrt` is IEEE-correctly-rounded
  * everywhere (raw doubles compare exactly) while `log10` is libm and
  * may differ in the last ulp — its output is quantized to 1e-6; narrow
  * int results are cast to BIGINT on both sides (DuckDB scalar fns
  * return BIGINT where Spark returns INT).
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  import QueryUtil.{q6, sqlQ6}

  /** Per-dir variant-SHREDDED snapshot paths (`json_variant_shredded`)
    * — `events.props` parsed once and persisted as a parquet VARIANT
    * column with shredding (Spark 4.1 writes the inferred
    * `typed_value` group by default: writeShredding.enabled +
    * inferShreddingSchema). Build-once-per-dir, the bm25_indexed
    * pattern. */
  private[queries] val variantSnapCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def variantSnapshot(s: SparkSession, dir: String): String =
    variantSnapCache.computeIfAbsent(dir, d => {
      import s.implicits._
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_variant_" +
        math.abs(d.hashCode).toString
      Tables.events(s, d)
        .select($"event_type", expr("parse_json(props)").as("props_v"))
        .write.mode("overwrite").parquet(p)
      p
    })

  val queries: Map[String, Q] = Map(
    // X1: the string surface over documents.
    "string_fns" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          length($"text").cast("long").as("n_len"),
          size(split($"text", " ")).cast("long").as("n_tokens"),
          upper(substring($"text", 1, 12)).as("head_upper"),
          regexp_extract($"text", "^(\\w+)", 1).as("first_word"),
          regexp_replace(substring($"text", 1, 30), "[aeiou]", "_").as("devoweled"),
          instr($"text", "data").cast("long").as("data_pos"),
          lpad($"lang", 5, "_").as("lang_padded"),
          concat($"lang", lit(":"), $"source").as("lang_source"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy($"doc_id")
    }),

    // X10: Unicode normalization (UAX #15) as a codegen'd native
    // expression — the canonicalization in front of dedup keys
    // (precomposed vs combining-mark spellings must fingerprint
    // identically). The fixture corpus is pure ASCII (where NFC is
    // the identity — itself worth pinning), so each row also carries
    // a constructed non-NFC suffix ("cafe" + COMBINING ACUTE) whose
    // normalization collapses a combining pair to one precomposed
    // code point: the oracle checks the full normalized STRING per
    // row against DuckDB's independent nfc_normalize (utf8proc),
    // plus both length counts. NFKC/NFKD forms (no DuckDB twin) are
    // golden-vector-checked in UnicodeNormalizeSpec.
    "unicode_norm" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          concat(substring($"text", 1, 16), lit(" caf"),
            lit("é")).as("raw"))
        .select($"doc_id",
          length($"raw").cast("long").as("raw_len"),
          graft.functions.GraftFunctions
            .unicode_normalize($"raw", "NFC").as("nfc"))
        .select($"doc_id", $"raw_len",
          length($"nfc").cast("long").as("nfc_len"),
          ($"raw_len" =!= length($"nfc").cast("long")).as("changed"),
          $"nfc")
        .orderBy($"doc_id")
    }),

    // X3 + X4: math and conditional functions over lineitem.
    "cond_math" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_orderkey" <= 500)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          when($"l_quantity" >= 40, "bulk")
            .when($"l_quantity" >= 10, "mid")
            .otherwise("small").as("qty_class"),
          coalesce(nullif($"l_returnflag", lit("N")), lit("none")).as("flag_or_none"),
          greatest($"l_tax", $"l_discount").as("max_rate"),
          least($"l_tax", $"l_discount").as("min_rate"),
          abs(-$"l_quantity").as("abs_qty"),
          floor($"l_extendedprice").as("price_floor"),
          ceil($"l_extendedprice").as("price_ceil"),
          pmod($"l_linenumber", lit(3)).cast("long").as("line_mod3"),
          sqrt($"l_quantity").as("sqrt_qty"),
          q6(log10($"l_extendedprice")).as("log10_price"),
          signum($"l_discount" - lit(0.05)).as("disc_sign"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    }),

    // X2: date/time functions over orders.
    "date_fns" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.orders(s, dir)
        .filter($"o_orderkey" <= 1000)
        .select($"o_orderkey", $"o_orderdate",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("d"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long")
            .as("days_since_epoch_start"),
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("due_date"),
          unix_timestamp($"o_orderdate").as("epoch_sec"))
        .orderBy($"o_orderkey")
    }),

    // X6 + X7: JSON parsing and map functions over events.props.
    "json_map" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("props_map",
          from_json($"props", org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .select($"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          get_json_object($"props", "$.k").cast("long").as("k_num"),
          element_at($"props_map", "k").cast("long").as("k_via_map"),
          size(map_keys($"props_map")).cast("long").as("n_keys"))
        .orderBy($"event_id")
    }),

    // X6 + U4: generator over a map column — each props entry becomes
    // a row (explode is the engine's UDTF surface, SURVEY §2 U4).
    "map_explode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("props_map",
          from_json($"props", org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .select($"event_id", explode($"props_map").as(Seq("key", "value")))
        .select($"event_id", $"key", $"value".cast("long").as("v"))
        .orderBy($"event_id", $"key")
    }),

    // X5: array functions and higher-order functions over embeddings.
    // The L2 norm folds left from 0.0 in both engines (identical IEEE
    // op sequence); quantized to 1e-6 out of caution.
    "array_hof" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val dbl = $"embedding".cast("array<double>")
      Tables.embeddings(s, dir)
        .select($"vec_id",
          size($"embedding").cast("long").as("dim"),
          element_at($"embedding", 1).cast("double").as("first_component"),
          q6(sqrt(aggregate(transform(dbl, x => x * x), lit(0.0), (acc, x) => acc + x)))
            .as("l2_norm"),
          q6(aggregate(dbl, lit(0.0), (acc, x) => acc + x)).as("comp_sum"),
          size(filter(dbl, x => x > lit(0.0))).cast("long").as("n_positive"))
        .orderBy($"vec_id")
    }),

    // U2: black-box scalar UDF surface — a Scala closure registered
    // as a UDF, next to a codegen'd built-in computing a comparable
    // result. (Engine guidance stands: UDFs are the LAST resort — this
    // exists to prove the extension point, and the oracle checks it
    // against DuckDB's native reverse/levenshtein.)
    "udf_scalar" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val revUdf = udf((x: String) => if (x == null) null else x.reverse)
      Tables.documents(s, dir)
        .select($"doc_id",
          revUdf($"lang").as("lang_reversed"),
          levenshtein($"lang", $"source").cast("long").as("lang_source_dist"))
        .orderBy($"doc_id")
    }),

    // X11: BPE-style pre-tokenization census — the GPT-2-family
    // pretokenizer splits text into letter runs / digit runs /
    // punctuation runs BEFORE byte-pair merging; the run counts are
    // the "fertility" signal (regex tokens per whitespace token) that
    // decides tokenizer fit for a corpus. Runs over the RAW event
    // payloads (`events.props`, JSON text — the documents fixture is
    // pure lowercase words, where the census is degenerate). Three
    // disjoint portable character-class regexes (identical semantics
    // under Java regex and RE2) so the census is engine-exact; one
    // scan, one map-combinable rollup per event type.
    "regex_tokens" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val alpha = size(regexp_extract_all($"props", lit("[A-Za-z]+"), lit(0)))
        .cast("long")
      val num = size(regexp_extract_all($"props", lit("[0-9]+"), lit(0)))
        .cast("long")
      val punct = size(regexp_extract_all($"props", lit("[^A-Za-z0-9 ]+"),
        lit(0))).cast("long")
      Tables.events(s, dir)
        .select($"event_type", alpha.as("a"), num.as("d"), punct.as("p"),
          size(split($"props", " ")).cast("long").as("ws"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"a").as("n_alpha"), sum($"d").as("n_digit"),
          sum($"p").as("n_punct"), sum($"ws").as("n_ws"),
          q6((sum($"a") + sum($"d") + sum($"p")).cast("double") /
            sum($"ws").cast("double")).as("fertility"))
        .orderBy($"event_type")
    }),

    // X12: VARIANT semi-structured path (Spark 4) — the open-format
    // answer to schema-on-read JSON at scale: `parse_json` builds the
    // binary variant ONCE at the scan and every downstream path
    // extraction is a typed O(1) binary probe, where the from_json/
    // get_json_object spelling re-parses text per extraction (and a
    // variant-shredded parquet pushes the probe into the scan —
    // `PushedVariantExtractions` in the DSv2 node). Typed existing
    // path, missing path (NULL, no error), and a per-type rollup of
    // the extracted value; oracle replays via DuckDB's JSON path
    // extraction.
    "json_variant" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type",
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          expr("variant_get(parse_json(props), '$.missing', 'bigint')")
            .as("m"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          count($"k").as("n_k"),
          count($"m").as("n_missing_hits"),
          sum($"k").as("k_sum"),
          min($"k").as("k_min"), max($"k").as("k_max"))
        .orderBy($"event_type")
    }),

    // X12 (shredded): the same rollup answered from a variant-SHREDDED
    // parquet snapshot — the mechanism the X12 row cites actually
    // exercised: `props_v` is stored as a VARIANT group whose inferred
    // `typed_value.k` rides as a plain int64 column, and
    // PushVariantIntoScan rewrites the `variant_get` extractions into
    // scan-level struct fields (ReadSchema shows
    // `props_v:struct<...bigint>`, NOT a variant binary) — at 100 TB
    // the per-row parse json_variant's in-query `parse_json` pays is
    // gone; the probe is a columnar int read. Shares json_variant's
    // oracle verbatim (the snapshot is a projection of events), so the
    // write→shred→pushed-extraction path is itself hash-checked.
    // RelationalSpec pins the pushed ReadSchema shape.
    "json_variant_shredded" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val snap = variantSnapshot(s, dir)
      s.read.parquet(snap)
        .select($"event_type",
          expr("variant_get(props_v, '$.k', 'bigint')").as("k"),
          expr("variant_get(props_v, '$.missing', 'bigint')").as("m"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          count($"k").as("n_k"),
          count($"m").as("n_missing_hits"),
          sum($"k").as("k_sum"),
          min($"k").as("k_min"), max($"k").as("k_max"))
        .orderBy($"event_type")
    }),

    // X9: standard cryptographic/checksum hashes (the non-fnv1a family).
    "hash_fns" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          md5($"text").as("md5_hex"),
          sha2($"text", 256).as("sha256_hex"))
        .orderBy($"doc_id")
    }),
  )

  /** X9 completion: the non-cryptographic hash family — xxhash64,
    * murmur3 (Spark's `hash`), crc32. DuckDB has no compatible
    * implementations (its `hash` is a different algorithm), so the
    * oracle is data-dependent: constructing the query caches the
    * per-dir (doc_id, text) frame, and [[oracleFor]] interpolates the
    * expected values computed by
    * [[graft.functions.IndependentHashes]] — public-spec
    * reimplementations never touching Spark's code paths — as VALUES
    * literals (the `simhash_neighbors` pattern). HashFnsSpec
    * additionally pins boundary-length vectors incl. the CRC-32
    * standard check value. */
  val nativeHashQueries: Map[String, Q] = Map(
    "hash_fns_native" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      hashDocsCache.get(s, dir)(
        d => Tables.documents(s, d).select($"doc_id", $"text"))
      lastOracleDir = Some(dir)
      Tables.documents(s, dir)
        .select($"doc_id",
          xxhash64($"text").as("xxh64"),
          hash($"text").cast("long").as("murmur3"),
          crc32($"text").as("crc32"))
        .orderBy($"doc_id")
    }),
  )

  /** Per-dir (doc_id, text) frames behind the `hash_fns_native`
    * oracle — frame construction is lazy; the collect (and the
    * independent hashing of each text) happens once per dir at
    * oracle-build time, memoized in [[hashSqlCache]]. */
  private val hashDocsCache = new SessionCache[DataFrame]
  private val hashSqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var lastOracleDir: Option[String] = None

  /** DuckDB mirror of `hash_fns_native`: one VALUES row per document
    * carrying the three expected hashes of its UTF-8 bytes, computed
    * by [[graft.functions.IndependentHashes]] (Spark's documented
    * seed 42 for xxhash64/murmur3). */
  private def hashNativeSql(rows: Array[(Long, Long, Long, Long)]): String = {
    val vals = rows.sortBy(_._1)
      .map { case (id, x, m, c) => s"($id, $x, $m, $c)" }
      .mkString(",\n    ")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(xxh64 AS BIGINT) AS xxh64,
       |  CAST(murmur3 AS BIGINT) AS murmur3,
       |  CAST(crc32 AS BIGINT) AS crc32
       |FROM (VALUES
       |    $vals) v(doc_id, xxh64, murmur3, crc32)
       |ORDER BY doc_id""".stripMargin
  }

  /** [[staticOracle]] plus the data-dependent `hash_fns_native` entry
    * for `dir`, present once that dir's query has been constructed
    * (which warms its cache) — the Pipeline.oracleFor contract. */
  def oracleFor(dir: String): Map[String, String] =
    staticOracle ++ hashDocsCache.peek(dir).map { f =>
      Map("hash_fns_native" -> hashSqlCache.computeIfAbsent(dir, _ =>
        hashNativeSql(f.collect().map { r =>
          val b = r.getString(1).getBytes("UTF-8")
          (r.getLong(0),
            graft.functions.IndependentHashes.xxh64(b, 42L),
            graft.functions.IndependentHashes.murmur3x86_32(b, 42).toLong,
            graft.functions.IndependentHashes.crc32(b))
        })))
    }.getOrElse(Map.empty)

  def oracle: Map[String, String] =
    lastOracleDir.map(oracleFor).getOrElse(staticOracle)

  private val staticOracle: Map[String, String] = Map(
    "string_fns" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_len,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  upper(substring(text, 1, 12)) AS head_upper,
        |  regexp_extract(text, '^(\w+)', 1) AS first_word,
        |  regexp_replace(substring(text, 1, 30), '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(instr(text, 'data') AS BIGINT) AS data_pos,
        |  lpad(lang, 5, '_') AS lang_padded,
        |  lang || ':' || source AS lang_source,
        |  trim('  pad  ') AS trimmed
        |FROM documents ORDER BY doc_id""".stripMargin,

    // independent normalizer (utf8proc) on the identically
    // constructed raw string; chr(769) = COMBINING ACUTE ACCENT
    "unicode_norm" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    substring(text, 1, 16) || ' caf' || 'e' || chr(769) AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) AS BIGINT) AS raw_len,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_len,
        |  length(raw) <> length(nfc_normalize(raw)) AS changed,
        |  nfc_normalize(raw) AS nfc
        |FROM r ORDER BY doc_id""".stripMargin,

    "cond_math" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity,
         |  CASE WHEN l_quantity >= 40 THEN 'bulk'
         |       WHEN l_quantity >= 10 THEN 'mid'
         |       ELSE 'small' END AS qty_class,
         |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
         |  greatest(l_tax, l_discount) AS max_rate,
         |  least(l_tax, l_discount) AS min_rate,
         |  abs(-l_quantity) AS abs_qty,
         |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
         |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
         |  CAST(l_linenumber % 3 AS BIGINT) AS line_mod3,
         |  sqrt(l_quantity) AS sqrt_qty,
         |  ${sqlQ6("log(l_extendedprice)")} AS log10_price,
         |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0
         |       WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign
         |FROM lineitem
         |WHERE l_orderkey <= 500
         |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "date_fns" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |    AS days_since_epoch_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
        |FROM orders
        |WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,

    "json_map" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_via_map,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,

    "map_explode" ->
      """SELECT event_id, key, CAST(json_extract_string(props, '$.' || key) AS BIGINT) AS v
        |FROM (SELECT event_id, props, unnest(json_keys(props)) AS key FROM events)
        |ORDER BY event_id, key""".stripMargin,

    "array_hof" ->
      s"""SELECT vec_id,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  CAST(embedding[1] AS DOUBLE) AS first_component,
         |  ${sqlQ6("sqrt(list_reduce(list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)), (acc, x) -> acc + x))")} AS l2_norm,
         |  ${sqlQ6("list_reduce(list_prepend(0.0, embedding::DOUBLE[]), (acc, x) -> acc + x)")} AS comp_sum,
         |  CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0.0)) AS BIGINT) AS n_positive
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "udf_scalar" ->
      """SELECT doc_id,
        |  reverse(lang) AS lang_reversed,
        |  CAST(levenshtein(lang, source) AS BIGINT) AS lang_source_dist
        |FROM documents ORDER BY doc_id""".stripMargin,

    "hash_fns" ->
      """SELECT doc_id,
        |  md5(text) AS md5_hex,
        |  sha256(text) AS sha256_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    "json_variant" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS n_k,
        |  CAST(COUNT(CAST(json_extract(props, '$.missing') AS BIGINT))
        |    AS BIGINT) AS n_missing_hits,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_sum,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_min,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_max
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // the shredded twin is a projection of events, so the SAME oracle
    // checks the write→shred→pushed-extraction path end-to-end
    "json_variant_shredded" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS n_k,
        |  CAST(COUNT(CAST(json_extract(props, '$.missing') AS BIGINT))
        |    AS BIGINT) AS n_missing_hits,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_sum,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_min,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_max
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "regex_tokens" ->
      s"""WITH per_ev AS (
         |  SELECT event_type,
         |    CAST(len(regexp_extract_all(props, '[A-Za-z]+')) AS BIGINT) AS a,
         |    CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS d,
         |    CAST(len(regexp_extract_all(props, '[^A-Za-z0-9 ]+')) AS BIGINT) AS p,
         |    CAST(len(string_split(props, ' ')) AS BIGINT) AS ws
         |  FROM events)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(a) AS BIGINT) AS n_alpha,
         |  CAST(SUM(d) AS BIGINT) AS n_digit,
         |  CAST(SUM(p) AS BIGINT) AS n_punct,
         |  CAST(SUM(ws) AS BIGINT) AS n_ws,
         |  ${sqlQ6("CAST(SUM(a) + SUM(d) + SUM(p) AS DOUBLE) / SUM(ws)")} AS fertility
         |FROM per_ev GROUP BY 1 ORDER BY event_type""".stripMargin,
  )
}
