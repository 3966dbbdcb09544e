package graft.queries

import graft.Tables
import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators over `documents` / `embeddings`
  * (SURVEY.md §2.J). Starts with L1 exact dedup; near-dup / similarity
  * land in later PRs.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Second-fingerprint-lane seed (2^64 / golden ratio — a public
    * mixing constant); any init state != OffsetBasis yields an
    * independent member of the reference's `create_init` hash family. */
  private val Lane2Seed: Long = 0x9e3779b97f4a7c15L

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
  )

  // Oracle partitions by text directly — semantically identical to the
  // 64-bit fingerprint absent collisions (2^-64 per pair).
  val oracle: Map[String, String] = Map(
    "exact_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
  )
}
