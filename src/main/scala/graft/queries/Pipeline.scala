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

  val queries: Map[String, Q] = Map(
    // L1: exact dedup by content fingerprint. The 64-bit fnv1a(text)
    // fingerprint is the shuffle key — at 100 TB the window partitions
    // by fingerprint (near-uniform), never by the text itself, so no
    // oversized shuffle keys and map-side the text is reduced to 8
    // bytes. Deterministic winner: smallest doc_id.
    "exact_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"fp").orderBy($"doc_id")
      Tables.documents(s, dir)
        .withColumn("fp", F.fnv1a($"text"))
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
