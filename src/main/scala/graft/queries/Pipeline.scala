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
object Pipeline extends PipelineCore
    with PipelineDedupQueries with PipelineScoreQueries
    with PipelineCurationQueries with PipelineOracleBase {

  /** The full registry — three family maps, names unchanged. */
  val queries: Map[String, Q] =
    dedupQueries ++ scoreQueries ++ curationQueries
}
