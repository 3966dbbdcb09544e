package graft.operators

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: data-efficient learning at
  * web-scale through semantic deduplication") as a reusable library
  * operator — the embedding-space dedup that catches PARAPHRASED
  * redundancy lexical dedup cannot: cluster the corpus into IVF cells
  * (the k-means partition bounds the pair domain to Σ|cell|², never
  * n²), verify exact cosine within each cell, connect above-τ pairs
  * into dup groups, and keep per group the member with the LOWEST
  * cosine to its cell centroid (the paper's diversity-preserving
  * retention; deterministic (ccos, vec_id) tiebreak).
  *
  * Scale shape: pair ENUMERATION rides [[CandidatePairs]] with the
  * cell as the bucket — a hot cell is hash-chunked so no task owns its
  * O(m²) — and the vectors hash-join back per side for the exact
  * cosine verify, so the embedding payload never enters the pair
  * shuffle. Used by the `semdedup` query row and the `graft_semdedup`
  * SQL table function. */
object SemDedup {

  private def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0)

  /** The q6 exact-cosine spelling every semantic-dedup surface shares
    * (batch rows, the TVF, and the live cell-stream probe — shared so
    * stream == batch is a set equality, not a tolerance). */
  private[graft] def cos(a: Column, b: Column): Column =
    q6(F.dotd(a, b) /
      (sqrt(F.dotd(a, a)) * sqrt(F.dotd(b, b))))

  /** Within-cell dup pairs `(cell, vec_a, vec_b, cos)` of a
    * `(vec_id, v)` relation at exact q6 cosine ≥ `tau`, cells assigned
    * to the nearest of `cents`. */
  def pairs(emb: DataFrame, cents: Array[Array[Double]], tau: Double,
      bucketCap: Int = 1024): DataFrame = {
    val cells = IvfIndex.assignCells(emb, cents)
      .select(col("cell"), col("vec_id"), col("v"))
    CandidatePairs.fromBuckets(cells.select(col("cell"), col("vec_id")),
      Seq("cell"), "vec_id", "vec_a", "vec_b", bucketCap)
      .join(cells.select(col("cell"), col("vec_id").as("vec_a"),
        col("v").as("va")), Seq("vec_a"))
      .join(cells.select(col("vec_id").as("vec_b"), col("v").as("vb")),
        Seq("vec_b"))
      .withColumn("cos", cos(col("va"), col("vb")))
      .filter(col("cos") >= lit(tau))
      .select(col("cell"), col("vec_a"), col("vec_b"), col("cos"))
  }

  /** The full SemDeDup decision relation: one row per vector with its
    * cell, centroid cosine (q6), dup-group label (self when unique)
    * and the keep flag — 1 for unique vectors and each group's
    * lowest-centroid-cosine member, 0 for dropped near-duplicates. */
  def dedup(emb: DataFrame, cents: Array[Array[Double]], tau: Double,
      bucketCap: Int = 1024): DataFrame = {
    val p = pairs(emb, cents, tau, bucketCap)
    val comp = ConnectedComponents.components(
      p.select(col("vec_a"), col("vec_b")), "vec_a", "vec_b")
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val cc = IvfIndex.assignCells(emb, cents)
      .withColumn("c", element_at(centsLit, col("cell").cast("int")))
      .select(col("cell"), col("vec_id"),
        cos(col("v"), col("c")).as("ccos"))
    val member = comp.join(cc, col("node") === cc("vec_id"))
      .select(col("component"), col("node"), col("ccos"))
    val keeps = member.groupBy(col("component"))
      .agg(min(struct(col("ccos"), col("node"))).as("k"))
      .select(col("component"), col("k.node").as("keeper"))
    cc.join(member.select(col("node").as("vec_id"), col("component")),
        Seq("vec_id"), "left_outer")
      .join(keeps, Seq("component"), "left_outer")
      .select(col("vec_id"), col("cell"), col("ccos"),
        coalesce(col("component"), col("vec_id")).as("component"),
        when(col("component").isNull || col("keeper") === col("vec_id"),
          1L).otherwise(0L).as("keep"))
  }
}
