package graft.operators

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * the compression layer of a production vector index (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011): the d-dim space splits into m orthogonal subspaces, each
  * with its own k-centroid codebook, and a vector is stored as m
  * small integer codes (m·log2 k bits — here 4 bytes for a 64-dim
  * float vector, a 64× compression). Query-time scoring is ADC
  * (asymmetric distance computation): the query precomputes an m×k
  * table of subspace dot products, and each corpus vector's
  * approximate inner product is m table lookups — no float vector is
  * ever read at scoring time.
  *
  * Everything is DETERMINISTIC, reusing [[IvfIndex.learnCentroids]]'s
  * contract per subspace (fnv1a-seeded init, argmax `dot − |c|²/2`
  * assignment with lowest-id tiebreak, per-dimension means), so an
  * independent SQL engine can replay codebook learning, encoding, and
  * ADC scoring exactly (the `ivf_ann_learned` interpolated-literals
  * pattern).
  *
  * Scale contract (100 TB): codebooks are m·k·(d/m) = k·d doubles —
  * plan literals, never a broadcast relation; encoding is a pure
  * per-row projection (one pass, no shuffle); ADC scoring reads only
  * the m-byte codes, so the scored corpus is ~d·4/m times smaller on
  * the wire than the raw vectors; the codes column composes with the
  * IVF cell layout (encode within each cell) for the standard
  * IVF-PQ index.
  */
object PqIndex {

  private def centLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** Dots of `v` against every centroid of one codebook, as one array
    * column (the query-side ADC table for that subspace). */
  def dotTable(v: Column, book: Array[Array[Double]]): Column =
    transform(array(book.map(centLit): _*), p => F.dotd(v, p))

  /** m per-subspace codebooks (each k × d/m), learned independently
    * with [[IvfIndex.learnCentroids]]'s deterministic Lloyd recipe on
    * the sliced subvectors. `emb` must be `(vec_id: long,
    * v: array<double>)` with every vector of length `dim`. */
  def learnCodebooks(emb: DataFrame, dim: Int, m: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    (0 until m).map { j =>
      IvfIndex.learnCentroids(
        emb.select(col("vec_id"), slice(col("v"), j * sub + 1, sub).as("v")),
        k, iters)
    }.toArray
  }

  /** Adds `code_1..code_m` (1-based nearest centroid per subspace,
    * argmax `dot − |c|²/2`, first-max tiebreak) — the stored index
    * columns. Each subspace's scores ride as their own projection so
    * they are computed once per row. */
  def encode(emb: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val sub = books.head.head.length
    books.zipWithIndex.foldLeft(emb) { case (df, (book, j)) =>
      val s = s"__pq_s$j"
      df.withColumn(s,
          IvfIndex.scoresCol(slice(col("v"), j * sub + 1, sub), book))
        .withColumn(s"code_${j + 1}",
          array_position(col(s), array_max(col(s))))
        .drop(s)
    }
  }

  /** Adds `pd_1..pd_m` query-side ADC tables (each an array of k
    * subspace dots) to a probe relation. */
  def probeTables(probe: DataFrame, vCol: String,
      books: Array[Array[Array[Double]]]): DataFrame = {
    val sub = books.head.head.length
    books.zipWithIndex.foldLeft(probe) { case (df, (book, j)) =>
      df.withColumn(s"pd_${j + 1}",
        dotTable(slice(col(vCol), j * sub + 1, sub), book))
    }
  }

  /** The ADC approximate inner product: m table lookups summed, in
    * codebook order (a fixed fold, so the double sum is
    * engine-reproducible). Requires the `pd_j` and `code_j` columns
    * of [[probeTables]] / [[encode]] in scope. */
  def adcDot(m: Int): Column =
    (1 to m)
      .map(j => element_at(col(s"pd_$j"), col(s"code_$j").cast("int")))
      .reduce(_ + _)
}
