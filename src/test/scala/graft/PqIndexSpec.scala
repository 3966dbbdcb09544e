package graft

import graft.operators.PqIndex
import org.apache.spark.sql.functions._

/** Pins [[graft.operators.PqIndex]]: code ranges/shapes, determinism,
  * ADC ≈ reconstructed dot, and a recall floor of the ADC ranking vs
  * the exact scan on the fixture embeddings. */
class PqIndexSpec extends SparkSuite {
  import spark.implicits._

  private val M = 8
  private val K = 16
  private val Dim = 64

  private lazy val emb = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding".cast("array<double>").as("v"))

  private lazy val books = PqIndex.learnCodebooks(emb, Dim, M, K, 2)

  test("codebook shapes and learned-codebook determinism") {
    assert(books.length == M)
    books.foreach { b =>
      assert(b.length == K)
      b.foreach(c => assert(c.length == Dim / M))
    }
    val again = PqIndex.learnCodebooks(emb, Dim, M, K, 2)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq ==
      again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes are 1..k, one per subspace, shuffle-free encode") {
    val enc = PqIndex.encode(emb, books)
    val codeCols = (1 to M).map(j => col(s"code_$j"))
    val stats = enc.select(
      codeCols.map(c => min(c)).reduce(least(_, _)).as("mn"),
      codeCols.map(c => max(c)).reduce(greatest(_, _)).as("mx")).first()
    assert(stats.getLong(0) >= 1L && stats.getLong(1) <= K)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }

  test("ADC equals the dot against the reconstructed vector (~1e-9)") {
    val enc = PqIndex.encode(emb, books).limit(50).collect()
    enc.foreach { r =>
      val v = r.getSeq[Double](r.fieldIndex("v")).toArray
      val codes = (1 to M).map(j => r.getLong(r.fieldIndex(s"code_$j")).toInt)
      val recon = codes.zipWithIndex.flatMap { case (c, j) => books(j)(c - 1) }
      val full = v.zip(recon).map { case (a, b) => a * b }.sum
      val adc = codes.zipWithIndex.map { case (c, j) =>
        val sub = v.slice(j * Dim / M, (j + 1) * Dim / M)
        sub.zip(books(j)(c - 1)).map { case (a, b) => a * b }.sum
      }.sum
      assert(math.abs(full - adc) < 1e-9)
    }
  }

  test("ADC top-5 recall vs the exact dot scan clears the floor") {
    val vs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val enc = PqIndex.encode(emb, books).collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        (1 to M).map(j => r.getLong(r.fieldIndex(s"code_$j")).toInt)).toMap
    val probes = vs.keys.filter(_ < 20)
    val recalls = probes.toSeq.map { p =>
      val q = vs(p)
      val exact = (vs - p).toSeq
        .sortBy { case (id, v) => (-dot(q, v), id) }.take(5).map(_._1).toSet
      val adcTop = (enc - p).toSeq.map { case (id, codes) =>
        val a = codes.zipWithIndex.map { case (c, j) =>
          dot(q.slice(j * Dim / M, (j + 1) * Dim / M), books(j)(c - 1))
        }.sum
        (id, a)
      }.sortBy { case (id, a) => (-a, id) }.take(5).map(_._1).toSet
      exact.intersect(adcTop).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    // The fixture embeddings are geometrically near-random (mild label
    // clusters), where m·log2(k)-bit PQ inner-product ranking has
    // inherently modest absolute recall — the meaningful pin is the
    // gap to chance: random top-5 recall is 5/(n-1) ≈ 0.01 here, and
    // the ADC ranking must sit an order of magnitude above it
    // (measured ~0.2 with m=8, k=16).
    val random = 5.0 / (vs.size - 1)
    assert(mean >= 0.1 && mean >= 10 * random,
      s"mean ADC recall@5 $mean below floor (random baseline $random, " +
        s"k=$K codes on ${vs.size} vecs)")
  }

  test("ivfpq_ann: the IVF prune only removes candidates (vs pq_ann)") {
    // Same ADC scores, smaller candidate set: every IVF-PQ neighbor
    // must appear in the unpruned PQ ranking with the same score, at
    // the same or better (numerically equal-or-lower-rank) position
    // is NOT guaranteed — but score equality per (probe, neighbor) is.
    val pq = graft.queries.Pipeline.queries("pq_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivfpq = graft.queries.Pipeline.queries("ivfpq_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(ivfpq.nonEmpty)
    // the pruned top-5 can surface pairs outside the unpruned top-5;
    // check score agreement on the overlap, which must be substantial
    val overlap = ivfpq.filter { case (p, n, _) => pq.contains((p, n)) }
    assert(overlap.size >= ivfpq.length / 2,
      s"only ${overlap.size}/${ivfpq.length} IVF-PQ pairs in PQ top-5")
    overlap.foreach { case (p, n, adc) =>
      assert(pq((p, n)) == adc, s"ADC drift for ($p, $n)")
    }
  }
}
