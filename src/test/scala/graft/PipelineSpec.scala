package graft

import graft.queries.Pipeline
import org.apache.spark.sql.functions._

/** Property tests for the non-SQL-expressible pipeline operators
  * (SimHash, LSH ANN) and an independent in-Spark ground-truth check
  * for the MinHash/LSH near-dedup (its DuckDB oracle runs at sf0.01;
  * this pins the same result against a brute-force all-pairs Jaccard
  * computed by Spark itself). */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("minhash_neardup equals brute-force all-pairs Jaccard at sf0.001") {
    val lsh = Pipeline.queries("minhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val t = split($"text", " ")
    val sh = Tables.documents(spark, sf).select($"doc_id",
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))).as("s"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s")))).as("j"))
      .filter($"j" >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == brute, s"LSH ${lsh.size} pairs vs brute ${brute.size}")
  }

  test("simhash separates near-dups from random pairs by Hamming distance") {
    val fps = Pipeline.noOracleQueries("simhash_fingerprint")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupPairs = Pipeline.queries("minhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.nonEmpty)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupDist = dupPairs.map { case (a, b) => hamming(fps(a), fps(b)) }
    val ids = fps.keys.toArray.sorted
    val randDist = ids.take(40).flatMap(a => ids.takeRight(40).map(b =>
      hamming(fps(a), fps(b))))
    val dupAvg = dupDist.sum.toDouble / dupDist.length
    val randAvg = randDist.sum.toDouble / randDist.length
    assert(dupAvg < 8, s"near-dup avg Hamming $dupAvg should be small")
    assert(randAvg > 16, s"random avg Hamming $randAvg should be large")
  }

  test("ann_lsh returns at most k same-bucket neighbors per probe, ranked") {
    val rows = Pipeline.noOracleQueries("ann_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val rns = rs.map(_.getLong(1)).sorted
      assert(rns.sameElements(1L to rns.length), "ranks must be 1..n")
      // scores are non-increasing in rank
      val byRn = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(byRn.zip(byRn.tail).forall { case (x, y) => x >= y })
    }
  }

  test("exact_dedup 128-bit fingerprint keeps all distinct docs") {
    val n = Tables.documents(spark, sf).select($"text").distinct().count()
    assert(Pipeline.queries("exact_dedup")(spark, sf).count() == n)
  }
}
