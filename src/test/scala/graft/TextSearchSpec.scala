package graft

/** The text-search family: the BM25 ranking must behave like BM25
  * (dense ranks, monotone scores, hits actually contain query terms)
  * and the n-gram count table must equal a brute-force recount. */
class TextSearchSpec extends SparkSuite {
  import spark.implicits._

  test("bm25_search: dense ranks, non-increasing scores, positive") {
    val rows = SparkEntry.queries("bm25_search")(spark, sf)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"ranks for query $q not dense: ${sorted.map(_._2).toSeq}")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"scores for query $q not non-increasing")
      assert(rs.forall(_._4 > 0.0), s"non-positive BM25 score in query $q")
    }
  }

  test("bm25_search: every hit contains at least one of its query's terms") {
    val terms = Map(
      0L -> Set("hash", "join"),
      1L -> Set("scan", "filter", "vector"),
      2L -> Set("customer", "merge", "slow"))
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    SparkEntry.queries("bm25_search")(spark, sf)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
      .foreach { case (q, d) =>
        val toks = texts(d).split(" ").toSet
        assert(toks.intersect(terms(q)).nonEmpty,
          s"doc $d ranked for query $q but contains none of ${terms(q)}")
      }
  }

  test("plan shapes: bm25 broadcasts the query terms; ngram top-k bounded") {
    val bm = SparkEntry.queries("bm25_search")(spark, sf)
      .queryExecution.executedPlan.toString
    // the token→query-term semi-join must be a broadcast hash join so
    // non-matching tokens die map-side, BEFORE the tf shuffle
    assert(bm.contains("BroadcastHashJoin"),
      s"query-term filter not broadcast:\n${bm.take(1500)}")
    val ng = SparkEntry.queries("ngram_counts")(spark, sf)
      .queryExecution.executedPlan.toString
    // the bounded top-k must plan as TakeOrderedAndProject (per-
    // partition partial top-k, never a global sort of the gram table)
    assert(ng.contains("TakeOrderedAndProject"),
      s"top-k not bounded:\n${ng.take(1500)}")
  }

  test("ngram_counts equals a brute-force recount; threshold holds") {
    val got = SparkEntry.queries("ngram_counts")(spark, sf)
      .as[(String, Long)].collect()
    assert(got.forall(_._2 >= 3L))
    // full brute-force table over the spec-scale fixture
    val brute = Tables.documents(spark, sf).select($"text").as[String]
      .collect()
      .flatMap(_.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= 3L)
    val expected = brute.toSeq.sortBy { case (g, c) => (-c, g) }.take(100)
    assert(got.toSeq == expected,
      s"count-table mismatch: got ${got.take(5).toSeq} vs ${expected.take(5)}")
  }
}
