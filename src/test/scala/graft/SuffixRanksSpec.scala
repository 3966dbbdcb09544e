package graft

/** Parity pin for the L99 suffix-ranking machinery: the distributed
  * prefix-doubling + SA-adjacency + rank-descent result must equal a
  * SEQUENTIAL brute-force suffix scan (all matching position pairs,
  * forward extension, per-position max, interval union) computed in
  * plain Scala — an implementation with nothing in common with the
  * Spark one. Plus the planted-copy pins: each probe doc carries one
  * verbatim slice (5 or 13 tokens) under unique markers, so its run
  * set is exactly one run of that length starting at position 1. */
class SuffixRanksSpec extends SparkSuite {
  import spark.implicits._

  test("dup_substring_runs equals the sequential brute-force scan; " +
      "planted 5- and 13-token copies are exact maximal runs") {
    val minLen = 4
    val base = Tables.documents(spark, sf)
      .filter($"doc_id" % 7 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    def probes(mod: Int, off: Long, mark: String, from: Int, len: Int,
        minToks: Int): Seq[(Long, String)] =
      base.filter { case (id, t) =>
        id % mod == 0 && t.split(" ").length >= minToks
      }.map { case (id, t) =>
        val ws = t.split(" ")
        (id + off, s"$mark$id " +
          ws.slice(from - 1, from - 1 + len).mkString(" ") +
          s" ${mark}z$id")
      }
    val p5 = probes(21, 70000000L, "pa", 6, 5, 10)
    val p13 = probes(35, 80000000L, "pb", 3, 13, 15)
    val docs = base ++ p5 ++ p13
    val toks: Map[Long, Array[String]] =
      docs.map { case (id, t) => id -> t.split(" ") }.toMap

    // brute dup_len: for every pair of positions with equal tokens,
    // extend forward while equal; per position keep the max
    val byTok = (for ((id, ws) <- toks.toSeq; p <- ws.indices)
      yield (ws(p), id, p)).groupBy(_._1)
    val dupLen = collection.mutable.Map.empty[(Long, Int), Int]
      .withDefaultValue(0)
    for ((_, occ) <- byTok; Seq(a, b) <- occ.combinations(2)) {
      val (wa, wb) = (toks(a._2), toks(b._2))
      var l = 0
      while (a._3 + l < wa.length && b._3 + l < wb.length &&
        wa(a._3 + l) == wb(b._3 + l)) l += 1
      val ka = (a._2, a._3); val kb = (b._2, b._3)
      if (l > dupLen(ka)) dupLen(ka) = l
      if (l > dupLen(kb)) dupLen(kb) = l
    }
    // interval union per doc at the threshold
    val want = dupLen.toSeq.collect {
      case ((id, p), l) if l >= minLen => (id, p.toLong, p + l.toLong)
    }.groupBy(_._1).flatMap { case (id, ivs) =>
      val sorted = ivs.sortBy(_._2)
      val runs = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((_, s, e) <- sorted) {
        if (runs.nonEmpty && s <= runs.last._2)
          runs(runs.size - 1) = (runs.last._1, math.max(runs.last._2, e))
        else runs += ((s, e))
      }
      runs.map { case (s, e) => (id, s, e - 1, e - s) }
    }.toSet

    val got = SparkEntry.queries("dup_substring_runs")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"spark-only=${(got diff want).take(5)} " +
        s"brute-only=${(want diff got).take(5)}")

    // planted pins: one exact maximal run per probe doc — the copy
    // slice under the unique markers, at sub-window granularity for
    // the 5-token class
    for ((ps, len) <- Seq((p5, 5L), (p13, 13L)); (id, _) <- ps) {
      val runs = got.filter(_._1 == id)
      assert(runs == Set((id, 1L, len, len)),
        s"probe $id: expected one [1, $len] run, got $runs")
    }
    assert(p5.nonEmpty && p13.nonEmpty, "fixture must yield probes")

    // the per-source roll-up (L100) conserves the run mass: summing
    // dup_tokens over sources equals summing run_len over REAL docs
    // (probe ids join to no source and stay out of the stats)
    val stats = SparkEntry.queries("dup_region_stats")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    val realRunMass = got.toSeq.filter(_._1 < 70000000L).map(_._4).sum
    assert(stats.map(_._5).sum == realRunMass,
      s"per-source dup_tokens ${stats.map(_._5).sum} != run mass " +
        s"$realRunMass")
    assert(stats.exists(_._3 > 0), "planted copies must surface in " +
      "at least one source's n_docs_with_dup")

    // the surgery (L101) conserves tokens and removes EXACTLY the
    // run mass: kept + removed == n_tokens per doc, removed == the
    // doc's summed run_len, and a doc that donated a 13-token copy
    // no longer contains the copied slice
    val surg = SparkEntry.queries("dedup_surgery")(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(surg.forall(r => r._3 + r._4 == r._2))
    val runMassByDoc = got.toSeq.filter(_._1 < 70000000L)
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._4).sum }
    assert(surg.forall(r =>
      r._4 == runMassByDoc.getOrElse(r._1, 0L)),
      "removed_tokens must equal the doc's duplicated-region mass")
    for ((pid, _) <- p13) {
      val donor = pid - 80000000L
      val slice = toks(donor).slice(2, 15).mkString(" ")
      val keptText = surg.find(_._1 == donor).get._5
      assert(!keptText.contains(slice),
        s"donor $donor still contains its copied 13-token slice")
    }
  }
}
