package graft

import graft.operators.FuzzyMatch
import org.apache.spark.sql.functions._

/** Deletion-variant blocking contracts: exact recall at distance 1
  * (the construction's whole claim), no false pairs survive the
  * verify, the variant generator is correct, and the candidate join
  * is an equi-join — never a cartesian. */
class FuzzyMatchSpec extends SparkSuite {
  import spark.implicits._

  test("deletionVariants: identity plus every single deletion, distinct") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyMatch.deletionVariants($"s").as("v"))
      .as[Seq[String]].head()
    assert(got.toSet == Set("abc", "bc", "ac", "ab"))
    // repeated chars: deletions collide, variants stay distinct
    val aa = Seq("aab").toDF("s")
      .select(FuzzyMatch.deletionVariants($"s").as("v"))
      .as[Seq[String]].head()
    assert(aa.toSet == Set("aab", "ab", "aa"))
    assert(aa.length == aa.distinct.length)
  }

  test("pairsWithin1 equals brute force on a crafted name set") {
    // substitution, deletion, insertion, distance-2 (must NOT match),
    // identical-name different-key (dist 0 — must match)
    val names = Seq(
      (1L, "martha"), (2L, "marhta"),   // dist 2 via transposition — out
      (3L, "marta"),                    // deletion of 'h' from martha
      (4L, "martha"),                   // identical to 1
      (5L, "xartha"),                   // substitution
      (6L, "completely"), (7L, "different"))
    val df = names.toDF("k", "n")
    val got = FuzzyMatch.pairsWithin1(df, "k", "n")
      .select($"key_a", $"key_b", $"dist")
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
    val brute = for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb
      d = levDist(na, nb) if d <= 1
    } yield (ka, kb, d)
    assert(got == brute.sortBy(p => (p._1, p._2)))
    assert(got.contains((1L, 4L, 0)) && got.contains((1L, 3L, 1)) &&
      got.contains((1L, 5L, 1)) && !got.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("pairsWithin k=2 equals brute force; catches what distance 1 missed") {
    val names = Seq(
      (1L, "martha"), (2L, "marhta"),   // transposition = dist 2 — now IN
      (3L, "marta"), (4L, "martha"), (5L, "xartha"),
      (6L, "mxrthx"),                   // two substitutions from martha
      (7L, "completely"), (8L, "different"))
    val df = names.toDF("k", "n")
    val got = FuzzyMatch.pairsWithin(df, "k", "n", 2)
      .select($"key_a", $"key_b", $"dist")
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
    val brute = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb
      d = levDist(na, nb) if d <= 2
    } yield (ka, kb, d)).sortBy(p => (p._1, p._2))
    assert(got == brute)
    assert(got.contains((1L, 2L, 2)) && got.contains((1L, 6L, 2)))
  }

  test("deletionVariants2 contains all 0/1/2-deletion images") {
    val got = Seq("abcd").toDF("s")
      .select(FuzzyMatch.deletionVariants2($"s").as("v"))
      .as[Seq[String]].head().toSet
    val want = (for {
      s <- Set("abcd")
      i <- 0 to s.length
      s1 = if (i == 0) s else s.patch(i - 1, "", 1)
      j <- 0 to s1.length
    } yield if (j == 0) s1 else s1.patch(j - 1, "", 1))
    assert(got == want)
  }

  test("deletionVariants2Raw: same SET as deletionVariants2 (blocking" +
      " path equivalence), on varied lengths incl. repeats") {
    val inputs = Seq("abcd", "aab", "a", "ab", "aaaa", "xyzzyx",
      "Customer#000000042", "")
    val rows = inputs.toDF("s")
      .select($"s", FuzzyMatch.deletionVariants2($"s").as("d"),
        FuzzyMatch.deletionVariants2Raw($"s").as("r"))
      .as[(String, Seq[String], Seq[String])].collect()
    rows.foreach { case (s, d, r) =>
      assert(r.toSet == d.toSet,
        s"raw neighborhood set diverges for '$s'")
      // and the raw size is the direct index enumeration
      if (s.length >= 2)
        assert(r.size == 1 + s.length + s.length * (s.length - 1) / 2,
          s"raw cardinality wrong for '$s'")
    }
  }

  test("fuzzy_match2 query recovers double-substitution probes") {
    val rows = SparkEntry.queries("fuzzy_match2")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val probeKeys = Tables.documents(spark, sf)
      .filter($"doc_id" % 37 === 5).select($"doc_id")
      .as[Long].collect().toSet
    assert(probeKeys.nonEmpty)
    probeKeys.foreach { k =>
      assert(rows.exists(r => r._1 == -k - 1L && r._2 == k && r._3 == 2L),
        s"double-typo probe for doc $k not recovered")
    }
  }

  test("fuzzy_match query: probes matched, plan is equi-join only") {
    val df = SparkEntry.queries("fuzzy_match")(spark, sf)
    val rows = df.as[(Long, Long, Long)].collect()
    // every planted typo (negated key) matches its original at dist 1
    val probeKeys = Tables.customer(spark, sf)
      .filter($"c_custkey" % 37 === 5).select($"c_custkey")
      .as[Long].collect().toSet
    probeKeys.foreach { k =>
      assert(rows.exists(r => r._1 == -k && r._2 == k && r._3 == 1L),
        s"typo probe for key $k not recovered")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to all-pairs:\n${p.take(1200)}")
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
