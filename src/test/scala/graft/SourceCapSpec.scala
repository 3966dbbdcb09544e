package graft

import graft.operators.SourceCap
import org.apache.spark.sql.functions._

/** Per-source caps must equal the sequential per-source scan, stay
  * deterministic under repartitioning, and plan with the scale-safe
  * shapes (WindowGroupLimit for the doc cap; no SinglePartition and
  * no per-source single-task sort for the token cap). */
class SourceCapSpec extends SparkSuite {
  import spark.implicits._

  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, s"src${rnd.nextInt(5)}", rnd.nextInt(30).toLong)
    }
  }

  /** In-memory oracle: per-source strict prefix under the budget. */
  private def greedyTokens(rows: Seq[(Long, String, Long)],
      b: Long): Set[Long] =
    rows.groupBy(_._2).valuesIterator.flatMap { grp =>
      var acc = 0L
      grp.sortBy(_._1).takeWhile { r => acc += r._3; acc <= b }.map(_._1)
    }.toSet

  test("capDocs keeps the first maxDocs per source, exactly") {
    val rows = fixture(300, 1)
    val got = SourceCap.capDocs(rows.toDF("doc_id", "source", "v"),
        "source", "doc_id", maxDocs = 7)
      .select($"doc_id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).valuesIterator
      .flatMap(_.sortBy(_._1).take(7).map(_._1)).toSet
    assert(got == want)
  }

  test("capDocs plans as WindowGroupLimit (map-side partial limits)") {
    val df = SourceCap.capDocs(
      fixture(100, 2).toDF("doc_id", "source", "v"),
      "source", "doc_id", maxDocs = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"doc cap must plan map-side partial limits:\n${plan.take(2000)}")
  }

  test("capTokens equals the per-source greedy scan across budgets") {
    val rows = fixture(400, 3)
    for (b <- Seq(0L, 17L, 100L, 10000L)) {
      val got = SourceCap.capTokens(rows.toDF("doc_id", "source", "v"),
          "source", "doc_id", "v", budget = b)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == greedyTokens(rows, b), s"budget $b")
    }
  }

  test("capTokens is partitioning-invariant and handles null costs") {
    val rows = fixture(200, 4)
    val base = rows.toDF("doc_id", "source", "v")
    val shuffled = base.repartition(13, $"v")
    def ids(df: org.apache.spark.sql.DataFrame) =
      SourceCap.capTokens(df, "source", "doc_id", "v", 50L)
        .select($"doc_id").as[Long].collect().toSet
    assert(ids(base) == ids(shuffled))
    // null costs read as 0: admitted for free when the scan reaches them
    val withNull = Seq((1L, "s", Some(10L)), (2L, "s", None),
      (3L, "s", Some(10L))).toDF("doc_id", "source", "v")
    val got = SourceCap.capTokens(withNull, "source", "doc_id", "v", 15L)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("capTokens plan: no SinglePartition, no per-source one-task sort") {
    val df = SourceCap.capTokens(
      fixture(100, 5).toDF("doc_id", "source", "v"),
      "source", "doc_id", "v", 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"one-task stage leaked:\n${plan.take(2000)}")
    // the corpus-side window partitions by (source, __psPid) — a
    // window keyed by source alone would re-serialize each source in
    // one task
    assert(plan.contains("__psPid"),
      s"offset two-phase missing from the plan:\n${plan.take(2000)}")
  }
}
