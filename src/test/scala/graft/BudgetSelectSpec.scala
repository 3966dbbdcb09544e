package graft

import graft.operators.BudgetSelect
import org.apache.spark.sql.functions._

/** Budgeted greedy selection must equal the sequential
  * (score DESC, id ASC) scan for every budget, including zero-cost
  * rows, ties that span partitions, exact fits, and the all-fits
  * fast path — while never planning the global-window spelling. */
class BudgetSelectSpec extends SparkSuite {
  import spark.implicits._

  /** The sequential-scan oracle: strict prefix under the budget. */
  private def greedy(rows: Seq[(Long, Double, Long)], b: Long): Set[Long] = {
    var acc = 0L
    rows.sortBy(r => (-r._2, r._1))
      .takeWhile { r => acc += r._3; acc <= b }
      .map(_._1).toSet
  }

  private def run(rows: Seq[(Long, Double, Long)], b: Long): Set[Long] =
    BudgetSelect.select(rows.toDF("id", "score", "v"), "id", "score", "v", b)
      .select($"id").as[Long].collect().toSet

  test("matches the sequential greedy scan across budgets and tie shapes") {
    val rnd = new scala.util.Random(11)
    // coarse score grid (heavy ties) + zero-cost rows
    val rows = (0L until 400L).map { i =>
      (i, Seq(0.0, 0.25, 0.5, 0.75, 1.0)(rnd.nextInt(5)),
        rnd.nextInt(21).toLong)
    }
    val total = rows.map(_._3).sum
    // an exact-fit budget: the cumulative sum right at a row boundary
    var acc = 0L
    val cums = rows.sortBy(r => (-r._2, r._1)).map { r => acc += r._3; acc }
    val exactFit = cums(137)
    for (b <- Seq(0L, 7L, exactFit, total / 3, total, total + 100)) {
      assert(run(rows, b) == greedy(rows, b), s"budget $b")
    }
  }

  test("selectFraction equals select with the integer-fraction budget") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 300L).map(i =>
      (i, (rnd.nextInt(9) * 0.125), rnd.nextInt(15).toLong))
    val total = rows.map(_._3).sum
    val viaFraction = BudgetSelect.selectFraction(
        rows.toDF("id", "score", "v"), "id", "score", "v", 2, 5)
      .select($"id").as[Long].collect().toSet
    assert(viaFraction == run(rows, total * 2 / 5))
    assert(viaFraction == greedy(rows, total * 2 / 5))
    // huge num/den that would wrap total * num in Long arithmetic:
    // (1<<40)/(1<<41) is exactly 1/2 and must behave like it
    val half = BudgetSelect.selectFraction(
        rows.toDF("id", "score", "v"), "id", "score", "v", 1L << 40, 1L << 41)
      .select($"id").as[Long].collect().toSet
    assert(half == greedy(rows, total / 2), "fraction arithmetic overflowed")
  }

  test("all-fits fast path returns every non-null-scored row") {
    val rows = Seq((1L, 0.5, 10L), (2L, 0.25, 5L), (3L, 1.0, 1L))
    assert(run(rows, 16L) == Set(1L, 2L, 3L))
  }

  test("null scores are never selected") {
    val df = Seq((1L, Some(1.0), 5L), (2L, None, 5L), (3L, Some(0.5), 5L))
      .toDF("id", "score", "v")
    val got = BudgetSelect.select(df, "id", "score", "v", 100L)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("boundary prefix is exact when the tie stratum spans partitions") {
    // one giant boundary stratum, ids interleaved, 4 shuffle partitions
    val rows = (0L until 1000L).map(i => (i, 0.5, 3L)) :+ (2000L, 1.0, 10L)
    // budget: the 1.0 row + first 123 boundary rows + 1 spare (< next row)
    val b = 10L + 123 * 3 + 1
    val got = run(rows, b)
    assert(got == ((0L until 123L).toSet + 2000L))
  }

  test("stratified selection equals the per-stratum greedy scan") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 500L).map { i =>
      (i, Seq("en", "es", "de", "fr")(rnd.nextInt(4)),
        Seq(0.0, 0.25, 0.5, 0.75, 1.0)(rnd.nextInt(5)),
        rnd.nextInt(21).toLong)
    }
    val got = BudgetSelect.selectFractionPerStratum(
        rows.toDF("id", "g", "score", "v"), "g", "id", "score", "v", 2, 5)
      .select($"id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).valuesIterator.flatMap { grp =>
      val budget = grp.map(_._4).sum * 2 / 5
      var acc = 0L
      grp.sortBy(r => (-r._3, r._1))
        .takeWhile { r => acc += r._4; acc <= budget }.map(_._1)
    }.toSet
    assert(got == want)
    // per-stratum budgets hold individually
    val byG = rows.filter(r => got.contains(r._1)).groupBy(_._2)
    byG.foreach { case (g, sel) =>
      val budget = rows.filter(_._2 == g).map(_._4).sum * 2 / 5
      assert(sel.map(_._4).sum <= budget, s"stratum $g over budget")
    }
  }

  test("stratified: null strata and null scores are never selected; plan clean") {
    val df = Seq(
      (1L, Some("en"), Some(1.0), 5L), (2L, None, Some(1.0), 5L),
      (3L, Some("en"), None, 5L), (4L, Some("en"), Some(0.5), 5L)
    ).toDF("id", "g", "score", "v")
    val sel = BudgetSelect.selectFractionPerStratum(
      df, "g", "id", "score", "v", 1, 1)
    assert(sel.select($"id").as[Long].collect().toSet == Set(1L, 4L))
    val plan = sel.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"one-task stage leaked:\n${plan.take(2000)}")
  }

  test("null values cost 0 and an all-null-value stratum does not NPE") {
    // stratum 0.5 has ONLY null values (sums to 0, admitted for free);
    // null-valued rows elsewhere are admitted without consuming budget
    val df = Seq(
      (1L, 1.0, Some(5L)), (2L, 1.0, None),
      (3L, 0.5, None), (4L, 0.5, None),
      (5L, 0.25, Some(100L))
    ).toDF("id", "score", "v")
    val got = BudgetSelect.select(df, "id", "score", "v", 5L)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("a continuous score column fails fast instead of collecting the corpus") {
    val n = BudgetSelect.MaxStrata + 1
    val df = spark.range(n.toLong)
      .select($"id", ($"id" / lit(n.toDouble)).as("score"), lit(1L).as("v"))
    val e = intercept[IllegalArgumentException] {
      BudgetSelect.select(df, "id", "score", "v", 10L)
    }
    assert(e.getMessage.contains("quantized"), e.getMessage)
  }

  test("the plan never contains a partition-less global window") {
    val rows = (0L until 100L).map(i => (i, (i % 4) * 0.25, 2L))
    val df = BudgetSelect.select(
      rows.toDF("id", "score", "v"), "id", "score", "v", 60L)
    // a global ordered window plans as Window with an Exchange
    // SinglePartition below it; the operator must never produce one
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage leaked into the plan:\n$plan")
  }
}
