package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Pins [[graft.operators.IntervalJoin]] to the brute-force overlap
  * predicate: the binned equi-join + first-shared-bin rule must emit
  * exactly the overlapping pairs, each exactly once, at every bin
  * width — and plan as a shuffled equi-join, never an NLJ. */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def brute(l: Seq[(Long, Long, Long)],
      r: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (lid, ls, le) <- l if le >= ls && ls >= 0
      (rid, rs, re) <- r if re >= rs && rs >= 0
      if ls <= re && rs <= le
    } yield (lid, rid)).toSet

  private def viaOp(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
      width: Long): Seq[(Long, Long)] =
    IntervalJoin.overlapJoin(
        l.toDF("lid", "ls", "le"), "ls", "le",
        r.toDF("rid", "rs", "re"), "rs", "re", width)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq

  test("random intervals equal brute force at several widths, no dups") {
    val rnd = new scala.util.Random(11)
    def mk(n: Int) = Seq.fill(n) {
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(100000).toLong, s, s + rnd.nextInt(80))
    }
    val l = mk(120); val r = mk(150)
    val want = brute(l, r)
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = viaOp(l, r, w)
      assert(got.size == got.toSet.size, s"width=$w emitted a pair twice")
      assert(got.toSet == want, s"width=$w")
    }
  }

  test("touching endpoints overlap (closed intervals); disjoint do not") {
    val got = viaOp(
      Seq((1L, 0L, 10L), (2L, 20L, 30L)),
      Seq((7L, 10L, 15L), (8L, 31L, 40L)), 7L).toSet
    assert(got == Set((1L, 7L))) // [0,10] touches [10,15]; [20,30] misses [31,40]
  }

  test("empty and negative intervals are dropped") {
    val got = viaOp(
      Seq((1L, 5L, 3L), (2L, -4L, 100L), (3L, 0L, 100L)),
      Seq((7L, 0L, 50L)), 10L).toSet
    assert(got == Set((3L, 7L)))
  }

  test("spanning intervals: a pair sharing many bins still emits once") {
    val l = Seq((1L, 0L, 1000L))
    val r = Seq((7L, 500L, 505L), (8L, 0L, 1000L))
    for (w <- Seq(3L, 10L, 100L)) {
      val got = viaOp(l, r, w)
      assert(got.sorted == Seq((1L, 7L), (1L, 8L)), s"width=$w")
    }
  }

  test("planted hot bin: every interval in one bin stays correct") {
    // the adversarial shape for the binned join — all intervals share
    // one bin (a single hot equi-join key); output must still be the
    // exact overlap set, each pair once (AQE may split the key at
    // scale, the first-shared-bin rule holds under any split)
    val rnd = new scala.util.Random(17)
    val l = Seq.tabulate(60)(i =>
      (i.toLong, rnd.nextInt(50).toLong, (rnd.nextInt(50) + 50).toLong))
    val r = Seq.tabulate(80)(i =>
      ((1000 + i).toLong, rnd.nextInt(50).toLong, (rnd.nextInt(50) + 50).toLong))
    val got = viaOp(l, r, 1000000L) // one bin holds everything
    assert(got.size == got.toSet.size)
    assert(got.toSet == brute(l, r))
  }

  test("overlapCounts groups per left row") {
    val l = Seq((1L, 0L, 10L), (2L, 100L, 110L)).toDF("lid", "ls", "le")
    val r = Seq((7L, 5L, 6L), (8L, 9L, 20L), (9L, 500L, 600L))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapCounts(l, Seq("lid"), "ls", "le",
        r, "rs", "re", 50L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(1L -> 2L)) // row 2 overlaps nothing -> absent
  }

  test("plan: shuffled equi-join on the bin key, never an NLJ/cartesian") {
    val l = spark.range(200).select($"id".as("lid"),
      ($"id" * 5).as("ls"), ($"id" * 5 + 20).as("le"))
    val r = spark.range(200).select(($"id" + 10000).as("rid"),
      ($"id" * 7).as("rs"), ($"id" * 7 + 15).as("re"))
    val df = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", 16L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      s"expected an equi-join, got:\n$plan")
  }

  test("column-name clash fails fast") {
    val l = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    val r = Seq((2L, 0L, 1L)).toDF("id", "s2", "e2")
    intercept[IllegalArgumentException](
      IntervalJoin.overlapJoin(l, "s", "e", r, "s2", "e2", 10L))
    intercept[IllegalArgumentException](
      IntervalJoin.overlapJoin(l.withColumnRenamed("id", "lid"), "s", "e",
        r, "s2", "e2", 0L))
  }

  test("an extreme-span row fails the job loudly, never explodes unbounded") {
    // one sentinel row (end = 10^12 at width 10 → 10^11 bins) must
    // fail with the replication-cap message, not OOM the task or trip
    // sequence()'s element limit
    val l = Seq((1L, 0L, 1000000000000L)).toDF("lid", "s", "e")
    val r = Seq((2L, 0L, 5L)).toDF("rid", "s2", "e2")
    val ex = intercept[Throwable] {
      IntervalJoin.overlapJoin(l, "s", "e", r, "s2", "e2", 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("spans more than")),
      s"wrong failure: $ex")
    // a generous explicit cap admits the same row
    val wide = IntervalJoin.overlapJoin(l, "s", "e", r, "s2", "e2",
      1000000000L, maxBinsPerRow = 8192L)
    assert(wide.count() == 1L)
  }
}
