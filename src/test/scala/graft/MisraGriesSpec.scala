package graft

import graft.functions.{GraftFunctions, MisraGriesBuffer}
import org.apache.spark.sql.functions._

/** Misra–Gries contracts: the summary never exceeds its capacity,
  * counts only ever undercount, every key above the n/(cap+1)
  * frequency bound survives — including through merges and
  * serialization — and the heavy_hitters composition is EXACT. */
class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  test("buffer: capacity bound, undercount-only, guarantee threshold") {
    val buf = new MisraGriesBuffer(4)
    // adversarial stream: one heavy key interleaved with 40 singletons
    val stream = (0 until 40).flatMap(i => Seq("hot", s"x$i")) ++ Seq("hot")
    stream.foreach(k => buf.add(k))
    assert(buf.total == stream.length)
    assert(buf.counters.size <= 4)
    val est = buf.sorted().toMap
    // hot: true 41 of 81; bound says est >= 41 - 81/5 > 24
    assert(est.contains("hot") && est("hot") <= 41 && est("hot") > 24)
    est.foreach { case (k, c) =>
      assert(c <= stream.count(_ == k), s"$k overcounted")
    }
  }

  test("weighted add keeps the guarantee for heavy weighted arrivals") {
    // cap=1, stream (a,1),(b,1000): b's true weight 1000 > n/2 = 500.5
    // — decrement-without-insert would drop b entirely
    val buf = new MisraGriesBuffer(1)
    buf.add("a", 1L)
    buf.add("b", 1000L)
    val est = buf.sorted().toMap
    assert(est.contains("b"), "heavy weighted arrival lost")
    assert(est("b") <= 1000L && est("b") >= 1000L - 1001L / 2)
    assert(buf.counters.size <= 1 && buf.total == 1001L)
    // undercount-only across a longer weighted stream
    val b2 = new MisraGriesBuffer(3)
    val ws = (0 until 100).map(i => (s"k${i % 7}", (i % 5 + 1).toLong))
    ws.foreach { case (k, w) => b2.add(k, w) }
    val truth = ws.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(b2.counters.size <= 3)
    b2.sorted().foreach { case (k, c) =>
      assert(c <= truth(k), s"$k overcounted: $c > ${truth(k)}")
    }
  }

  test("merge keeps the guarantee; serialize round-trips") {
    val a = new MisraGriesBuffer(8)
    val b = new MisraGriesBuffer(8)
    (0 until 300).foreach(i => a.add(if (i % 3 == 0) "big" else s"a$i"))
    (0 until 300).foreach(i => b.add(if (i % 2 == 0) "big" else s"b$i"))
    val ser = MisraGriesBuffer.deserialize(8, b.serialized())
    assert(ser.total == b.total && ser.sorted().toSeq == b.sorted().toSeq)
    a.mergeFrom(ser)
    assert(a.total == 600)
    assert(a.counters.size <= 8)
    // big: true 250 of 600; bound 600/9 ≈ 67 → est ≥ 183 > 0, present
    val est = a.sorted().toMap
    assert(est.contains("big") && est("big") <= 250 && est("big") >= 183)
  }

  test("aggregate: candidates cover every true frequent key") {
    val words = Seq.fill(500)("the") ++ Seq.fill(300)("of") ++
      (0 until 2000).map(i => s"w$i")
    val df = words.toDF("term")
      .agg(GraftFunctions.misra_gries($"term", 64).as("s"))
      .select($"s.n".as("n"), $"s.items.key".as("keys"))
      .as[(Long, Seq[String])].head()
    assert(df._1 == words.length)
    assert(df._2.length <= 64)
    assert(df._2.contains("the") && df._2.contains("of"))
  }

  test("heavy_hitters query equals the direct exact computation") {
    val got = SparkEntry.queries("heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toSeq
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
    val n = toks.count()
    val want = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 64 >= n)
      .orderBy($"cnt".desc, $"term")
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "threshold too high — nothing qualifies at sf0.001")
  }

  test("source_heavy_terms equals the direct per-source exact computation") {
    val got = SparkEntry.queries("source_heavy_terms")(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    val toks = Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
    val ns = toks.groupBy($"source").agg(count(lit(1)).as("n"))
    val want = toks.groupBy($"source", $"term").agg(count(lit(1)).as("cnt"))
      .join(ns, "source")
      .filter($"cnt" * 64 >= $"n")
      .orderBy($"source", $"cnt".desc, $"term")
      .select($"source", $"term", $"cnt")
      .as[(String, String, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1).distinct.size > 1,
      "fixture should yield heavy terms for multiple sources")
  }

  test("source_heavy_terms plan: grouped MG is object-hash; recount broadcast") {
    // stage 1 (checkpointed at construction, so pinned standalone):
    // one grouped ObjectHashAggregate of MG summaries
    val p1 = Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"source")
      .agg(GraftFunctions.misra_gries($"term", 256).as("s"))
      .queryExecution.executedPlan.toString
    assert(p1.contains("misra_gries") && p1.contains("ObjectHashAggregate"),
      "grouped MG pass must plan object-hash")
    // stage 2: the recount joins only via broadcast — no sort-merge
    val p2 = SparkEntry.queries("source_heavy_terms")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("SortMergeJoin"),
      s"candidate recount shuffled through a sort-merge join:\n${p2.take(1200)}")
  }

  test("misra_gries aggregates a STREAM: windowed summaries match batch") {
    // the trending-terms shape: MG summaries per event-time window
    // over an unbounded stream — TypedImperativeAggregate buffers
    // must serialize through the state store and merge across
    // micro-batches
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (0 until 600).map { i =>
      (new java.sql.Timestamp(60000L * (i / 200)),
        if (i % 3 == 0) "hot" else s"w${i % 40}")
    }
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = input.toDF().toDF("ts", "term")
      .groupBy(window($"ts", "1 minute").as("w"))
      .agg(GraftFunctions.misra_gries($"term", 16).as("s"))
      .select($"w.start".as("start"), $"s.n".as("n"),
        $"s.items.key".as("keys"))
      .writeStream.format("memory").queryName("s_mg")
      .outputMode("complete").start()
    try {
      rows.grouped(150).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("s_mg")
      .as[(java.sql.Timestamp, Long, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3.toSet))).toMap
    val batch = rows.toDF("ts", "term")
      .groupBy(window($"ts", "1 minute").as("w"))
      .agg(GraftFunctions.misra_gries($"term", 16).as("s"))
      .select($"w.start".as("start"), $"s.n".as("n"),
        $"s.items.key".as("keys"))
      .as[(java.sql.Timestamp, Long, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3.toSet))).toMap
    assert(streamed.keySet == batch.keySet && streamed.nonEmpty)
    // exact totals always agree; candidate sets both contain the
    // guaranteed-frequent key (merge order may vary the margins)
    streamed.foreach { case (w, (n, keys)) =>
      assert(n == batch(w)._1, s"window $w total")
      assert(keys.contains("hot") && batch(w)._2.contains("hot"))
    }
  }

  test("heavy_hitters plans: MG pass is object-hash; confirm is broadcast") {
    // stage 1 (runs at construction, checkpointed): one
    // ObjectHashAggregate of MG summaries — partial per partition,
    // merged once; the raw vocabulary never shuffles
    val p1 = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .agg(GraftFunctions.misra_gries($"term", 256).as("s"))
      .queryExecution.executedPlan.toString
    assert(p1.contains("misra_gries"), "MG aggregate missing")
    assert(p1.contains("ObjectHashAggregate"), "MG should plan object-hash")
    // stage 2: the recount joins via broadcast only — no sort-merge
    val p2 = SparkEntry.queries("heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("SortMergeJoin"),
      s"candidate confirm shuffled:\n${p2.take(1200)}")
  }
}
