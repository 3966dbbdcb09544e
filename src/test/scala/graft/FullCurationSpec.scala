package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed full_curation chain must fire EVERY stage on the
  * engineered probes and keep each stage's standalone contract intact
  * through composition — the end-to-end guarantee behind the
  * `full_curation` oracle row. */
class FullCurationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val st = graft.queries.Pipeline.fullCurationStages(spark, sf)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("exact dedup keeps the smaller-id twin, drops the larger") {
    val after = ids(st.afterExact)
    assert(after.contains(-62L) && !after.contains(-61L))
  }

  test("near-dup closure drops the non-canonical train twin") {
    assert(ids(st.dupes).contains(-54L))
    val surv = ids(st.survivors)
    assert(surv.contains(-60L) && !surv.contains(-54L))
  }

  test("decontamination drops the train member of a cross-split pair") {
    assert(ids(st.contaminated).contains(-48L))
    val surv = ids(st.survivors)
    assert(!surv.contains(-48L))
    assert(!surv.contains(-43L), "eval docs never enter the train pipeline")
  }

  test("line dedup strips the shared line; the gate drops the emptied doc") {
    val gated = st.gated.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    assert(!gated.contains(-66L), "all-boilerplate doc must be gated out")
    assert(gated.contains(-68L) && gated.contains(-67L))
    assert(!gated(-68L).contains("subscribe to the probe newsletter"))
    assert(!gated(-67L).contains("subscribe to the probe newsletter"))
  }

  test("PII is redacted before scoring and chunking") {
    val t = st.gated.filter($"doc_id" === -42L)
      .select($"text").as[String].head()
    assert(t.contains("[EMAIL]") && t.contains("[IP]") && t.contains("[PHONE]"))
    assert(!t.contains("@") && !t.contains("10.1.2.3"))
  }

  test("budget selection equals the greedy scan over the gated docs") {
    val g = st.gated.select($"doc_id", $"quality", $"n_tokens")
      .as[(Long, Double, Long)].collect()
    val sel = ids(st.selected)
    val budget = g.map(_._3).sum * 2 / 5
    var acc = 0L
    val want = g.sortBy(r => (-r._2, r._1))
      .takeWhile { r => acc += r._3; acc <= budget }.map(_._1).toSet
    assert(sel == want)
    assert(g.filter(r => sel.contains(r._1)).map(_._3).sum <= budget)
  }

  test("composition adds no scale-hostile plan shape") {
    // the composed plan must keep each stage's standalone exchange
    // profile: no one-task global stage (BudgetSelect's contract), no
    // cartesian product (the LSH pass generates candidates by bucket,
    // never all-pairs), and no shuffle keyed on raw text (dedup
    // shuffles ride the 128-bit fingerprints)
    val plan = st.packed.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"one-task stage leaked into the composed plan:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in the composed plan:\n${plan.take(3000)}")
    assert(!"hashpartitioning\\(text".r.findFirstIn(plan).isDefined,
      "a shuffle keyed on raw text leaked into the composed plan")
  }

  test("packed output is non-empty and bounded by budget + last chunk") {
    val rows = st.packed.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= 64 + 16,
        s"sequence exceeds the bounded-overflow contract: $r")
    }
  }

  test("curation_funnel is monotone and lands on the stage frames") {
    import spark.implicits._
    val funnel = SparkEntry.queries("curation_funnel")(spark, sf)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(funnel.map(_._2).toSeq == Seq("input", "after_exact_dedup",
      "train_survivors", "quality_gated", "budget_selected",
      "packed_sequences"))
    // doc-stage counts shrink monotonically (stages only remove rows)
    val docStages = funnel.take(5).map(_._3)
    docStages.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"funnel grew: $docStages")
    }
    assert(funnel(2)._3 == st.survivors.count())
    assert(funnel.last._3 == st.packed.count())
  }
}
