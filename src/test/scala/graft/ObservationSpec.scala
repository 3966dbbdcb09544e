package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** U6: in-flight audit metrics — `Dataset.observe` attaches
  * aggregates to a plan that are collected AS A SIDE EFFECT of
  * whatever action runs it (a write, a count), so a 100 TB curation
  * job reports its row/token accounting without a second scan. The
  * funnel queries recompute counts as oracle-checkable relations;
  * observe is the zero-extra-pass production spelling of the same
  * numbers — this spec pins that the two agree. */
class ObservationSpec extends SparkSuite {
  import spark.implicits._

  test("observed metrics equal a separate aggregation, in one pass") {
    val obs = Observation("gate_metrics")
    val docs = Tables.documents(spark, sf)
    val gated = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum($"n_tokens").as("tokens_in"),
        sum(when($"n_tokens" >= 20, 1L).otherwise(0L)).as("rows_kept"))
      .filter($"n_tokens" >= 20)
    // the action that "pays" for the metrics — a real job would write
    val kept = gated.count()
    val m = obs.get
    assert(m("rows_kept") == kept,
      "observed keep-count must equal the action's own count")
    val direct = docs
      .select(size(split($"text", " ")).cast("long").as("nt"))
      .agg(count(lit(1)), sum($"nt"),
        sum(when($"nt" >= 20, 1L).otherwise(0L)))
      .as[(Long, Long, Long)].collect().head
    assert((m("rows_in"), m("tokens_in"), m("rows_kept")) ==
      ((direct._1, direct._2, direct._3)))
    assert(m("rows_in").asInstanceOf[Long] > kept,
      "the gate must actually drop rows for this to prove anything")
  }

  test("observe rides a write without a second scan of the source") {
    val obs = Observation("write_metrics")
    val out = "/tmp/graft_observe/out"
    Tables.documents(spark, sf)
      .observe(obs, count(lit(1)).as("rows_written"),
        sum($"n_chars").as("chars_written"))
      .write.mode("overwrite").parquet(out)
    val m = obs.get
    val back = spark.read.parquet(out)
      .agg(count(lit(1)), sum($"n_chars"))
      .as[(Long, Long)].collect().head
    assert((m("rows_written"), m("chars_written")) == ((back._1, back._2)),
      "metrics collected during the write must match the written data")
  }
}
