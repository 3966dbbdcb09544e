package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event funnel — the windowFunnel analytics operator: for
  * each entity, the deepest PREFIX of `stages` completed in order
  * within `window` of the entity's first stage-1 event. Stage i
  * matches the earliest stage-i event STRICTLY after the stage-(i−1)
  * time and no later than `t_entry + window`; an entity's level is
  * the longest such chain (cf. the reference's capability envelope,
  * `main.rs:3` — an [X] analytics extension; the same shape as
  * ClickHouse's windowFunnel, reimplemented Spark-first).
  *
  * Scale shape: one slim per-stage aggregation plus k−1 equi-joins,
  * ALL keyed on the entity — at 100 TB every frame co-partitions on
  * the entity hash, AQE coalesces the shrinking tails (each stage's
  * frame is a subset of the previous), and no per-entity event array
  * is ever collected; the final level resolution is one more
  * entity-keyed aggregation over k slim frames. Events are filtered
  * to one stage type before every join, so each join's probe side is
  * a pushed-predicate scan, never the full event log.
  */
object Funnel {

  /** Per-entity funnel depth.
    *
    * @param events    event relation
    * @param entityCol grouping key (user/session id)
    * @param timeCol   event-time column
    * @param typeCol   event-type column matched against `stages`
    * @param stages    ordered stage types (distinct, non-empty)
    * @param window    SQL interval from the stage-1 time that bounds
    *                  the WHOLE chain, e.g. "INTERVAL 1 DAY"
    * @return one row per entity that completed stage 1:
    *         (entityCol, level, t_entry, t_level) — deepest stage
    *         index (1-based), the stage-1 time, and the time the
    *         deepest stage completed
    */
  def windowFunnel(events: DataFrame, entityCol: String, timeCol: String,
      typeCol: String, stages: Seq[String], window: String): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    require(stages.distinct.length == stages.length,
      s"stages must be distinct, got $stages")
    // the chain-join working columns and the t_entry output would
    // silently collide with same-named caller columns
    val reserved = Seq("__e", "__t", "__m", "t_entry")
      .filter(events.columns.contains)
    require(reserved.isEmpty,
      s"events must not contain reserved column(s) ${reserved.mkString(", ")}")
    val t: Column = col(timeCol)
    val ty: Column = col(typeCol)
    val first = events.filter(ty === stages.head)
      .groupBy(col(entityCol).as("__e")).agg(min(t).as("t_entry"))
      .withColumn("__t", col("t_entry"))
    val frames = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(ty === stage)
        .join(prev, col(entityCol) === col("__e"))
        .filter(t > col("__t") && t <= col("t_entry") + expr(window))
        // t_entry is per-entity constant (joined from prev); min = it
        .groupBy(col("__e"))
        .agg(min(t).as("__t"), min(col("t_entry")).as("t_entry"))
    }
    frames.zipWithIndex.map { case (f, i) =>
      f.select(col("__e"), lit(i + 1).as("level"), col("t_entry"),
        col("__t").as("t_level"))
    }.reduce(_ unionByName _)
      .groupBy(col("__e"))
      .agg(max(struct(col("level"), col("t_level"))).as("__m"),
        min(col("t_entry")).as("t_entry"))
      .select(col("__e").as(entityCol), col("__m.level").as("level"),
        col("t_entry"), col("__m.t_level").as("t_level"))
  }
}
