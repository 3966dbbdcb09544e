package graft

import org.apache.spark.sql.SparkSession

/** One-call setup for a session the library didn't build: registers
  * the SQL surface of the custom expressions (`fnv1a`, `fnv1a_seeded`,
  * `dotd`) and the custom-operator planner strategy + optimizer rule
  * (as-of join family). Idempotent; safe to call per query. */
object Graft {
  def enable(spark: SparkSession): Unit = {
    functions.GraftFunctions.registerSql(spark)
    plans.GraftExtensions.ensureRegistered(spark)
  }
}
