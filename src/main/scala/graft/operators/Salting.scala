package graft.operators

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 / the 100 TB design
  * note). AQE's skew-join splitting handles skewed JOINS; salting is
  * the complementary tool for skewed AGGREGATION STATE — when one
  * group's reduce-side state (a distinct set, a collect buffer)
  * overwhelms a single task.
  *
  * The salt is the fnv1a hash of the aggregated VALUE, so each
  * distinct value lands in exactly one salt lane: lane-local exact
  * aggregates combine without double counting, turning one giant
  * reduce task into `salts` bounded ones.
  */
object Salting {

  /** Exact distinct count per key that no single hot key can stall:
    * phase 1 counts distinct values per (key, value-hash % salts)
    * lane, phase 2 sums the disjoint lane counts. */
  def skewSafeCountDistinct(df: DataFrame, keys: Seq[String],
      value: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(F.fnv1a(col(value)), lit(salts.toLong)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(countDistinct(col(value)).as("__lane_distinct"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__lane_distinct")).as("n_distinct"))
}
