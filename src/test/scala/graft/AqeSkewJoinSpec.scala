package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling (SURVEY §4): a skewed sort-merge join must be
  * split by AQE at runtime — at 100 TB a hot key otherwise turns one
  * reducer into the job's critical path. Complements SaltingSpec
  * (explicit two-phase salting for aggregations): joins get the split
  * for free from AQE once thresholds see the skew. */
class AqeSkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // stop both OptimizeShuffleWithLocalRead-style rewrites that
      // would sidestep the SMJ: no broadcast, no demotion
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // the keyed agg above the join requires the join's partitioning;
      // splitting the hot partition breaks that guarantee, so AQE is
      // conservative by default — force accepts the extra re-shuffle
      // of the (small) agg input in exchange for unblocking the hot
      // reducer, the right trade whenever one key dominates
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      // one hot key (50k rows: ids < 50000) among 100 cold keys
      // (500 rows each: ids 50000..99999 over id % 100 + 1) —
      // md5 payload keeps the shuffle bytes incompressible, so the
      // hot partition's size is visible to the skew thresholds
      val fact = spark.range(0, 100000).select(
        (when($"id" < 50000, 0L).otherwise($"id" % 100 + 1)).as("k"),
        md5($"id".cast("string")).as("v"))
      val dim = spark.range(0, 101).select($"id".as("k"),
        concat(lit("payload_"), $"id").as("p"))
      // max(v) keeps the wide payload flowing through the join shuffle
      // (column pruning would otherwise strip it before the exchange)
      val joined = fact.join(dim, "k")
        .groupBy($"k").agg(count(lit(1)).as("n"), max($"v").as("p"))

      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(0L) == 50000L, s"hot key rows: ${got(0L)}")
      assert(got.size == 101)

      // the executed adaptive plan must carry the skew=true marker on
      // the sort-merge join (AQE split the hot partition)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ in:\n${plan.take(3000)}")
    }
  }
}
