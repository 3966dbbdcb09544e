package graft

import org.apache.spark.sql.functions._

/** J17: runtime bloom-filter join pruning (Spark's InjectRuntimeFilter)
  * — the shuffle-join complement of dynamic partition pruning: when a
  * selective predicate sits on one join side, the optimizer builds a
  * bloom filter of that side's join keys at runtime and pushes a
  * `might_contain` probe onto the OTHER side's scan, so a 100 TB fact
  * table drops non-joining rows before the shuffle instead of after
  * it. Results are conf-independent (the bloom is one-sided); what
  * this spec pins is the PLAN — the feature fires on our join shapes —
  * and value equality against the unfiltered spelling.
  *
  * Thresholds: the application side must look big enough to be worth
  * filtering (`applicationSideScanSizeThreshold`, default 10GB) — at
  * fixture scale that is lowered to 0; everything else is stock.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim filter injects a bloom might_contain on the fact side") {
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val l = Tables.lineitem(spark, sf).select(col("l_orderkey"),
        col("l_extendedprice"))
      val o = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"runtime bloom filter must inject on the fact scan:\n${opt.take(2000)}")

      // values identical with the feature off (the filter only drops
      // rows the join would drop anyway)
      val withBloom = j.collect().head
      withSQLConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
          .collect().head
        assert(withBloom.getLong(0) === plain.getLong(0))
        assert(withBloom.getDouble(1) === plain.getDouble(1))
      }
    }
  }
}
