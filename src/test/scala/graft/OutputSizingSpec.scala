package graft

import graft.operators.OutputSizing
import org.apache.spark.sql.functions._

/** Output-layout contracts: compaction must hit the computed file
  * count without changing the data; clustered writes must give each
  * file a disjoint key range (the property parquet min/max pruning
  * feeds on). */
class OutputSizingSpec extends SparkSuite {
  import spark.implicits._

  private val base = "/tmp/graft_output_sizing"

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).toSeq

  test("compact rewrites many small files into the computed count") {
    val in = s"$base/small"
    val out = s"$base/compacted"
    val df = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    df.repartition(32).write.mode("overwrite").parquet(in)
    assert(partFiles(in).length == 32)

    val total = OutputSizing.dataBytes(spark, in)
    val target = total / 4 + 1
    val n = OutputSizing.compact(spark, in, out, target)
    assert(n >= 2 && n <= 8, s"expected a handful of files, got $n")
    assert(partFiles(out).length == n)
    // same rows, byte-identical multiset
    val a = spark.read.parquet(in).as[(Long, Long, Double)]
      .collect().sorted.toSeq
    val b = spark.read.parquet(out).as[(Long, Long, Double)]
      .collect().sorted.toSeq
    assert(a == b)
  }

  test("writeClustered gives every file a disjoint sorted key range") {
    val out = s"$base/clustered"
    val df = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
    OutputSizing.writeClustered(df, out, 6, $"o_orderkey")
    val files = partFiles(out)
    assert(files.length == 6)
    // per-file min/max from the data itself; ranges must not overlap
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"o_orderkey"), max($"o_orderkey")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // and the clustered copy is the same data
    assert(spark.read.parquet(out).count() == df.count())
  }
}
