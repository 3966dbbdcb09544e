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

  test("writeGridClustered: one file per occupied cell, matching the driver map") {
    val out = s"$base/grid"
    val df = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    OutputSizing.writeGridClustered(df, out, $"o_orderkey", 4096L)
    // the driver-checked clustered_file_map relation (cell → n_rows,
    // key range), recomputed here from the data
    val want = df.groupBy(OutputSizing.gridCell($"o_orderkey", 4096L).as("cell"))
      .agg(count(lit(1)).as("n"), min($"o_orderkey").as("lo"),
        max($"o_orderkey").as("hi"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // physical layout: one cell dir per occupied cell, ONE file each,
    // holding exactly that cell's rows — in its [c*w, (c+1)*w) range
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("__cell=")).toSeq
    assert(dirs.map(_.getName.stripPrefix("__cell=").toLong).sorted ==
      want.map(_._1))
    dirs.foreach { d =>
      assert(partFiles(d.getAbsolutePath).length == 1,
        s"cell dir ${d.getName} must hold exactly one file")
    }
    val got = spark.read.parquet(out)
      .groupBy($"__cell".cast("long").as("cell"))
      .agg(count(lit(1)).as("n"), min($"o_orderkey").as("lo"),
        max($"o_orderkey").as("hi"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    got.foreach { case (c, _, lo, hi) =>
      assert(lo >= c * 4096L && hi < (c + 1) * 4096L,
        s"cell $c holds keys outside its range: [$lo, $hi]")
    }
    // a key predicate reads only its cell's file (partition pruning
    // on the cell dir + footer min/max inside)
    val probe = want(want.length / 2)
    val scanned = spark.read.parquet(out)
      .filter($"o_orderkey" === probe._3)
      .select(input_file_name()).distinct().count()
    assert(scanned == 1L)
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
