package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order contracts: the column expression equals the reference
  * interleave bit-for-bit, and a z-clustered layout bounds BOTH
  * dimensions per file — so a predicate on either column skips files
  * on footer min/max stats, which single-key clustering only gives
  * for the sort key. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zvalue equals the reference interleave, masks high bits") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 1L),
      (12345L, 54321L), (65535L, 65535L), (65536L, 0L), (70000L, 70000L))
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", ZOrder.zvalue($"a", $"b", 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ZOrder.zvalueRef(a & 0xffffL, b & 0xffffL, 16),
        s"($a, $b)")
    }
    // interleave is a bijection on the masked domain: distinct pairs
    // below 2^16 map to distinct z
    assert(got.filter(p => p._1 < 65536 && p._2 < 65536)
      .map(_._3).distinct.length ==
      pairs.count(p => p._1 < 65536 && p._2 < 65536))
  }

  test("scaleTo maps [lo,hi] onto [0,2^bits) with exact boundaries") {
    val got = Seq(100L, 101L, 549L, 550L, 1099L)
      .toDF("c").select(ZOrder.scaleTo($"c", 100L, 1099L, 8).as("s"))
      .as[Long].collect().toSeq
    // width 1000 onto 256 cells: cell = (c-100)*256/1000 exactly
    assert(got == Seq(0L, 0L, 114L, 115L, 255L))
  }

  test("z-clustered files prune on BOTH dimensions; single-key on one") {
    val base = "/tmp/graft_zorder"
    val day = datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", day.as("day"))
    val n = 8
    // z-order on SCALED dimensions (the documented usage: raw epoch
    // days have constant high bits and would starve the custkey side
    // of the split)
    val (zdLo, zdHi) = orders.agg(min($"day"), max($"day"))
      .as[(Int, Int)].head()
    val (zcLo, zcHi) = orders.agg(min($"o_custkey"), max($"o_custkey"))
      .as[(Long, Long)].head()
    ZOrder.writeZOrdered(orders, s"$base/z", n,
      ZOrder.scaleTo($"o_custkey", zcLo, zcHi, 12),
      ZOrder.scaleTo($"day", zdLo, zdHi, 12), 12)
    // the single-key baseline: clustered by custkey only
    graft.operators.OutputSizing.writeClustered(
      orders, s"$base/bykey", n, $"o_custkey")

    def files(dir: String): Seq[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSeq

    // files a reader must touch for a predicate = files whose
    // (min, max) footer range of that column intersects it; parquet
    // stats per file are exactly the per-file min/max we compute here
    def touched(dir: String, c: String, lo: Long, hi: Long): Int =
      files(dir).count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)), max(col(c))).as[(Long, Long)].head()
        r._1 <= hi && r._2 >= lo
      }

    val (dLo, dHi) = orders.agg(min($"day"), max($"day"))
      .as[(Long, Long)].head()
    val (cLo, cHi) = orders.agg(min($"o_custkey"), max($"o_custkey"))
      .as[(Long, Long)].head()
    // a narrow band (1/16 of the range) in each dimension
    val dayBand = (dLo, dLo + (dHi - dLo) / 16)
    val custBand = (cLo, cLo + (cHi - cLo) / 16)

    assert(files(s"$base/z").size == n && files(s"$base/bykey").size == n)
    // custkey predicates prune under both layouts
    assert(touched(s"$base/bykey", "o_custkey", custBand._1, custBand._2) <= 2)
    assert(touched(s"$base/z", "o_custkey", custBand._1, custBand._2) <= n / 2)
    // day predicates prune ONLY under z-order: the custkey-sorted
    // layout spreads every day band across every file
    assert(touched(s"$base/bykey", "day", dayBand._1, dayBand._2) == n)
    assert(touched(s"$base/z", "day", dayBand._1, dayBand._2) <= n / 2,
      "z-order layout failed to bound the second dimension per file")
  }

  test("zvalueN: equals zvalue at d=2 equal budgets; ref parity at d=3") {
    val rows = Seq((3L, 9L, 1L), (255L, 0L, 64L), (100L, 200L, 300L),
      (1023L, 1023L, 255L), (512L, 7L, 128L))
    // d=2, equal budgets: bit-identical to the proven pairwise form
    val two = rows.toDF("a", "b", "c")
      .select(ZOrder.zvalue($"a", $"b", 10).as("z2"),
        ZOrder.zvalueN(Seq($"a" -> 10, $"b" -> 10)).as("zn"))
      .as[(Long, Long)].collect()
    two.foreach { case (z2, zn) => assert(z2 == zn) }
    // d=3, unequal budgets (10, 10, 8): engine == reference
    val got = rows.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        ZOrder.zvalueN(Seq($"a" -> 10, $"b" -> 10, $"c" -> 8)).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) =>
      assert(z == ZOrder.zvalueNRef(
        Seq(a & 1023L, b & 1023L, c & 255L), Seq(10, 10, 8)), s"($a,$b,$c)")
    }
    // SQL twin agrees
    rows.toDF("a", "b", "c").createOrReplaceTempView("zn3")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zvalueNSql(Seq("a" -> 10, "b" -> 10, "c" -> 8))} AS z FROM zn3")
      .as[Long].collect().toSeq
    assert(viaSql == got.map(_._4).toSeq)
  }

  test("3-dim z-clustered files prune on ALL THREE dimensions") {
    val base = "/tmp/graft_zorder3"
    val day = datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", day.as("day"),
        floor($"o_totalprice").cast("long").as("price"))
    val n = 16
    def range(c: String): (Long, Long) =
      orders.agg(min(col(c)).cast("long"), max(col(c)).cast("long"))
        .as[(Long, Long)].head()
    val (cLo, cHi) = range("o_custkey")
    val (dLo, dHi) = range("day")
    val (pLo, pHi) = range("price")
    ZOrder.writeZOrderedN(orders, s"$base/z", n, Seq(
      ZOrder.scaleTo($"o_custkey", cLo, cHi, 10) -> 10,
      ZOrder.scaleTo($"day", dLo, dHi, 10) -> 10,
      ZOrder.scaleTo($"price", pLo, pHi, 10) -> 10))

    def files(dir: String): Seq[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSeq
    def touched(c: String, lo: Long, hi: Long): Int =
      files(s"$base/z").count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("long"), max(col(c)).cast("long"))
          .as[(Long, Long)].head()
        r._1 <= hi && r._2 >= lo
      }
    assert(files(s"$base/z").size == n)
    // a narrow band (1/16 of the range) in EACH dimension skips files
    // on that dimension's own footer stats — at 16 files every
    // dimension gets at least one top-level z cut, so each band must
    // prune real files; a single-key layout bounds only its sort key
    // (the d=2 test shows the other dims at n)
    assert(touched("o_custkey", cLo, cLo + (cHi - cLo) / 16) <= 3 * n / 4)
    assert(touched("day", dLo, dLo + (dHi - dLo) / 16) <= 3 * n / 4)
    assert(touched("price", pLo, pLo + (pHi - pLo) / 16) <= 3 * n / 4,
      "third dimension not bounded per file")
  }

  test("zvalueSql mirrors zvalue on the fixture data") {
    val day = datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
    val engine = Tables.orders(spark, sf)
      .select($"o_orderkey",
        ZOrder.zvalue($"o_custkey", day, 16).as("z"))
    Tables.orders(spark, sf).createOrReplaceTempView("zorders")
    val viaSql = spark.sql(
      s"""SELECT o_orderkey, ${ZOrder.zvalueSql(
           "CAST(o_custkey AS BIGINT)",
           "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)",
           16)} AS z
         |FROM zorders""".stripMargin)
    assert(engine.join(viaSql, "o_orderkey")
      .filter(engine("z") =!= viaSql("z")).count() == 0)
  }
}
