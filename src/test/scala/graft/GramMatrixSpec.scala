package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** GramMatrixAgg — brute-force parity, merge associativity under
  * repartitioning, and the L80 query's plan shape. */
class GramMatrixSpec extends SparkSuite {
  import spark.implicits._

  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(1.0f, 2.0f, -3.0f),
    Seq(0.5f, -0.25f, 4.0f),
    Seq(-2.0f, 0.0f, 1.5f),
    Seq(3.25f, 1.0f, -0.5f),
    Seq(0.0f, 0.0f, 0.0f))

  private def brute(d: Int): Array[Long] = {
    val out = new Array[Long](d * (d + 1) / 2)
    for (v <- vecs) {
      var k = 0
      for (i <- 0 until d; j <- i until d) {
        out(k) += math.floor(v(i).toDouble * v(j).toDouble * 1e6 + 0.5).toLong
        k += 1
      }
    }
    out
  }

  test("matches the brute-force upper triangle exactly") {
    val df = vecs.toDF("v")
    val row = df.agg(GraftFunctions.gram_matrix($"v", 3).as("g"))
      .select($"g.cnt", $"g.cells").head()
    assert(row.getLong(0) == vecs.length.toLong)
    assert(row.getSeq[Long](1).toArray.sameElements(brute(3)))
  }

  test("partition-order-free: 1-partition and 7-partition runs agree bitwise") {
    val df = vecs.toDF("v")
    def cells(parts: Int): Seq[Long] =
      df.repartition(parts).agg(GraftFunctions.gram_matrix($"v", 3).as("g"))
        .select($"g.cells").head().getSeq[Long](0)
    assert(cells(1) == cells(7),
      "integer partials must merge associatively across any partitioning")
  }

  test("accepts array<double> with identical results") {
    val f = vecs.toDF("v").agg(GraftFunctions.gram_matrix($"v", 3).as("g"))
      .select($"g.cells").head().getSeq[Long](0)
    val d = vecs.map(_.map(_.toDouble)).toDF("v")
      .agg(GraftFunctions.gram_matrix($"v", 3).as("g"))
      .select($"g.cells").head().getSeq[Long](0)
    assert(f == d, "float input must widen exactly to the double lane")
  }

  test("gram_matrix query: one aggregation pass, no per-pair explode of rows") {
    val p = graft.queries.Pipeline.queries("gram_matrix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      s"the typed aggregate must drive the pass:\n$p")
    // the only Generate is the 2080-cell unflatten of the ONE result
    // row — it must sit ABOVE the aggregate (closer to the root), so
    // no vector row is ever exploded
    val gen = p.indexOf("Generate")
    val agg = p.lastIndexOf("ObjectHashAggregate")
    assert(gen >= 0 && gen < agg,
      s"explode must apply to the aggregated row only:\n$p")
  }
}
