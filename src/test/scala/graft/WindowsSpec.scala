package graft

import graft.queries.Windows
import org.apache.spark.sql.functions.col

/** Plan-shape assertions for sorts/limits: the point of O2/O4 is what
  * they do NOT do at scale (full global sorts). */
class WindowsSpec extends SparkSuite {

  private def plan(name: String): String =
    Windows.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("top_k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("top_k")
    assert(p.contains("TakeOrderedAndProject"), s"plan was:\n$p")
    assert(!p.contains("rangepartitioning"), "top-k must not range-shuffle")
  }

  test("partition_sort issues no global range exchange") {
    val p = plan("partition_sort")
    assert(!p.contains("rangepartitioning"),
      s"partition-local sort must not range-shuffle:\n$p")
    assert(p.contains("Sort") && p.contains("hashpartitioning"))
  }

  test("window_fill: a purchase row's fill is its own value (frame includes current row)") {
    val rows = Windows.queries("window_fill")(spark, sf).collect()
    val purchases = rows.filter(_.getString(2) == "purchase")
    assert(purchases.nonEmpty)
    purchases.foreach { r => assert(!r.isNullAt(3)) }
    // and at least one user has a pre-first-purchase null prefix
    assert(rows.exists(r => r.isNullAt(3)))
  }

  test("keyset_page is exactly the slice of the total order after the cursor") {
    val full = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val afterCursor = full.filter { case (k, p) =>
      p < 400000.0 || (p == 400000.0 && k > 0L) }.take(100)
    val page = Windows.queries("keyset_page")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(page.toSeq == afterCursor.toSeq)
  }
}
