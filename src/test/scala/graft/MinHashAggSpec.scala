package graft

import graft.queries.Pipeline
import org.apache.spark.sql.functions._

/** The typed MinHashAgg sketch estimates set Jaccard from 64 lanes —
  * check the estimate against the true shingle-hash-set Jaccard per
  * source pair (stderr ≈ sqrt(J(1-J)/64) ≈ 0.06; assert within 4σ). */
class MinHashAggSpec extends SparkSuite {
  import spark.implicits._

  test("source sketch similarity tracks true set Jaccard") {
    val est = Pipeline.queries("source_minhash_sim")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty)

    // true distinct shingle-hash sets per source (same chained-hash
    // shingle identity the sketch uses)
    val t = split($"text", " ")
    val th = transform(t, w => graft.functions.GraftFunctions.fnv1a(w))
    val sets = Tables.documents(spark, sf)
      .select($"source", explode(array_distinct(
        transform(sequence(lit(1), size(th) - 2), i =>
          graft.functions.GraftFunctions.fnv1a(element_at(th, i),
            element_at(th, i + 1), element_at(th, i + 2))))).as("h"))
      .distinct()
      .collect().groupBy(_.getString(0))
      .map { case (src, rows) => src -> rows.map(_.getLong(1)).toSet }

    est.foreach { case ((a, b), e) =>
      val inter = (sets(a) & sets(b)).size.toDouble
      val truth = inter / (sets(a) | sets(b)).size
      assert(math.abs(e - truth) <= 0.25,
        s"($a,$b): estimate $e vs true $truth")
    }
  }
}
