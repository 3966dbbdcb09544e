package graft

import graft.operators.IvfIndex
import graft.queries.Pipeline

/** The `ivf_ann_learned` oracle must be keyed per sf dir: a JVM that
  * exercises several dirs (exactly what this suite does) gets, for each
  * dir, SQL interpolating THAT dir's learned centroids — not whichever
  * dir ran last. */
class LearnedOracleSpec extends SparkSuite {
  import spark.implicits._

  private def firstCentroid(dir: String): Double = {
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    IvfIndex.learnCentroids(emb, 16, 3)(0)(0)
  }

  test("two dirs in one session produce two correct learned oracles") {
    val d1 = "/root/testdata/sf0.001"
    val d2 = "/root/testdata/sf0.01"
    // constructing the query warms the per-dir centroid cache, exactly
    // as Verify does before dumping oracle_sql.json
    Pipeline.queries("ivf_ann_learned")(spark, d1)
    Pipeline.queries("ivf_ann_learned")(spark, d2)

    val sql1 = Pipeline.oracleFor(d1)("ivf_ann_learned")
    val sql2 = Pipeline.oracleFor(d2)("ivf_ann_learned")
    assert(sql1 != sql2, "different corpora must learn different centroids")
    // each oracle carries its own dir's centroid literals
    // (Double.toString round-trips exactly, so contains() is exact)
    assert(sql1.contains(firstCentroid(d1).toString),
      "d1 oracle must interpolate d1 centroids")
    assert(sql2.contains(firstCentroid(d2).toString),
      "d2 oracle must interpolate d2 centroids")
    assert(!sql1.contains(firstCentroid(d2).toString))

    // and the dir-keyed view is what Verify dumps for its run dir,
    // regardless of which dir was touched last
    assert(SparkEntry.oracleSqlFor(d1)("ivf_ann_learned") == sql1)
    assert(SparkEntry.oracleSqlFor(d2)("ivf_ann_learned") == sql2)
  }
}
