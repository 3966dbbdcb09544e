package graft

import org.apache.spark.sql.functions._

/** S14: dynamic partition overwrite — the idempotent-backfill write
  * mode a partitioned 100 TB corpus depends on: re-running a job for
  * ONE partition must replace exactly that partition's files and
  * leave every other partition byte-untouched (static overwrite mode
  * would drop the whole table first). Write-path effect, so the
  * evidence is a spec (the S8 pattern), not a DuckDB oracle. */
class DynamicOverwriteSpec extends SparkSuite {
  import spark.implicits._

  test("overwriting one lang partition leaves the others untouched") {
    val root = "/tmp/graft_dyn_overwrite/docs"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source", $"lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(root)
    val before = spark.read.parquet(root)
      .groupBy($"lang").agg(count(lit(1)).as("n"),
        sum($"doc_id").as("ids"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, i) => k -> ((n, i)) }.toMap

    // the backfill: rewrite ONLY lang=en, with doc_ids negated so the
    // replacement is visible
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      docs.filter($"lang" === "en")
        .withColumn("doc_id", -$"doc_id")
        .write.mode("overwrite").partitionBy("lang").parquet(root)
    } finally prior match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    val after = spark.read.parquet(root)
      .groupBy($"lang").agg(count(lit(1)).as("n"),
        sum($"doc_id").as("ids"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, i) => k -> ((n, i)) }.toMap

    assert(after.keySet == before.keySet, "no partition may disappear")
    assert(after("en")._1 == before("en")._1 &&
      after("en")._2 == -before("en")._2,
      "the en partition must carry the backfilled rows")
    (before.keySet - "en").foreach { l =>
      assert(after(l) == before(l), s"partition $l must be untouched")
    }
  }

  test("the same overwrite in static mode would drop sibling partitions") {
    // contract documentation: this is WHY dynamic mode matters
    val root = "/tmp/graft_dyn_overwrite/static_docs"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(root)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"), "default mode is static")
    docs.filter($"lang" === "en")
      .write.mode("overwrite").partitionBy("lang").parquet(root)
    val langs = spark.read.parquet(root)
      .select($"lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"), "static overwrite replaces the whole table")
  }
}
