package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located join: when two tables are
  * written bucketed (and sorted) by the same key into the same bucket
  * count, a join between them needs NO shuffle and NO sort — each
  * task zips bucket i with bucket i. At 100 TB this converts the
  * recurring fact⋈fact join from the cluster's largest exchange into
  * a local merge per bucket; the price is paid once, at write time.
  *
  * Spark's bucketing lives behind the session catalog (`bucketBy`
  * requires `saveAsTable`), so these helpers speak table names, not
  * paths. Bucket count must match on both sides for the exchange-free
  * plan; Spark also elides the per-task Sort when `sortBy` matches
  * the join key (pinned in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      keys: Seq[String]): Unit = {
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    require(keys.nonEmpty, "bucketing needs at least one key")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
