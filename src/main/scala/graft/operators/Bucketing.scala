package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY.md §2 J8 note / §4 co-located joins):
  * writing both sides of a recurring fact–fact join bucketed AND
  * sorted by the join key lets every subsequent sort-merge join read
  * co-located, pre-sorted buckets — zero Exchange, zero Sort in the
  * join plan. At 100 TB this converts the single most expensive
  * recurring shuffle (fact ⋈ fact) into a scan-side property paid once
  * at write time.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — pinned to the
    * sort-merge strategy (the co-located plan this operator exists
    * for); with both tables bucketed+sorted on `key` at the same
    * bucket count, the join has no shuffle and no sort. Without the
    * pin, Catalyst would broadcast a small side and never exercise the
    * bucket layout. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable).hint("merge")
    l.join(r, l(key) === r(key))
  }
}
