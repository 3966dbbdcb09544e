package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated Parquet star schema
  * (see FIXTURES.md). Schemas are Parquet-embedded and stable; we do not
  * re-infer. At cluster scale the same loader points at a partitioned
  * table root — all downstream operators rely only on relational
  * semantics, never on file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects; read it as nano-precision Long and
    * convert to a (µs) timestamp with exact integer arithmetic. The
    * driver data is µs-aligned (verified: `epoch_ns(ts) % 1000 = 0`
    * for all rows), so the conversion is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
