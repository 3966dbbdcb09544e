package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-area registries under
  * graft.queries.*; every operator row in SURVEY.md §2 that is claimed
  * done has an entry here (and an oracle unless not SQL-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Joins.queries ++
      graft.queries.TpchShapes.queries ++
      graft.queries.Lookups.queries ++
      graft.queries.Aggregates.queries ++
      graft.queries.Aggregates.approxQueries ++
      graft.queries.Windows.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Scalars.nativeHashQueries ++
      graft.queries.EventTime.queries ++
      graft.queries.Mutations.queries ++
      graft.queries.Layout.queries ++
      graft.queries.Graph.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.Pipeline.noOracleQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    staticOracles ++ graft.queries.Pipeline.oracle

  /** [[oracleSql]] with the data-dependent entries keyed to ONE sf dir
    * (learned centroids, engine hash/estimate literals) — what Verify
    * dumps, so a JVM that touched several dirs still writes the right
    * oracle for the dir it verified. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    staticOracles ++
      graft.queries.Aggregates.oracleFor(sfDir) ++
      graft.queries.Scalars.oracleFor(sfDir) ++
      graft.queries.Layout.oracleFor(sfDir) ++
      graft.queries.Pipeline.oracleFor(sfDir)

  private def staticOracles: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Joins.oracle ++
      graft.queries.TpchShapes.oracle ++
      graft.queries.Lookups.oracle ++
      graft.queries.Aggregates.oracle ++
      graft.queries.Windows.oracle ++
      graft.queries.Scalars.oracle ++
      graft.queries.EventTime.oracle ++
      graft.queries.Mutations.oracle ++
      graft.queries.Layout.oracle ++
      graft.queries.Graph.oracle
}
