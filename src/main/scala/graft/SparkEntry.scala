package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnnQueries, CoreQueries, DedupQueries, EmbargoQueries, MultimodalQueries, TarQueries, TextQueries, TimeJoinQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one deterministic, order-insensitive query per implemented
  * operator from SURVEY.md §2; `oracleSql` the DuckDB-equivalent ANSI SQL over
  * the same parquet tables (omitted only for ops DuckDB cannot express, which
  * the driver downgrades to a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * THE embargo routing predicate + whitelist broadcast semi-join
    * (SURVEY §2.2 P3 / §2.4 J1) — public vs private counts per day.
    */
  def entry(spark: SparkSession): DataFrame =
    EmbargoQueries.routeCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EmbargoQueries.queries ++ TarQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ AnnQueries.queries ++
      MultimodalQueries.queries ++ TimeJoinQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ EmbargoQueries.oracleSql ++ TarQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++ AnnQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ TimeJoinQueries.oracleSql
}
