package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TimeJoins

/** Driver-contract queries for the temporal joins ([[graft.ops.TimeJoins]]):
  * as-of join and interval-point range join over the events table.
  * Timestamps flow as epoch µs on both sides (the engine-portable basis
  * every other time query here uses), so the DuckDB oracles mirror the
  * semantics exactly — the as-of oracle is the same tagged-union running
  * `last_value IGNORE NULLS` construction, making tie order (quote before
  * probe at equal ts, greatest event_id among equal-ts quotes) explicit
  * in both engines rather than leaning on ASOF JOIN's unspecified
  * duplicate handling.
  */
object TimeJoinQueries {

  /** J5 — as-of join: each click event matched to the user's most recent
    * purchase at-or-before it (nulls when none precedes).
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "us")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "us", "value")
    TimeJoins.asOfJoin(clicks, purchases, Seq("user_id"),
        probeTs = "us", quoteTs = "us", payload = Seq("value"),
        probeTie = "event_id", quoteTie = "event_id")
      .select(col("event_id"), col("user_id"), col("us").as("click_us"),
        col("asof_ts").as("purchase_us"), col("asof_value").as("purchase_value"))
  }

  val asofJoinSql: String =
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS us, 1 AS side, event_id,
      |         CAST(NULL AS BIGINT) AS q_us, CAST(NULL AS DOUBLE) AS q_val
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), 0, event_id, epoch_us(ts), value
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (
      |  SELECT user_id, us, side, event_id,
      |         last_value(q_us IGNORE NULLS) OVER w AS purchase_us,
      |         last_value(q_val IGNORE NULLS) OVER w AS purchase_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, side, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, us AS click_us, purchase_us, purchase_value
      |FROM f WHERE side = 1""".stripMargin

  /** Window length for [[rangeJoin]]: 10 minutes in µs. */
  private val IncidentWindowUs = 600000000L

  /** J6 — range join: clicks falling inside each error event's 10-minute
    * incident window `[ts, ts + 10min)`, counted per incident (0 for
    * quiet incidents). The bucketed equi-join keeps the plan a hash join;
    * the oracle states the same semantics as a plain inequality join.
    */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("us").as("start_us"),
        (col("us") + IncidentWindowUs).as("end_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("us").as("click_us"))
    val matched = TimeJoins.rangeJoin(incidents, "start_us", "end_us",
      clicks, "click_us", width = IncidentWindowUs)
    val counts = matched.groupBy("event_id", "start_us")
      .agg(count(lit(1)).as("n_clicks"))
    incidents.select("event_id", "start_us")
      .join(counts, Seq("event_id", "start_us"), "left")
      .withColumn("n_clicks", coalesce(col("n_clicks"), lit(0L)))
  }

  val rangeJoinSql: String =
    s"""WITH err AS (
       |  SELECT event_id, epoch_us(ts) AS start_us
       |  FROM events WHERE event_type = 'error'),
       |clk AS (SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'click')
       |SELECT e.event_id, e.start_us, COUNT(c.us) AS n_clicks
       |FROM err e LEFT JOIN clk c
       |  ON c.us >= e.start_us AND c.us < e.start_us + $IncidentWindowUs
       |GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j5_asof_join" -> asofJoin,
    "j6_range_join" -> rangeJoin
  )

  def oracleSql: Map[String, String] = Map(
    "j5_asof_join" -> asofJoinSql,
    "j6_range_join" -> rangeJoinSql
  )
}
