package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One quirk: `events.ts` is parquet `TIMESTAMP(NANOS)`, which Spark refuses
  * by default. We read it with `spark.sql.legacy.parquet.nanosAsLong=true`
  * (→ `LongType` epoch-nanos) and expose both the raw nanos (`ts_ns`, exact —
  * use for ordering/tie-breaks so results match engines that keep full nanos)
  * and a µs-truncated proper `TimestampType` `ts` for date/window arithmetic.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** events with `ts_ns: Long` (exact) and `ts: Timestamp` (µs, UTC). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integer division — a double intermediate would lose precision at 1e18
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
