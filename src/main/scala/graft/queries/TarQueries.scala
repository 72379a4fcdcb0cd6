package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.TgzSource
import graft.ops.EmbargoSplit

/** Driver-contract queries over the real reference fixture tarball
  * (S4 explode + E1 routing, `/root/reference/embargo.go:125-220`).
  *
  * DuckDB cannot read `.tgz`, so these have no oracle SQL — the driver
  * records rows-only checks; the strong equivalence check is the golden
  * split ScalaTest (145 public / 59 private at entry level,
  * `/root/reference/embargo_test.go:54-90`).
  */
object TarQueries {

  val FixtureTgz =
    "/root/reference/testdata/20170315T000000Z-mlab3-sea03-sidestream-0000.tgz"
  val FixtureWhitelist = "/root/reference/testdata/whitelist_full"

  /** Golden-test cutoff: the fixture day itself, so `moreThanOneYear` is
    * false and routing exercises the web100/whitelist arms
    * (the reference test passes `moreThanOneYear=false` directly,
    * `/root/reference/embargo_test.go:66`).
    */
  val FixtureCutoff = 20170315

  /** S4 — raw entry manifest of the fixture archive (205 rows incl. the
    * directory entry; `sfDir` unused — the fixture is fixed-path).
    */
  def tarScan(spark: SparkSession, sfDir: String): DataFrame =
    TgzSource.entries(spark, FixtureTgz)
      .select(col("ordinal"), col("name"), col("size"), col("typeflag"))

  /** E1 — the golden split as route counts
    * (145 public / 59 private at the fixture cutoff).
    */
  def splitCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val entries = TgzSource.entries(spark, FixtureTgz)
    val wl = TgzSource.whitelist(spark, FixtureWhitelist)
    EmbargoSplit.fileCounts(EmbargoSplit.route(entries, wl, FixtureCutoff))
  }

  /** S2 — full catalog listing of the sf directory (rows-only: DuckDB has
    * no filesystem catalog). Sizes are real file sizes; names are the
    * stable table set.
    */
  def bucketList(spark: SparkSession, sfDir: String): DataFrame =
    graft.io.FsOps.list(spark, sfDir, ".parquet")

  /** web100 domain parse (SURVEY §1.1 row 6): latest snapshot per
    * connection over the fixture's 8062 snapshots (rows-only: tgz input).
    */
  def web100Latest(spark: SparkSession, sfDir: String): DataFrame =
    graft.io.Web100.latestPerConnection(
      graft.io.Web100.snapshots(TgzSource.entries(spark, FixtureTgz)))
      .select(col("cid"), unix_micros(col("last_poll")).as("last_poll_us"),
        col("localAddress"), col("remAddress"), col("data_bytes_out"))

  /** ST1 — the AvailableNow streaming drain end to end (rows-only): the
    * fixture is staged into a fresh landing dir, drained through
    * [[graft.streaming.StreamingEmbargo]], and the routed manifest read
    * back as per-route counts (145 public / 59 private, same as batch).
    */
  def streamDrain(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-st1")
    val in = java.nio.file.Files.createDirectory(root.resolve("in"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(FixtureTgz),
      in.resolve("20170315T000000Z-mlab3-sea03-sidestream-0000.tgz"))
    val out = root.resolve("out").toString
    graft.streaming.StreamingEmbargo.drain(spark, in.toString, FixtureWhitelist,
      FixtureCutoff, out, root.resolve("ckpt").toString)
    spark.read.parquet(out)
      .groupBy("route").agg(count(lit(1)).as("n_files"), sum(col("size")).as("n_bytes"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s4_tar_scan" -> tarScan,
    "s2_bucket_list" -> bucketList,
    "e1_split_counts" -> splitCounts,
    "w100_latest_per_cid" -> web100Latest,
    "st1_stream_drain" -> streamDrain
  )

  /** No oracle SQL — DuckDB cannot read tgz; rows-only by design. */
  def oracleSql: Map[String, String] = Map.empty
}
