package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Tables.events]] post-loader contract against every testdata
  * generation present on disk, so a silent driver-side regen of
  * `/root/testdata` (the r11 failure: `ts` flipped from TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS)/NTZ, 28 queries red from one loader assumption)
  * fails in ONE named test instead of 28 opaque query errors.
  */
class TablesContractSpec extends AnyFunSuite with SparkSuite {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(d => s"/root/testdata/$d")
    .filter(d => new java.io.File(d, "events.parquet").exists())

  test("testdata events dirs exist") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf*/events.parquet found")
  }

  for (dir <- sfDirs) {
    test(s"events loader contract holds for $dir") {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === TimestampType,
        s"ts must load as TimestampType (µs, UTC) — got ${ev.schema("ts").dataType}")
      assert(ev.schema("ts_ns").dataType === LongType,
        s"ts_ns must load as LongType epoch-nanos — got ${ev.schema("ts_ns").dataType}")
      // value contract: ts_ns is exact epoch-nanos for the µs-precision ts
      val bad = ev
        .filter(col("ts_ns") =!= unix_micros(col("ts")) * lit(1000L))
        .limit(1).count()
      assert(bad === 0L, "ts_ns and ts disagree — loader derivation broken")
      // and the table is non-degenerate: rows exist, timestamps are sane
      val row = ev.agg(count(lit(1)), min(col("ts")), max(col("ts"))).head()
      assert(row.getLong(0) > 0L, s"$dir/events.parquet is empty")
      val (lo, hi) = (row.getTimestamp(1), row.getTimestamp(2))
      assert(lo.getTime > 0L && hi.getTime < 4102444800000L, // < 2100-01-01
        s"event timestamps out of sane range: [$lo, $hi]")
    }
  }
}
