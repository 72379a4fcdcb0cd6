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

  /** What every loader-read table looks like to the engine TODAY
    * (Spark types under [[Tables.configure]]'s session — µs parquet
    * timestamps read as plain `timestamp`). A driver-side regen that
    * drifts any column fails HERE, in one named test per table, before
    * it can fail as dozens of opaque query errors (the r11 lesson).
    */
  private val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  for (dir <- sfDirs; (tbl, want) <- expectedSchemas.toSeq.sortBy(_._1)) {
    test(s"$tbl schema contract holds for $dir") {
      val got = Tables.table(spark, dir, tbl).schema
        .map(f => f.name -> f.dataType.catalogString)
      assert(got === want,
        s"$dir/$tbl.parquet drifted from the engine's read contract")
    }
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
