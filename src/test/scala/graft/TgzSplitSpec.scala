package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{TgzSink, TgzSource}
import graft.model.Schemas
import graft.ops.EmbargoSplit
import graft.queries.TarQueries.{FixtureCutoff, FixtureTgz, FixtureWhitelist}

/** Golden-split tests (`/root/reference/embargo_test.go:54-90`), at the
  * entry level per SURVEY §5b: gzip bytes are not stable across
  * implementations (the reference itself flags the byte-compare as fragile,
  * `/root/reference/embargo_test.go:51-53`), so equivalence is the ordered
  * (name, size) list per route — strictly stronger than set equality.
  */
class TgzSplitSpec extends AnyFunSuite with SparkSuite {

  private def goldenEntries(path: String): Seq[(String, Long)] =
    TgzSource.readTgzStream(path, Files.newInputStream(Paths.get(path)))
      .map(e => (e.name, e.size)).toSeq

  private val goldenPub = goldenEntries(FixtureTgz.replace(".tgz", "-p.tgz"))
  private val goldenPriv = goldenEntries(FixtureTgz.replace(".tgz", "-e.tgz"))

  test("S4: fixture explodes to 205 ordered entries, one directory") {
    val es = TgzSource.entries(spark, FixtureTgz).collect().sortBy(_.ordinal)
    assert(es.length === 205)
    assert(es.count(_.typeflag == "5") === 1)
    assert(es.head.typeflag === "5") // the directory entry leads
    assert(es.map(_.ordinal).toSeq === (0L until 205L))
    // payload sizes are consistent with headers
    es.filter(_.typeflag == "0").foreach(e => assert(e.content.length === e.size))
  }

  test("E1 golden split: routing matches -p/-e goldens in order") {
    val entries = TgzSource.entries(spark, FixtureTgz)
    val wl = TgzSource.whitelist(spark, FixtureWhitelist)
    val routed = EmbargoSplit.route(entries, wl, FixtureCutoff)
      .select("route", "ordinal", "name", "size")
      .collect()
      .sortBy(_.getAs[Long]("ordinal"))

    def side(route: String) = routed.filter(_.getAs[String]("route") == route)
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("size"))).toSeq

    assert(side(Schemas.RoutePublic) === goldenPub)   // 145 entries
    assert(side(Schemas.RoutePrivate) === goldenPriv) // 59 entries
    assert(goldenPub.length === 145 && goldenPriv.length === 59)
  }

  test("S7/S8 sink: end-to-end run writes -p/-e pair equivalent to goldens") {
    val outDir = Files.createTempDirectory("graft-split").toString
    EmbargoSplit.run(spark, FixtureTgz, FixtureWhitelist, FixtureCutoff, outDir)
    val base = FixtureTgz.substring(FixtureTgz.lastIndexOf('/') + 1)
    val pubOut = s"$outDir/$base"
    val privOut = s"$outDir/${base.replace(".tgz", "-e.tgz")}"
    assert(goldenEntries(pubOut) === goldenPub)
    assert(goldenEntries(privOut) === goldenPriv)
    // payload bytes survive the repack round-trip
    val rt = TgzSource.entries(spark, pubOut).collect().sortBy(_.ordinal)
    val orig = TgzSource.entries(spark, FixtureTgz).collect()
      .filter(_.typeflag == "0").map(e => e.name -> e.content.toSeq).toMap
    rt.foreach(e => assert(orig(e.name) === e.content.toSeq, s"bytes differ: ${e.name}"))
  }

  test("P4/P5: archives older than the cutoff route public wholesale") {
    val oldTgz = "/root/repo/testdata/20160102T000000Z-mlab3-sin01-sidestream-0000.tgz"
    val entries = TgzSource.entries(spark, oldTgz)
    val wl = TgzSource.whitelist(spark, FixtureWhitelist)
    // cutoff after the archive day: moreThanOneYear arm short-circuits
    val routes = EmbargoSplit.route(entries, wl, cutoffDateInt = 20170101)
      .groupBy("route").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(routes.keySet === Set(Schemas.RoutePublic))
    // cutoff at/before the day: the web100/whitelist arms decide again
    val split = EmbargoSplit.route(entries, wl, cutoffDateInt = 20160102)
      .groupBy("route").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.getOrElse(Schemas.RoutePrivate, 0L) > 0)
  }

  test("S4: corrupt input fails fast, as the reference's reader error path") {
    val junk = Array.fill[Byte](64)(0x41)
    assertThrows[java.io.IOException] {
      TgzSource.readTgz("bad.tgz", junk).toList
    }
    // truncated gzip: valid header, cut-off stream
    val real = Files.readAllBytes(Paths.get(FixtureTgz))
    assertThrows[java.io.IOException] {
      TgzSource.readTgz("trunc.tgz", real.take(1000)).toList
    }
  }

  test("S7: an archive split across partitions fails at commit, not silently") {
    val outDir = Files.createTempDirectory("graft-split-conflict").toString
    val entries = TgzSource.entries(spark, FixtureTgz)
    val wl = TgzSource.whitelist(spark, FixtureWhitelist)
    // range-partition by ordinal: each half is contiguous WITHIN its task
    // (so the in-task interleave guard cannot fire) but the archive spans
    // two tasks — exactly the silent-clobber case the commit must reject
    val split = EmbargoSplit.route(entries, wl, FixtureCutoff)
      .repartitionByRange(2, org.apache.spark.sql.functions.col("ordinal"))
    val e = intercept[IllegalStateException] {
      TgzSink.writeSplit(split, outDir)
    }
    assert(e.getMessage.contains("split across partitions"))
    // nothing was published and the staging dir was cleaned up
    assert(!Files.exists(Paths.get(s"$outDir/_tmp")))
    val base = FixtureTgz.substring(FixtureTgz.lastIndexOf('/') + 1)
    assert(!Files.exists(Paths.get(s"$outDir/$base")))
  }

  test("S5/F10: whitelist loads trimmed distinct IPs") {
    val wl = TgzSource.whitelist(spark, FixtureWhitelist).collect().map(_.getString(0))
    assert(wl.length === 3473)
    assert(wl.forall(ip => ip == ip.trim && ip.nonEmpty))
    assert(wl.contains("2001:4c08:2003:2::148"))
  }
}
