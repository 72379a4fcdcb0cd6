package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{TgzSource, Web100}
import graft.queries.TarQueries.FixtureTgz

/** web100 payload parsing over the real fixture: 180 web100 entries hold
  * 8062 `C:` snapshots for 8060 distinct connection ids (two connections
  * span two polls, so latest-per-cid is a real reduction).
  */
class Web100Spec extends AnyFunSuite with SparkSuite {

  private lazy val snaps =
    Web100.snapshots(TgzSource.entries(spark, FixtureTgz)).cache()

  test("parses every snapshot row with the full 121-var map") {
    assert(snaps.count() === 8062)
    val first = snaps.head()
    assert(first.getAs[Map[String, String]]("vars").size === 121)
    assert(first.getAs[java.sql.Timestamp]("pollTime") != null)
    assert(first.getAs[String]("localAddress").nonEmpty)
  }

  test("latest snapshot per connection id (W1 on domain data)") {
    val latest = Web100.latestPerConnection(snaps)
    assert(latest.count() === 8060) // 2 cids collapse
    // every cid appears exactly once
    assert(latest.select("cid").distinct().count() === 8060)
    // projected metric is numeric for all rows
    assert(latest.filter(latest("data_bytes_out").isNull).count() === 0)
  }

  test("malformed payloads degrade gracefully") {
    assert(Web100.parsePayload("x", "no header here\n".getBytes).isEmpty)
    val truncated = "K: cid PollTime LocalAddress LocalPort RemAddress RemPort\n" +
      "C: 1 2017-03-15-05:00:37Z 1.2.3.4 9090 5.6.7.8\n" + // 5 of 6 values
      "C: 2 2017-03-15-05:00:37Z 1.2.3.4 9090 5.6.7.8 47730\n"
    val rows = Web100.parsePayload("x", truncated.getBytes).toList
    assert(rows.map(_.cid) === List(2L))
    assert(rows.head.snapSeq === 1L) // seq counts raw C-rows, dropped or not
  }

  test("non-numeric typed-core fields drop the row, never fail the task") {
    val bad = "K: cid PollTime LocalAddress LocalPort RemAddress RemPort\n" +
      "C: notanumber 2017-03-15-05:00:37Z 1.2.3.4 9090 5.6.7.8 47730\n" + // bad cid
      "C: 3 2017-03-15-05:00:37Z 1.2.3.4 badport 5.6.7.8 47730\n" + // bad port
      "C: 4 2017-03-15-05:00:37Z 1.2.3.4 9090 5.6.7.8 47730\n"
    val rows = Web100.parsePayload("x", bad.getBytes).toList
    assert(rows.map(_.cid) === List(4L))
  }

  // K-header missing the typed-core columns entirely: at() yields "" -> drop
  test("payload without cid/port columns yields no snapshots") {
    val noCore = "K: PollTime SomethingElse\nC: 2017-03-15-05:00:37Z 42\n"
    assert(Web100.parsePayload("x", noCore.getBytes).isEmpty)
  }
}
