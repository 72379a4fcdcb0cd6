package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventSessions
import graft.streaming.EventSessions.{Event, UserRunning}

/** Stateful-streaming specs: session windows (batch = backfill path) and
  * mapGroupsWithState running totals across micro-batches (MemoryStream).
  */
class SessionsSpec extends AnyFunSuite with SparkSuite {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("session_window splits on the gap, aggregates within") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(5), 20.0),  // session A (gap 10m)
      (1L, ts(30), 5.0),                     // session B
      (2L, ts(1), 1.0)                       // user 2
    ).toDF("user_id", "ts", "value")
    val s = EventSessions.sessionize(ev, gap = "10 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(s.length === 3)
    assert(s(0).getAs[Long]("n_events") === 2 && s(0).getAs[Double]("total_value") === 30.0)
    assert(s(1).getAs[Long]("n_events") === 1 && s(1).getAs[Double]("total_value") === 5.0)
    assert(s(2).getAs[Long]("user_id") === 2L)
  }

  test("dedupStream drops in-watermark duplicate event ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = graft.streaming.EventSessions.dedupStream(
      in.toDS().toDF("event_id", "ts"), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)))
      q.processAllAvailable()
      in.addData((2L, ts(3)), (3L, ts(4))) // 2 is a cross-batch duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupStream state ages out at the watermark horizon (st7's bound)") {
    // the whole point of dropDuplicatesWithinWatermark over dropDuplicates:
    // a duplicate arriving AFTER its original's state aged out re-emits —
    // exactness is traded inside the horizon for bounded state
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = graft.streaming.EventSessions.dedupStream(
      in.toDS().toDF("event_id", "ts"), Seq("event_id"), delay = "1 minute")
      .writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0)))
      q.processAllAvailable()
      // advance the watermark far past id 1's eviction point
      in.addData((2L, ts(30)))
      q.processAllAvailable()
      // id 1 again, at a CURRENT event time: its state is gone → re-emitted
      in.addData((1L, ts(31)))
      q.processAllAvailable()
      val ids = spark.table("wmdedup").select("event_id").as[Long].collect()
      assert(ids.sorted.toSeq === Seq(1L, 1L, 2L),
        s"expected the aged-out duplicate to re-emit, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-user running totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventSessions.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      in.addData(Event(1L, 1000L, 2.0), Event(1L, 2000L, 3.0), Event(2L, 1500L, 7.0))
      q.processAllAvailable()
      in.addData(Event(1L, 3000L, 5.0)) // second micro-batch: state must carry
      q.processAllAvailable()
      val rows = spark.table("running").as[UserRunning].collect()
      val u1 = rows.filter(_.user_id == 1L).maxBy(_.n_events)
      assert(u1 === UserRunning(1L, 3L, 10.0, 3000L))
      val u2 = rows.filter(_.user_id == 2L).maxBy(_.n_events)
      assert(u2 === UserRunning(2L, 1L, 7.0, 1500L))
    } finally q.stop()
  }

  test("st16: session fragments arriving in different micro-batches fuse into ONE row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = EventSessions.sessionize(
      EventSessions.withLateDataBound(
        in.toDS().toDF("user_id", "ts", "value"), delay = "1 minute"),
      gap = "10 minutes")
      .writeStream.format("memory").queryName("st16sess").outputMode("append").start()
    try {
      // batch 1: first fragment of user 1's session
      in.addData((1L, ts(0), 10.0), (1L, ts(5), 20.0))
      q.processAllAvailable()
      // batch 2: second fragment 6 min later — INSIDE the gap, so the
      // state store must merge it into the open session, not open a new one
      in.addData((1L, ts(11), 5.0))
      q.processAllAvailable()
      // batch 3: watermark push far past session close -> append emits it
      in.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      val rows = spark.table("st16sess")
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSet === Set((1L, 3L, 35.0))) // ONE fused session row
    } finally q.stop()
  }
}
