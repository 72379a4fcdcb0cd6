package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** ST5 spec: stream-stream attribution join — a buffered click matches a
  * purchase arriving in a LATER micro-batch, matches emit eagerly (no
  * flush sentinel), and out-of-window purchases never match.
  */
class StreamJoinSpec extends AnyFunSuite with SparkSuite {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("click state survives the batch boundary; window bounds are enforced") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.attributionJoin(
      cIn.toDF().toDF("event_id", "user_id", "ts"),
      pIn.toDF().toDF("event_id", "user_id", "ts"),
      window = "30 minutes", delay = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("st5_spec")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def rows() = spark.table("st5_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1: click + same-batch purchase inside the window
      cIn.addData((1L, 7L, t("10:00")))
      pIn.addData((101L, 7L, t("10:05")))
      q.processAllAvailable()
      assert(rows() === Set((1L, 101L)))
      // batch 2: a purchase 20 minutes after the batch-1 click — the
      // click must still be buffered; one outside the window must not
      // match; a different user's purchase must not match either
      pIn.addData((102L, 7L, t("10:20")), (103L, 7L, t("12:00")),
        (104L, 8L, t("10:10")))
      q.processAllAvailable()
      assert(rows() === Set((1L, 101L), (1L, 102L)))
    } finally q.stop()
  }

  test("st18: an unmatched click straddling a batch boundary emits its null row exactly once, AFTER state closure") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.attributionJoinOuter(
      cIn.toDF().toDF("event_id", "user_id", "ts"),
      pIn.toDF().toDF("event_id", "user_id", "ts"),
      window = "30 minutes", delay = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("st18_spec")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def rows() = spark.table("st18_spec").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toList
      // batch 1: a click with NO purchase, plus a matched pair for a
      // different user (proves matched rows still emit eagerly)
      cIn.addData((1L, 7L, t("10:00")), (2L, 8L, t("10:00")))
      pIn.addData((201L, 8L, t("10:05")))
      q.processAllAvailable()
      assert(rows().toSet === Set((2L, Some(201L))),
        "unmatched click must NOT null-emit while its window is open")
      // batch 2: watermark still below the close time (10:00 + 30min
      // window + 10min delay = 10:40) — the click stays buffered
      cIn.addData((3L, 9L, t("10:20")))
      pIn.addData((202L, 9L, t("10:25")))
      q.processAllAvailable()
      assert(!rows().exists(r => r._1 == 1L),
        "null row emitted before the watermark closed the window")
      // batch 3: both sides advance past 10:40 (global watermark = min
      // of the two inputs) — NOW the unmatched click flushes, once
      cIn.addData((4L, -1L, t("11:30")))
      pIn.addData((203L, -2L, t("11:30")))
      q.processAllAvailable()
      assert(rows().count(r => r._1 == 1L && r._2.isEmpty) === 1,
        s"expected exactly one null-extended row for click 1, got ${rows()}")
      // batch 4: further batches must not re-emit the closed row
      cIn.addData((5L, -3L, t("12:30")))
      pIn.addData((204L, -4L, t("12:30")))
      q.processAllAvailable()
      assert(rows().count(r => r._1 == 1L) === 1, "closed row re-emitted")
    } finally q.stop()
  }
}
