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
}
