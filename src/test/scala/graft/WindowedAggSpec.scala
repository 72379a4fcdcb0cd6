package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WindowedAgg

/** ST4 spec: watermarked tumbling windows — finalized windows emit exactly
  * once when the watermark passes them (append mode), rows later than the
  * watermark are dropped deterministically, and still-open windows never
  * reach the sink.
  */
class WindowedAggSpec extends AnyFunSuite with SparkSuite {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("windows finalize once across batches; late rows drop; open windows wait") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val windowed = WindowedAgg.tumblingCounts(
      in.toDF().toDF("ts", "event_type", "value"), "1 hour", "10 minutes")
    val q = windowed.writeStream
      .format("memory").queryName("st4_spec")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
      val h11 = Timestamp.valueOf("2024-01-01 11:00:00").getTime * 1000L
      // batch 1: two rows in the 10:00 window, one in 11:00. The watermark
      // becomes 11:10 - 10m = 11:00, which finalizes EXACTLY the
      // [10:00, 11:00) window (inclusive at window end) — the 11:00 window
      // stays open.
      in.addData((t("10:00"), "a", 1.0), (t("10:30"), "a", 2.0), (t("11:10"), "a", 4.0))
      q.processAllAvailable()
      val afterB1 = spark.table("st4_spec")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(afterB1 === Set((h10, 2L, 3.0)))

      // batch 2: a row far in the future moves the watermark past 10:00 and
      // 11:00; a row at 10:05 is behind the batch-1 watermark (11:10 - 10m
      // = 11:00) and must be DROPPED, not merged into the emitted window
      in.addData((t("23:00"), "a", 8.0), (t("10:05"), "a", 100.0))
      q.processAllAvailable()
      val rows = spark.table("st4_spec")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set((h10, 2L, 3.0), (h11, 1L, 4.0)))

      // the 23:00 window is still open — emitted zero times, not once-early
      assert(!rows.exists(_._1 > h11))
    } finally q.stop()
  }
}
