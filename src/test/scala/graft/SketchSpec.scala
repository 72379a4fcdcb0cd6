package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Sketch

/** Misra-Gries sketch specs: the candidate guarantee under adversarial
  * merge orders, the undercount bound, and the two-pass query's equality
  * with a direct exact groupBy.
  */
class SketchSpec extends AnyFunSuite with SparkSuite {

  // skewed synthetic stream: key i ∈ [0, 40) appears 2^(40-i) / 2^30-ish —
  // a few massive keys, a long light tail
  private def stream: Seq[String] = {
    val rnd = new scala.util.Random(13)
    val heavy = Seq.fill(600)("alpha") ++ Seq.fill(400)("beta") ++
      Seq.fill(150)("gamma")
    val tail = Seq.fill(850)(s"t${rnd.nextInt(500)}")
    rnd.shuffle(heavy ++ tail)
  }

  test("MG summary: bound holds and every theta-heavy key survives any partitioning") {
    import spark.implicits._
    val data = stream
    val n = data.size.toLong
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 19
    for (parts <- Seq(1, 3, 8)) {
      import scala.jdk.CollectionConverters._
      val sum = spark.createDataset(data).repartition(parts)
        .select(new Sketch.MisraGries(k).toColumn).head()
      val counters = sum.counters.asScala
      assert(sum.n === n)
      assert(counters.size <= k)
      counters.foreach { case (key, est) =>
        val ex = exact.getOrElse(key, 0L)
        assert(est <= ex, s"$key overestimated: $est > $ex")
        assert(ex - est <= n / (k + 1), s"$key undercount past n/(k+1)")
      }
      // the guarantee: every key above n/(k+1) is in the candidate set
      exact.filter(_._2 > n / (k + 1)).keys.foreach { key =>
        assert(counters.contains(key),
          s"theta-heavy $key missing at $parts partitions")
      }
    }
  }

  test("heavyHitters equals the exact groupBy answer at any partitioning") {
    import spark.implicits._
    val data = stream
    val n = data.size.toLong
    val thetaInv = 10L
    val floor = (n + thetaInv - 1) / thetaInv
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= floor).toMap
    assert(want.nonEmpty, "vacuous stream")
    for (parts <- Seq(1, 4)) {
      val got = Sketch.heavyHitters(
        spark.createDataset(data).repartition(parts), k = 19, thetaInv = thetaInv)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"answer diverged at $parts partitions")
    }
    // theta at or past the guarantee boundary must be rejected, not
    // silently lossy — at thetaInv = k+1 a key sitting exactly on the
    // inclusive exact-pass threshold can be legally evicted from the sketch
    intercept[IllegalArgumentException] {
      Sketch.heavyHitters(spark.createDataset(data), k = 19, thetaInv = 20)
    }
  }
}
