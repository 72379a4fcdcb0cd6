package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QualityModel

/** T24 fit semantics the per-doc oracle cannot articulate: the
  * closed-form LPM actually LEARNS (recovers a separable rule it was
  * never told), and the integer-exact aggregation makes the fit
  * partitioning-independent.
  */
class QualityModelSpec extends AnyFunSuite with SparkSuite {

  test("closed-form fit recovers a separable linear rule, flags fire both ways") {
    import spark.implicits._
    // y = 1 iff x1 >= 5000 — a rule in feature space; the fit sees only
    // (features, label) pairs and must separate them
    val rows = (0 until 100).map { i =>
      val x1 = i * 100L
      (QualityModel.FeatScale, x1, if (x1 >= 5000L) 1L else 0L)
    }
    val df = rows.toDF("x0", "x1", "y")
    val w = QualityModel.quantize(
      QualityModel.fitLpm(df, Seq("x0", "x1"), "y", ridge = 1.0))
    def z(x1: Long) = w(0) * QualityModel.FeatScale + w(1) * x1
    val pred = rows.map { case (_, x1, _) => z(x1) >= QualityModel.Half }
    val want = rows.map(_._3 == 1L)
    val agree = pred.zip(want).count { case (a, b) => a == b }
    assert(agree >= 95, s"fit separates only $agree/100")
    assert(pred.contains(true) && pred.contains(false), "one-sided gate")
  }

  test("fit is partitioning-independent (integer-valued sums are exact)") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (QualityModel.FeatScale, (i * 37L) % 10000L, (i * 61L) % 10000L,
        if (i % 3 == 0) 1L else 0L)
    }
    val cols = Seq("x0", "x1", "x2")
    val w1 = QualityModel.quantize(QualityModel.fitLpm(
      rows.toDF("x0", "x1", "x2", "y").repartition(1), cols, "y"))
    val w32 = QualityModel.quantize(QualityModel.fitLpm(
      rows.toDF("x0", "x1", "x2", "y").repartition(32, col("x1")), cols, "y"))
    assert(w1.toSeq === w32.toSeq,
      "quantized weights changed under a different partitioning")
  }
}
