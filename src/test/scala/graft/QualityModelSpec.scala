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

  test("past maxFitRows the fit samples deterministically; gate matches the full fit") {
    import spark.implicits._
    // a separable-with-noise corpus: y depends on x1 with a band of
    // exceptions, so the fit has real structure to recover
    val rows = (0 until 2000).map { i =>
      val x1 = (i * 37L) % 10000L
      val x2 = (i * 61L) % 10000L
      val y = if (x1 >= 5000L ^ (i % 17 == 0)) 1L else 0L
      (QualityModel.FeatScale, x1, x2, y)
    }
    val df = rows.toDF("x0", "x1", "x2", "y")
    val cols = Seq("x0", "x1", "x2")
    val full = QualityModel.quantize(QualityModel.fitLpm(df, cols, "y"))
    // force the sampled path: 2000 rows against a 500-row bound → mod 4
    val samp = QualityModel.quantize(
      QualityModel.fitLpm(df, cols, "y", maxFitRows = 500L))
    val samp2 = QualityModel.quantize(
      QualityModel.fitLpm(df, cols, "y", maxFitRows = 500L))
    assert(samp.toSeq === samp2.toSeq, "sampled fit is not deterministic")
    def gate(w: Array[Long]) = rows.map { case (x0, x1, x2, _) =>
      w(0) * x0 + w(1) * x1 + w(2) * x2 >= QualityModel.Half
    }
    val (gf, gs) = (gate(full), gate(samp))
    val agree = gf.zip(gs).count { case (a, b) => a == b }
    assert(agree >= 1900, s"sample-fitted gate agrees on only $agree/2000")
    assert(gs.contains(true) && gs.contains(false), "one-sided sampled gate")
  }
}
