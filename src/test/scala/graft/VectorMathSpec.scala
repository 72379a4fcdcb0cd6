package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.VectorMath
import graft.ops.Similarity

/** [[graft.functions.DotProduct]] spec: the codegen'd dot must be
  * BIT-IDENTICAL to the `aggregate(zip_with(...))` composition it replaced
  * (same left-to-right summation, same null semantics) — oracle hashes for
  * every similarity query depend on it.
  */
class VectorMathSpec extends AnyFunSuite with SparkSuite {

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)

  test("double dot: bit-identical to aggregate(zip_with) on pseudo-random vectors") {
    import spark.implicits._
    // deterministic pseudo-random doubles, incl. negatives and tiny/huge
    // magnitudes so summation order matters
    val rows = (0 until 200).map { i =>
      def v(seed: Int) = Array.tabulate(64) { j =>
        val h = ((i * 1315423911L + seed * 2654435761L + j * 97531L) & 0xffffL).toDouble
        (h - 32768.0) * math.pow(10.0, (j % 7) - 3)
      }
      (v(1), v(2))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics match the higher-order composition exactly") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0)),   // plain: 11.0
      (Array.empty[Double], Array.empty[Double]) // empty: 0.0
    ).toDF("a", "b")
    val both = df.select(Similarity.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(both.map(_.get(0)).toSeq === both.map(_.get(1)).toSeq)
    assert(both.map(_.get(0)).toSeq === Seq(11.0, 0.0))

    // length mismatch and null element -> null (zip_with pads with null,
    // which poisons the interpreted sum); null array -> null
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0d, 2.0d), array(5.0d)),
        |  (array(1.0d, cast(null as double)), array(3.0d, 4.0d)),
        |  (cast(null as array<double>), array(1.0d))
        |AS t(a, b)""".stripMargin)
    val got = edge.select(Similarity.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("long dot: exact integer arithmetic for the n4 prefilter") {
    import spark.implicits._
    val df = Seq((Array(127L, -127L, 3L), Array(2L, 10L, -1L))).toDF("a", "b")
    val got = df.select(VectorMath.fast_dot(col("a"), col("b"))).head
    assert(got.getLong(0) === (254L - 1270L - 3L))
  }

  test("dot participates in whole-stage codegen (no interpreted fallback)") {
    // needs a file scan: in-memory LocalTableScans constant-fold the whole
    // projection and never enter WholeStageCodegen
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb
      .select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; the dot_product projection/filter must carry it
    assert("\\*\\(\\d+\\) (Project|Filter) .*dot_product".r.findFirstIn(plan).isDefined, plan)
    assert(df.count() > 0)
  }
}
