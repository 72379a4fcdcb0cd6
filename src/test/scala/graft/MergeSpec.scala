package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

/** J11 MERGE INTO semantics the graded oracle cannot isolate: the
  * duplicate-source-key loud failure, presence-flag classification when a
  * matched row carries NULL values, NULL deleteWhen, and the
  * unnamed-insert-column NULL default.
  */
class MergeSpec extends AnyFunSuite with SparkSuite {

  private def target = {
    import spark.implicits._
    Seq((1L, Option(10.0), "a"), (2L, Option(20.0), "b"),
      (3L, Option.empty[Double], "c"), (4L, Option(40.0), "d"))
      .toDF("k", "bal", "seg")
  }

  private def collectAll(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet

  test("update, delete, insert and passthrough branches classify by presence, not value") {
    import spark.implicits._
    // k=3 is matched with a NULL target value — must still UPDATE (j10
    // lesson: presence flags, never value nullness); k=2 deletes; k=9
    // inserts; k=1/k=4 pass through untouched (k=1 has no source row)
    val src = Seq((2L, 99.0, true), (3L, 5.0, false), (9L, 7.0, false))
      .toDF("k", "delta", "churn")
    val out = Merge.mergeInto(target, src, Seq("k"),
      deleteWhen = col("churn"),
      updateSet = Map("bal" -> (coalesce(col("bal"), lit(0.0)) + col("delta"))),
      insertSet = Map("bal" -> col("delta")))
    assert(collectAll(out) === Set(
      (1L, Some(10.0), Some("a")),
      (3L, Some(5.0), Some("c")),
      (4L, Some(40.0), Some("d")),
      (9L, Some(7.0), None))) // unnamed insert column -> NULL, SQL MERGE default
  }

  test("NULL deleteWhen on a matched row keeps the row (no three-valued drop)") {
    import spark.implicits._
    val src = Seq((2L, 1.0, Option.empty[Boolean])).toDF("k", "delta", "churn")
    val out = Merge.mergeInto(target, src, Seq("k"),
      deleteWhen = col("churn"),
      updateSet = Map("bal" -> (col("bal") + col("delta"))),
      insertSet = Map.empty)
    assert(out.count() === 4L)
    assert(collectAll(out).contains((2L, Some(21.0), Some("b"))))
  }

  test("several source rows matching one key fail loudly, never a silent pick") {
    import spark.implicits._
    val src = Seq((2L, 1.0, false), (2L, 2.0, false)).toDF("k", "delta", "churn")
    val out = Merge.mergeInto(target, src, Seq("k"),
      deleteWhen = col("churn"),
      updateSet = Map("bal" -> col("delta")), insertSet = Map.empty)
    val e = intercept[Exception](out.collect())
    assert(e.getMessage.contains("multiple source rows matched"))
  }

  test("duplicate matched keys fail loudly even when every copy would DELETE") {
    import spark.implicits._
    // review r18: the delete filter must not discard the duplicate pair
    // before the guard can evaluate — a silent delete where the contract
    // promises the 'multiple source rows matched' error
    val src = Seq((2L, 1.0, true), (2L, 2.0, true)).toDF("k", "delta", "churn")
    val out = Merge.mergeInto(target, src, Seq("k"),
      deleteWhen = col("churn"),
      updateSet = Map("bal" -> col("delta")), insertSet = Map.empty)
    val e = intercept[Exception](out.collect())
    assert(e.getMessage.contains("multiple source rows matched"))
  }

  test("NULL-key source rows insert as their own not-matched rows, never dropped or dup-flagged") {
    import spark.implicits._
    val src = Seq((Option(9L), 7.0, false), (Option.empty[Long], 1.0, false),
      (Option.empty[Long], 2.0, false)).toDF("k", "delta", "churn")
    val out = Merge.mergeInto(target, src, Seq("k"),
      deleteWhen = col("churn"),
      updateSet = Map("bal" -> col("delta")),
      insertSet = Map("bal" -> col("delta")))
    // 4 target rows + k=9 insert + TWO independent NULL-key inserts
    assert(out.count() === 7L)
    val nulls = out.filter(col("k").isNull).collect()
      .map(_.getDouble(1)).sorted
    assert(nulls.toSeq === Seq(1.0, 2.0))
  }

  test("overlapping non-key column names are rejected up front") {
    import spark.implicits._
    val src = Seq((2L, 1.0)).toDF("k", "bal")
    val e = intercept[IllegalArgumentException](
      Merge.mergeInto(target, src, Seq("k"),
        deleteWhen = lit(false), updateSet = Map.empty, insertSet = Map.empty))
    assert(e.getMessage.contains("non-key columns present on both sides"))
  }
}
