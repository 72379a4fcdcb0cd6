package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd

/** J9 SCD type-2 merge semantics the graded closed-form oracle cannot
  * reach: no-op updates (same value must NOT spawn a version), first
  * appearance of a key mid-history, and the untouched-key passthrough.
  */
class ScdSpec extends AnyFunSuite with SparkSuite {
  import Scd.OpenSentinel

  private def dim(rows: (Long, Double, Int, Int)*) = {
    import spark.implicits._
    rows.toDF("key", "value", "valid_from", "valid_to")
  }

  private def ups(rows: (Long, Double)*) = {
    import spark.implicits._
    rows.toDF("key", "value")
  }

  private def collectAll(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getInt(2), r.getInt(3))).toSet

  test("changed value closes the open version and opens a new one") {
    val out = collectAll(Scd.applyBatch(
      dim((1L, 10.0, 1, OpenSentinel)), ups((1L, 20.0)), day = 5))
    assert(out === Set((1L, 10.0, 1, 5), (1L, 20.0, 5, OpenSentinel)))
  }

  test("no-op update spawns no version; untouched keys pass through") {
    val cur = dim((1L, 10.0, 1, OpenSentinel), (2L, 7.0, 1, OpenSentinel))
    val out = collectAll(Scd.applyBatch(cur, ups((1L, 10.0)), day = 5))
    assert(out === Set((1L, 10.0, 1, OpenSentinel), (2L, 7.0, 1, OpenSentinel)),
      "an identical value or an absent key must leave history untouched")
  }

  test("first-seen key opens its initial version at the batch day") {
    val out = collectAll(Scd.applyBatch(
      dim((1L, 10.0, 1, OpenSentinel)), ups((9L, 3.0)), day = 4))
    assert(out === Set((1L, 10.0, 1, OpenSentinel), (9L, 3.0, 4, OpenSentinel)))
  }

  test("identical duplicate updates collapse; conflicting ones fail loudly") {
    val cur = dim((1L, 10.0, 1, OpenSentinel))
    val ok = collectAll(Scd.applyBatch(cur,
      ups((1L, 20.0), (1L, 20.0)), day = 2))
    assert(ok === Set((1L, 10.0, 1, 2), (1L, 20.0, 2, OpenSentinel)),
      "exact-duplicate update rows must collapse to one version")
    val e = intercept[Exception] {
      Scd.applyBatch(cur, ups((1L, 20.0), (1L, 30.0)), day = 2).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("conflicting"))),
      s"expected a loud conflicting-values failure, got: $e")
  }

  test("NULL-valued rows and updates follow the no-change convention") {
    // a NULL-valued open row must neither vanish nor re-version on a
    // matching same-key update carrying NULL; a NULL update on a
    // never-seen key opens nothing
    import spark.implicits._
    val cur = Seq((1L, Option.empty[Double], 1, OpenSentinel))
      .toDF("key", "value", "valid_from", "valid_to")
    val up = Seq((1L, Option.empty[Double]), (9L, Option.empty[Double]))
      .toDF("key", "value")
    val out = Scd.applyBatch(cur, up, day = 3).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2), r.getInt(3))).toSet
    assert(out === Set((1L, None, 1, OpenSentinel)))
  }

  test("malformed dimension (NULL valid_to) fails loudly instead of dropping rows") {
    // under plain =!=/=== slicing a NULL valid_to row satisfies NEITHER
    // slice and would silently vanish from history — it must raise
    import spark.implicits._
    val cur = Seq((1L, Some(10.0), Some(1), Option.empty[Int]))
      .toDF("key", "value", "valid_from", "valid_to")
    val e = intercept[Exception] {
      Scd.applyBatch(cur, ups((1L, 20.0)), day = 5).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("NULL valid_to"))),
      s"expected a loud NULL-valid_to failure, got: $e")
  }

  test("a batch mixing NULL and a value for one key is a conflict, not a silent pick") {
    import spark.implicits._
    val cur = dim((1L, 10.0, 1, OpenSentinel))
    val up = Seq((1L, Option.empty[Double]), (1L, Some(20.0)))
      .toDF("key", "value")
    val e = intercept[Exception] {
      Scd.applyBatch(cur, up, day = 2).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("conflicting"))),
      s"expected NULL+value mix to fail as a conflict, got: $e")
  }

  test("property: random batch chains equal a sequential reference (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // day-1 load of keys 1-5; later batches may also introduce keys 6-8.
    // Small value domain on purpose: collisions make no-op updates and
    // repeat values common, exercising every merge arm.
    var model = (1L to 5L).map(k =>
      k -> Vector((k.toDouble, 1, OpenSentinel))).toMap
    var cur = dim((1L to 5L).map(k => (k, k.toDouble, 1, OpenSentinel)): _*)
    for (day <- 2 to 7) {
      val batch = (1L to 8L).filter(_ => rnd.nextBoolean())
        .map(k => k -> rnd.nextInt(4).toDouble).toMap
      cur = Scd.applyBatch(cur,
        ups(batch.toSeq.sortBy(_._1): _*), day).localCheckpoint()
      batch.foreach { case (k, v) =>
        model.get(k) match {
          case None => model += k -> Vector((v, day, OpenSentinel))
          case Some(vers) =>
            val (ov, of, _) = vers.last
            if (ov != v)
              model += k -> (vers.init :+ ((ov, of, day)) :+
                ((v, day, OpenSentinel)))
        }
      }
    }
    val want = model.toSeq.flatMap { case (k, vers) =>
      vers.map { case (v, f, t) => (k, v, f, t) }
    }.toSet
    assert(collectAll(cur) === want)
    // invariant: exactly one open version per ever-seen key
    val opens = cur.filter(col("valid_to") === OpenSentinel)
      .select("key").collect().map(_.getLong(0)).toSeq
    assert(opens.sorted === opens.distinct.sorted.sorted &&
      opens.toSet === model.keySet)
  }

  test("chained merges close-then-close; closed history never reshapes") {
    val d1 = dim((1L, 10.0, 1, OpenSentinel))
    val d2 = Scd.applyBatch(d1, ups((1L, 20.0)), day = 2)
    val d3 = Scd.applyBatch(d2, ups((1L, 30.0)), day = 3)
    assert(collectAll(d3) === Set(
      (1L, 10.0, 1, 2), (1L, 20.0, 2, 3), (1L, 30.0, 3, OpenSentinel)))
    // exactly one open version per key, intervals telescope
    val open = d3.filter(col("valid_to") === OpenSentinel).count()
    assert(open === 1L)
  }
}
