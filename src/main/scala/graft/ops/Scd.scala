package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 merge — dimension history tracking, the warehouse-side
  * sibling of [[graft.ops.Unembargo]]'s type-1 upsert (J3): instead of
  * overwriting a changed dimension row, the current version is CLOSED
  * (`valid_to` = batch day) and the new value appended as the open
  * version (`valid_from` = batch day), so every fact can join the
  * dimension AS OF its own date (j5's as-of join is the read side of
  * this table).
  *
  * Spark-first shape: one key-equi left-outer join of the OPEN slice
  * against the (dimension-sized) update batch + one anti-join for
  * first-appearance keys — closed history never reshuffles (it unions
  * through untouched), so a daily merge costs the open slice + the
  * batch, not the accumulated history. At 100 TB the open slice and
  * updates hash-join on the key; closed rows are append-only storage.
  *
  * `OpenSentinel` (99999999, an impossible yyyymmdd) marks open rows
  * instead of NULL so downstream interval predicates (`day < valid_to`)
  * and cross-engine hash grading need no three-valued-logic special
  * cases.
  */
object Scd {

  val OpenSentinel = 99999999

  /** Apply one update batch. `current` must carry `key`, `value`,
    * `valid_from`, `valid_to`; `updates` carries `key`, `value` (the new
    * absolute value per key). Keys whose open value differs are closed at
    * `day` and re-opened with the new value; identical values are
    * no-ops; keys never seen before open their first version at `day`.
    */
  def applyBatch(current: DataFrame, updates: DataFrame, day: Int): DataFrame = {
    // A NULL valid_to is malformed input (the sentinel, not NULL, marks
    // open rows) — and under plain =!=/=== filters such a row would
    // satisfy NEITHER slice below and silently vanish from history.
    // Fail loudly at execution instead of dropping data.
    val guarded = current.withColumn("valid_to",
      when(col("valid_to").isNull,
        raise_error(concat(lit("NULL valid_to in SCD dimension for key "),
          col("key").cast("string"))))
        .otherwise(col("valid_to")))
    val closedHistory = guarded.filter(col("valid_to") =!= OpenSentinel)
    val open = guarded.filter(col("valid_to") === OpenSentinel)
    // One update row per key is the contract; exact duplicates collapse
    // harmlessly, CONFLICTING values for a key fail loudly at execution
    // (a silent pick would fan the open slice out into several open
    // versions per key and corrupt history from then on). A batch mixing
    // NULL ("no change") and a value ("change") for one key is the same
    // conflict of intents — countDistinct alone misses it (NULLs don't
    // count), so NULL presence is tracked explicitly. All-NULL for a key
    // stays a plain no-op. The aggregate is batch-sized — a delta, not
    // the dimension.
    val up = updates.groupBy(col("key"))
      .agg(min(col("value")).as("__new"),
        countDistinct(col("value")).as("__nv"),
        max(col("value").isNull.cast("int")).as("__anyNull"))
      .select(col("key"),
        when(col("__nv") > 1 || (col("__nv") === 1 && col("__anyNull") === 1),
          raise_error(concat(lit("conflicting SCD update values for key "),
            col("key").cast("string"))))
          .otherwise(col("__new")).as("__new"))
    val joined = open.join(up, Seq("key"), "left_outer")
    // unchanged: no update for the key, or the update carries the same
    // value — compared NULL-SAFELY, so a NULL-valued open row neither
    // vanishes nor spuriously re-versions (a NULL update value means
    // "no change" for existing keys, matching the left-outer miss case)
    val unchanged = joined
      .filter(col("__new").isNull || (col("__new") <=> col("value")))
      .drop("__new")
    val changed = joined
      .filter(col("__new").isNotNull && !(col("__new") <=> col("value")))
    val closedNow = changed
      .select(col("key"), col("value"), col("valid_from"),
        lit(day).as("valid_to"))
    val reopened = changed
      .select(col("key"), col("__new").as("value"),
        lit(day).as("valid_from"), lit(OpenSentinel).as("valid_to"))
    val firstSeen = up.join(open.select("key"), Seq("key"), "left_anti")
      // NULL means "no change" — for a never-seen key there is nothing
      // to not-change, so it opens no version (consistent with the
      // existing-key no-op above)
      .filter(col("__new").isNotNull)
      .select(col("key"), col("__new").as("value"),
        lit(day).as("valid_from"), lit(OpenSentinel).as("valid_to"))
    closedHistory
      .unionByName(unchanged)
      .unionByName(closedNow)
      .unionByName(reopened)
      .unionByName(firstSeen)
  }
}
