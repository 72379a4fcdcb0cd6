package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO — the lake upsert statement (Delta/Iceberg `MERGE INTO t
  * USING s ON keys WHEN MATCHED [AND cond] THEN DELETE / UPDATE, WHEN NOT
  * MATCHED THEN INSERT`) expressed as one full-outer join, completing the
  * write-side lake story next to [[Scd]] (type-2 history), j3's type-1
  * upsert and j10's change-feed derivation.
  *
  * Spark-first shape: ONE key-equi full-outer join between target and the
  * (delta-sized) source + a delta-sized duplicate-key guard aggregate —
  * no driver loop, no per-clause scan. At 100 TB the join shuffles on the
  * merge key (or broadcasts when the delta is small); a production table
  * format would additionally prune target files by the source's key
  * min/max before the join (the s24/q10 dynamic-pruning treatment), which
  * composes with this operator unchanged.
  *
  * Row classification uses PRESENCE FLAGS, not value nullness (the j10
  * lesson: a NULL-valued column on a present row must not reclassify it).
  */
object Merge {

  /** Apply MERGE semantics and return the post-merge target.
    *
    *   - matched AND `deleteWhen`  → row deleted;
    *   - matched                   → target columns replaced per
    *     `updateSet` (absent columns keep their target value);
    *   - source-only               → row inserted per `insertSet` (absent
    *     non-key columns become NULL — same as SQL MERGE's unnamed
    *     insert columns);
    *   - target-only               → row kept unchanged.
    *
    * Contract: non-key column names of `target` and `source` must be
    * disjoint (so `updateSet`/`deleteWhen` expressions can name both
    * sides unambiguously), and `source` must carry at most one row per
    * MATCHED key — several source rows matching one target row is non-
    * deterministic MERGE and fails loudly at execution (the Delta
    * "multiple source rows matched" error, raised whether the duplicate
    * pair updates OR deletes), enforced by a delta-sized count aggregate,
    * never a silent pick. NULL-key source rows never match (SQL equality)
    * and each inserts as its own not-matched row.
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                deleteWhen: Column,
                updateSet: Map[String, Column],
                insertSet: Map[String, Column]): DataFrame = {
    val overlap = (target.columns.toSet -- keys).intersect(source.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"mergeInto: non-key columns present on both sides: ${overlap.mkString(", ")}")
    require(updateSet.keySet.subsetOf(target.columns.toSet -- keys) &&
      insertSet.keySet.subsetOf(target.columns.toSet -- keys),
      "mergeInto: updateSet/insertSet may only assign non-key target columns")

    // duplicate-source-key guard: delta-sized agg joined back on the key.
    // The join back is NULL-SAFE (<=>): a NULL-key source row is a legal
    // not-matched insert under SQL MERGE (NULL never equals a target key)
    // and must not vanish through a null-unsafe self-join (review r18)
    val srcCnt = source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__nsrc"))
      // rename the count side's keys: groupBy preserves attribute ids, so
      // an unaliased self-join condition would resolve both sides to the
      // SAME attribute (Spark's trivially-true self-join trap)
      .select(keys.map(k => col(k).as(s"__cnt_$k")) :+ col("__nsrc"): _*)
    val s = source.join(srcCnt,
      keys.map(k => col(k) <=> col(s"__cnt_$k")).reduce(_ && _))
      .drop(keys.map(k => s"__cnt_$k"): _*)
      .withColumn("__in_s", lit(1))
    val t = target.withColumn("__in_t", lit(1))

    val j = t.join(s, keys, "full_outer")
    val matched = col("__in_t").isNotNull && col("__in_s").isNotNull
    val sourceOnly = col("__in_t").isNull
    // the dup error fires only for MATCHED rows (Delta's "multiple source
    // rows matched"): several NULL-key source rows, or several rows for a
    // key absent from the target, are each their own legal insert
    val dupError = raise_error(concat(
      lit("mergeInto: multiple source rows matched key "),
      concat_ws(",", keys.map(k => col(k).cast("string")): _*)))
    // the guard rides INSIDE the first key's projection (a standalone
    // guard column would be pruned by Catalyst before it could fire)
    val guardedHead = when(matched && col("__nsrc") > 1, dupError)
      .otherwise(col(keys.head)).as(keys.head)

    val nonKey = target.columns.filterNot(keys.contains)
    val projected = (guardedHead +: keys.tail.map(col)) ++ nonKey.map { c =>
      when(sourceOnly, insertSet.getOrElse(c, lit(null)))
        .when(matched, updateSet.getOrElse(c, col(c)))
        .otherwise(col(c)).as(c)
    }

    // NULL deleteWhen on a matched row must mean "not deleted", not a
    // three-valued filter drop of the row. The dup guard ALSO rides the
    // delete predicate (review r18): a duplicate pair whose copies all
    // satisfy deleteWhen would otherwise be filtered away before the
    // projection guard could ever evaluate — a silent delete where the
    // contract promises a loud error
    val guardedDelete = when(matched && col("__nsrc") > 1, dupError.isNotNull)
      .otherwise(coalesce(deleteWhen, lit(false)))
    j.filter(!(matched && guardedDelete))
      .select(projected: _*)
  }
}
