package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for skew and co-location — the techniques a 100 TB run
  * needs beyond what AQE does automatically.
  *
  * Salting: when one join key dominates (a hot day, a hot site), the
  * shuffle partition for that key becomes the straggler. [[saltedJoin]]
  * splits each big-side key into `factor` sub-keys with a deterministic
  * salt (hash-derived — NOT `rand()`, which would break retry determinism
  * and our oracle checks) and replicates the small side across all salts;
  * results are identical to the plain join.
  *
  * Bucketing: [[writeBucketed]] persists a table hash-bucketed by join key
  * so repeated joins on that key skip the shuffle entirely
  * (`SortMergeJoin` over pre-bucketed scans with no `Exchange`).
  */
object Scale {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted `factor`
    * ways. `small` is replicated `factor`× (explode), so keep it the truly
    * small side. Inner joins only (the replicate+match trick would need
    * null-handling care for outer variants).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    // Deterministic per-row salt: spreads a hot key over `factor` reducers.
    // The per-row ordinal is folded into the hash so FULLY IDENTICAL rows
    // (null-key rows, default rows — the most common real skew shape) still
    // spread across all `factor` salts; a content-only hash would send every
    // copy of an identical hot row to ONE salt bucket, defeating the salting.
    // The join result is salt-invariant, so determinism of the salt values
    // themselves is not required for correctness — only the row→salt spread.
    val salted = big.withColumn("__salt", saltExpr(big, factor))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe aggregation: two-phase salt → partial → merge count/sum on
    * a hot key. A direct `groupBy(key)` sends every row of a hot key to one
    * reducer; here the partial aggregate runs on `(key, salt)` — `factor`
    * reducers share the hot key — and the merge handles only
    * `keys × factor` pre-aggregated rows. The value sums go through exact
    * decimal so the two-phase result is bit-identical to a direct
    * aggregation in any engine (double summation order would differ).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, factor: Int): DataFrame =
    // per-row ordinal folded into the salt — see [[saltExpr]]: identical
    // rows must spread, and the merge phase makes the result salt-invariant
    df.withColumn("__salt", saltExpr(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("cnt"),
        sum(col("__s")).cast("double").as("sum_value"))

  /** The salt column shared by [[saltedJoin]] and [[saltedAgg]]: xxhash64
    * over (per-row ordinal, all columns) mod `factor`. The ordinal
    * (`monotonically_increasing_id`) is what spreads FULLY IDENTICAL rows —
    * content-only hashing maps every copy of an identical hot row to one
    * salt, leaving the hot partition exactly as hot as before. Deterministic
    * under task retry (the ordinal is a pure function of partition index +
    * position, unlike `rand()`), and both callers' results are
    * salt-invariant, so layout changes can't affect answers.
    */
  private[graft] def saltExpr(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(monotonically_increasing_id() +: df.columns.map(col).toSeq: _*),
      lit(factor)).cast("int")

  /** Top-N heavy keys of `df` by count — the skew diagnosis step that
    * decides whether salting ([[saltedAgg]]/[[saltedJoin]]) is worth it.
    * Ties broken by key ascending so the limit is deterministic
    * (oracle-checked as `q7_heavy_hitters`).
    */
  def heavyHitters(df: DataFrame, key: String, topN: Int): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(topN)

  /** Persist `df` bucketed by `key` as a table — managed (warehouse) by
    * default, external when `path` is given. Joins between tables bucketed
    * the same way on `key` need no shuffle (`ScaleSpec` pins the
    * no-Exchange plan; `q8_bucketed_join` oracle-checks the round-trip).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    // ONE file per bucket (repartition on the bucket key first): with
    // several input partitions each bucket gets several files, and the
    // reader can then trust only the hash partitioning, not the per-file
    // sort order — the downstream SortMergeJoin re-sorts. One file per
    // bucket lets the scan expose BOTH partitioning and ordering, so the
    // join plans neither Exchange NOR Sort (pinned in ScaleSpec). Spark 3
    // dropped the ordering guarantee by default (SPARK-28595 — several
    // files per bucket made it unsound); a reader that wants the
    // sort-free join over THIS one-file-per-bucket layout opts back in
    // with spark.sql.legacy.bucketedTableScan.outputOrdering=true.
    // The trade this imposes: the write itself shuffles once and runs at
    // `buckets`-task parallelism — so the bucket count IS the write
    // parallelism knob, and a 100 TB table wants hundreds-to-thousands
    // of buckets (also the right granularity for the join), never the
    // single digits a demo uses.
    val w = df.repartition(buckets, col(key)).write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Contiguous `0..n-1` row ids WITHOUT a global sort — the ingest-time
    * id assignment (stable doc_ids for a new corpus shard). The naive
    * `row_number() OVER (ORDER BY …)` funnels 100 TB through one total
    * order; this is the zipWithIndex pattern instead:
    * `monotonically_increasing_id` encodes `(partition << 33) | index`,
    * so per-partition counts (a tiny aggregate — one row per partition)
    * prefix-summed on the driver give each partition its offset, and
    * `offset + index` is contiguous with no data shuffle at all — just a
    * broadcast join against the #partitions-row offset table.
    *
    * Ids are stable for a fixed source layout (file order = partition
    * order); they are an ARTIFACT of layout, not content — callers
    * needing content-determined ids should key on a fingerprint instead.
    */
  def stableIds(df: DataFrame, idCol: String = "row_id"): DataFrame = {
    val spark = df.sparkSession
    val mid = df.withColumn("__mid", monotonically_increasing_id())
    val counts = mid.groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets =
      if (counts.isEmpty) Seq.empty[(Long, Long)]
      else counts.scanLeft((-1L, 0L)) {
        case ((_, acc), (pid, cnt)) => (pid, acc + cnt)
      }.sliding(2).map { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__off")
    mid.withColumn("__pid", shiftright(col("__mid"), 33))
      .join(broadcast(offDf), "__pid")
      .withColumn(idCol, col("__off") + col("__mid").bitwiseAND((1L << 33) - 1))
      .drop("__mid", "__pid", "__off")
  }

  /** Contiguous weighted packing: assign every row a `shard` id so that
    * walking rows in `idCol` order fills shards of ~`target` total
    * `weightCol` each — the training-shard packing step of an LLM data
    * pipeline ("write shards of N tokens each", also tar/webdataset
    * chunking by byte size). A row's shard is
    * `floor(exclusive-prefix-sum(weight) / target)` in id order:
    * deterministic, content-defined, and every shard is a contiguous id
    * range (the property that makes shard manifests resumable).
    *
    * Scale shape: the naive form — one window over the GLOBAL id order —
    * plans a single-partition sort of the corpus, the canonical window
    * scale-killer. Instead the prefix sum is two-level: rows bucket by
    * `idCol div bucketWidth`; per-bucket totals (a map-side-combining agg
    * of #buckets rows) take ONE tiny single-partition window to become
    * exclusive bucket offsets, which broadcast-join back; in-bucket
    * prefix sums run in a window PARTITIONED by bucket. Nothing
    * corpus-sized ever sorts globally — the single-partition step is
    * O(#buckets) rows (size `bucketWidth` so #buckets stays ~1e6 at
    * target scale, still one executor's work).
    */
  def packByWeight(df: DataFrame, idCol: String, weightCol: String,
                   target: Long, bucketWidth: Long = 1000): DataFrame = {
    require(target > 0, "target must be positive")
    prefixSum(df, idCol, weightCol, "__pre", bucketWidth)
      .withColumn("shard", expr(s"__pre div ${target}L"))
      .drop("__pre")
  }

  /** The two-level exclusive prefix sum [[packByWeight]] is built on,
    * exposed: every row gains `outCol` = sum of `weightCol` over all rows
    * with a strictly smaller `idCol` (walked in id order). Same scale
    * shape as documented above — the only single-partition step is the
    * O(#buckets) offset window; the corpus never sorts globally.
    * [[graft.ops.SequencePack]] consumes the raw offsets to cut the
    * concatenated token stream at fixed sequence boundaries.
    */
  def prefixSum(df: DataFrame, idCol: String, weightCol: String,
                outCol: String, bucketWidth: Long = 1000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = org.apache.spark.sql.expressions.Window
    val bucketed = df.withColumn("__bucket", expr(s"$idCol div $bucketWidth"))
    val offsets = bucketed
      .groupBy("__bucket").agg(sum(col(weightCol)).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          w.orderBy("__bucket").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .drop("__btot")
    bucketed.join(broadcast(offsets), "__bucket")
      .withColumn(outCol,
        col("__boff") + coalesce(sum(col(weightCol)).over(
          w.partitionBy("__bucket").orderBy(idCol)
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .drop("__bucket", "__boff")
  }

  /** Hive-style partitioned layout: one directory per distinct
    * `partitionCol` value. The complement of [[writeBucketed]] — bucketing
    * co-locates JOIN keys, directory partitioning makes selective FILTERS
    * free: a predicate on the partition column prunes whole directories at
    * planning time (`PartitionFilters` in the scan), so a 100 TB lake
    * filtered to one day/type/source reads only that slice's files.
    * Partition by low-cardinality, query-selective columns; high
    * cardinality here means millions of tiny files and a listing-bound
    * scan — that axis belongs in bucketing or file-internal sort order
    * (min/max row-group pruning) instead.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
