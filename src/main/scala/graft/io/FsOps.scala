package graft.io

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** S1-S3, S9-S11 — object-catalog operations
  * (`/root/reference/gcs_operations.go`), expressed over Hadoop
  * [[FileSystem]] so the same code drives posix, HDFS, or cloud object
  * stores. Listing returns a DataFrame (the catalog is data); the
  * copy/delete/mkdir calls are filesystem utilities with no query
  * semantics, exactly as in the reference.
  */
object FsOps {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S1/S2 — list objects under a prefix (S2 = empty suffix filter), as a
    * DataFrame of (name, size). Mirrors the paginated
    * `GetFileNamesFromBucket` (`/root/reference/gcs_operations.go:58-85`).
    *
    * Routed through the `binaryFile` metadata columns (content pruned away,
    * never read) instead of a driver-materialized `listStatus` array: the
    * catalog scan uses Spark's file index — parallel listing above the
    * discovery threshold, suffix pushed down as the path glob — so a
    * million-object prefix is a distributed scan, not a driver OOM.
    * Spark's scan convention skips `_`/`.`-prefixed (hidden) files, which
    * is also the reference's GCS-object behavior for our outputs.
    *
    * The listing is deliberately UNORDERED: its main consumers
    * ([[syncCopy]]/[[compare]]/`promoteDay`) feed joins that hash-partition
    * anyway, so a global sort here would be a full exchange paid on every
    * catalog access. Display consumers that want the reference's
    * lexicographic page order sort at the edge (`s2_bucket_list`).
    */
  def list(spark: SparkSession, dir: String, suffix: String = "",
           recursive: Boolean = false): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*" + suffix)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length").as("size"))

  /** S3 — download one object's bytes (`/root/reference/embargo.go:283`). */
  def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val in = fs(spark, path).open(p)
    try in.readAllBytes() finally in.close()
  }

  /** S9 — copy an object (server-side where the FS supports it;
    * `/root/reference/unembargo.go:124-130`).
    */
  def copy(spark: SparkSession, src: String, dst: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    FileUtil.copy(fs(spark, src), new Path(src), fs(spark, dst), new Path(dst),
      false, true, conf)
  }

  /** S9 at fleet scale — copy every `name` in `names` from `srcDir` to
    * `dstDir` (overwrite), distributed: the copy plan stays a DataFrame and
    * each task copies its slice with the session's Hadoop conf. This is the
    * data-motion half of promote/sync — the reference's serial page loop
    * (`/root/reference/unembargo.go:104-137`) parallelized.
    */
  def copyAll(spark: SparkSession, names: DataFrame, srcDir: String,
              dstDir: String): Unit = {
    val sconf = new SerializableHadoopConf(bridge.sessionHadoopConf(spark))
    names.select("name").foreachPartition { rows: Iterator[Row] =>
      val conf = sconf.value
      val src = new Path(srcDir)
      val dst = new Path(dstDir)
      val sfs = src.getFileSystem(conf)
      val dfs = dst.getFileSystem(conf)
      rows.foreach { r =>
        val n = r.getString(0)
        FileUtil.copy(sfs, new Path(src, n), dfs, new Path(dst, n), false, true, conf)
      }
    }
  }

  /** J2 at the object level — `SyncTwoBuckets`
    * (`/root/reference/gcs_operations.go:200-266`): copy the objects present
    * under `srcDir` but missing under `dstDir` (existing objects are left
    * untouched, as in the reference). Returns the number copied. The
    * missing-set is the listing anti-join; the copies are distributed.
    */
  def syncCopy(spark: SparkSession, srcDir: String, dstDir: String): Long = {
    mkdirs(spark, dstDir)
    val missing = list(spark, srcDir).select("name")
      .join(list(spark, dstDir).select("name"), Seq("name"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = missing.count()
      copyAll(spark, missing, srcDir, dstDir)
      n
    } finally missing.unpersist()
  }

  /** J4 at the object level — `CompareBuckets`
    * (`/root/reference/gcs_operations.go:269-337`): true iff the two
    * prefixes hold identical (name, size) sets, via symmetric difference.
    */
  def compare(spark: SparkSession, dirA: String, dirB: String): Boolean = {
    val a = list(spark, dirA)
    val b = list(spark, dirB)
    a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty
  }

  /** S10 — delete every object under a prefix
    * (`/root/reference/gcs_operations.go:87-128`).
    */
  def deletePrefix(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).delete(new Path(dir), true)

  /** S11 — idempotent bucket/dir create
    * (`/root/reference/gcs_operations.go:36-55`).
    */
  def mkdirs(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).mkdirs(new Path(dir))

  /** Compact a parquet directory's files toward `targetBytes` each —
    * the small-file remedy. Streaming sinks, per-day ingests and
    * fine-grained partitioning all accrete files far below the ideal
    * scan unit; at lake scale the LISTING becomes the bottleneck (every
    * query pays file-count × metadata round-trip) and each task reads a
    * sliver. Rewrites through `repartition` (even output sizes; pass
    * `shuffle = false` for a `coalesce` that skips the exchange when the
    * input is not skewed), then swaps directories.
    *
    * The delete+rename swap is NOT atomic — concurrent readers can catch
    * the gap. That is inherent to bare-directory layouts (the reference's
    * own overwrite semantics, `/root/reference/unembargo.go:115-130`);
    * table formats fix it with a metadata pointer swap, and this op slots
    * under one (compact, then commit the new file list).
    *
    * Returns the output file count.
    */
  /** Total bytes of the parquet data files under `dir` — the shared size
    * listing behind both compaction variants ([[compactParquet]] and
    * [[graft.ops.Compaction.compact]]), so their `ceil(bytes/target)`
    * file-count arithmetic can never drift apart on what "bytes" means
    * (data files only; _SUCCESS/metadata excluded).
    */
  def parquetBytes(spark: SparkSession, dir: String): Long = {
    // List what the READER reads: every non-hidden file, recursively
    // (partitioned layouts nest data files under key=value dirs), with
    // NO name filter — `spark.read.parquet` does not filter on '.parquet'
    // either, so a dir mixing '*.parquet' and renamed data files must
    // size ALL of them or the ceil(bytes/target) arithmetic downstream
    // drifts from the bytes actually rewritten (review r16: the earlier
    // '*.parquet' glob sized only the matching sliver and compacted the
    // rest into it). Distributed listing via the binaryFile file index;
    // Spark's scan convention prunes '_'/'.'-hidden files and dirs.
    val viaListing = list(spark, dir, suffix = "", recursive = true)
      .agg(coalesce(sum(col("size")), lit(0L))).collect()(0).getLong(0)
    if (viaListing > 0L) viaListing
    else {
      // Fallback: a directory holding nothing but zero-length files
      // (which binaryFile listings skip) must not error the listing.
      // Walk the FileSystem directly, pruning hidden names at
      // EVERY level (Spark's own convention: a '_'/'.' prefix marks
      // metadata, and Spark skips such DIRECTORIES too — a flat
      // listFiles would count a crashed write's _temporary leftovers
      // that Spark reads as empty).
      val f = fs(spark, dir)
      def walk(p: Path): Long = f.listStatus(p).map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else st.getLen
      }.sum
      walk(new Path(dir))
    }
  }

  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L << 20,
                     shuffle: Boolean = true): Int = {
    val f = fs(spark, dir)
    val size = parquetBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(size.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val compacted = if (shuffle) df.repartition(nFiles) else df.coalesce(nFiles)
    val tmp = dir.stripSuffix("/") + ".compact-tmp"
    compacted.write.mode("overwrite").parquet(tmp)
    f.delete(new Path(dir), true)
    f.rename(new Path(tmp), new Path(dir))
    nFiles
  }
}
