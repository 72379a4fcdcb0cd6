package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S19 — small-file compaction, the lake-maintenance op every long-lived
  * table needs: streaming sinks and incremental batches accrete files far
  * below the row-group size scans want (the SCALING.md sweep measured the
  * inverse lesson — ONE giant file serializes the scan; thousands of tiny
  * ones drown it in per-file open/footer overhead and, on object stores,
  * per-object request cost). Compaction rewrites a directory into
  * `ceil(totalBytes / targetBytes)` range-clustered files.
  *
  * `repartitionByRange(sortCol)` + `sortWithinPartitions` does double
  * duty: files come out size-targeted AND key-clustered, so every output
  * file covers a disjoint `sortCol` range and parquet min/max stats prune
  * file- and row-group-level on that key — compaction and layout
  * optimization in one pass (the poor man's OPTIMIZE ... ZORDER for the
  * single-key case). One range shuffle of the table, no driver
  * materialization beyond the size listing.
  */
object Compaction {

  /** Rewrite parquet `inDir` into `outDir` as size-targeted, range-
    * clustered files; returns the file count actually written — at most
    * `ceil(totalBytes/targetBytes)`, fewer when range sampling leaves
    * empty partitions (heavy skew / few distinct keys emit no file).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long, sortCol: String): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    // overwrite-mode write into (or OVER — an ancestor outDir recursively
    // deletes the input before the lazy scan reads it) the directory
    // being read would truncate the input mid-scan; the in-place variant
    // is FsOps.compactParquet (same ceil(bytes/target) sizing via the
    // shared parquetBytes listing, hash/coalesce instead of range
    // clustering, staged through a tmp dir + rename). The containment
    // check compares FULLY QUALIFIED forms (review r16): makeQualified
    // resolves scheme/authority and relative paths against the FS
    // default, and URI.normalize collapses '.'/'..' segments, so the
    // same directory spelled two ways can no longer slip past a raw
    // string-prefix test. (Symlinked aliases on a local FS remain the
    // caller's responsibility — no portable resolution exists across
    // Hadoop filesystems.)
    def qualified(p: String): String = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(hp).toUri.normalize().toString
    }
    val inN = qualified(inDir).stripSuffix("/") + "/"
    val outN = qualified(outDir).stripSuffix("/") + "/"
    require(!inN.startsWith(outN) && !outN.startsWith(inN),
      s"inDir ($inDir) and outDir ($outDir) overlap — " +
        "use FsOps.compactParquet for in-place")
    val totalBytes = graft.io.FsOps.parquetBytes(spark, inDir)
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outDir)
    graft.io.FsOps.list(spark, outDir, suffix = ".parquet")
      .count().toInt
  }
}
