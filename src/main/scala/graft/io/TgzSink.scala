package graft.io

import java.io.OutputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.graft.bridge

import graft.model.Schemas

/** S7/S8 — the tar.gz repack sink (`/root/reference/embargo.go:104-122,
  * 143-218`): for every input archive, write one public and one private
  * `.tgz`, the private copy renamed `.tgz` → `-e.tgz`
  * (`/root/reference/embargo.go:105`).
  *
  * Spark-first shape: a `foreachPartition` writer over routed entry rows.
  * [[TgzSource]] produces each archive's entries contiguously and in order
  * inside one task, so the whole split pipeline
  * (scan → explode → route → repack) runs shuffle-free: this sink just
  * consumes consecutive runs of rows per archive and keeps two tar writers
  * (public/private) open at a time, exactly the reference's write loop but
  * parallel across archives.
  *
  * Entries stream through the writers one at a time — output is written via
  * Hadoop [[org.apache.hadoop.fs.FileSystem]] streams (posix/HDFS/cloud),
  * never buffered whole in memory (the reference's `bytes.Buffer` pair held
  * both output archives in RAM, `/root/reference/embargo.go:126-146`).
  *
  * Output is published with a write-tmp-then-commit protocol: every task
  * writes `outDir/_tmp/<final>.p<partition>.a<attempt>`, and when ALL its
  * writers have closed cleanly it marks each staged file complete by
  * renaming it to `....done` — the success record a bare attempt id cannot
  * provide. Commit considers ONLY marked files: a task that died mid-write
  * (or a speculative attempt killed after a slower-but-complete sibling
  * finished) leaves unmarked debris that can never beat a complete file,
  * regardless of attempt-id order. A final name marked by two DIFFERENT
  * partitions means the caller broke the per-archive contiguity contract
  * (e.g. a repartition split an archive across tasks) — the commit fails
  * fast instead of letting the second writer silently clobber the first.
  * Two marked attempts of the SAME partition are duplicate successes
  * (retry after a lost heartbeat, speculation) writing identical content;
  * the latest is picked for determinism.
  *
  * Marking and publishing are rename-based only where rename is atomic
  * (posix/HDFS); on object-store schemes the sink switches to the
  * rename-free [[CopyCommit]] protocol (marker PUT + copy-then-verify) —
  * see [[CommitProtocol]].
  */
object TgzSink {

  private val TmpDir = "_tmp"
  private val DoneSuffix = ".done"

  /** Write `(archive × route)` tgz pairs under `outDir`.
    *
    * `routed` must have columns `archive, ordinal, name, size, mode, modTime,
    * typeflag, content, route` with each archive's rows contiguous and
    * ordinal-ascending within a partition — true by construction for
    * `TgzSource.entries → route` pipelines (narrow ops only). Interleaved
    * archives fail inside the task; an archive split across partitions
    * fails at commit (see class doc) — never silent corruption.
    *
    * Output names: `<archiveBasename>` for the public half,
    * `<archiveBasename>` with `.tgz` → `-e.tgz` for the private half.
    */
  def writeSplit(routed: Dataset[Row], outDir: String): Unit =
    writeSplit(routed, outDir,
      CommitProtocol.forPath(outDir,
        bridge.sessionHadoopConf(routed.sparkSession)))

  /** [[writeSplit]] with an explicit commit protocol — the no-arg overload
    * picks [[CopyCommit]] automatically for object-store schemes.
    */
  def writeSplit(routed: Dataset[Row], outDir: String,
                 protocol: CommitProtocol): Unit = {
    val spark = routed.sparkSession
    // session conf captured ONCE on the driver and shipped — a fresh
    // `new Configuration()` in the task would drop spark.hadoop.* settings
    // (object-store credentials, fs impls) and silently write elsewhere
    val sconf = new SerializableHadoopConf(bridge.sessionHadoopConf(spark))
    val out = new Path(outDir)
    val tmp = new Path(out, TmpDir)
    val driverFs = out.getFileSystem(sconf.value)
    driverFs.delete(tmp, true) // stale tmp from a failed prior run
    driverFs.mkdirs(tmp)

    routed.foreachPartition { rows: Iterator[Row] =>
      val conf = sconf.value
      val fs = new Path(outDir).getFileSystem(conf)
      val tmpDir = new Path(new Path(outDir), TmpDir)
      val tc = TaskContext.get()
      val taskSuffix = s".p${tc.partitionId()}.a${tc.taskAttemptId()}"
      val closed = scala.collection.mutable.HashSet.empty[String]
      val stagedNames = scala.collection.mutable.ArrayBuffer.empty[String]
      var current: String = null
      var lastOrdinal = Long.MinValue
      var pub: TarWriter = null
      var priv: TarWriter = null

      def closeCurrent(): Unit = if (current != null) {
        pub.close(); priv.close()
        closed += current
        current = null
      }

      rows.foreach { r =>
        val archive = r.getAs[String]("archive")
        val ordinal = r.getAs[Long]("ordinal")
        if (archive != current) {
          closeCurrent()
          require(!closed.contains(archive),
            s"entries for $archive are not contiguous — pipeline introduced a shuffle")
          current = archive
          lastOrdinal = Long.MinValue
          val base = archive.substring(archive.lastIndexOf('/') + 1)
          // S8 rename (/root/reference/embargo.go:105)
          val privName = base.replace(".tgz", "-e.tgz")
          stagedNames += base + taskSuffix
          stagedNames += privName + taskSuffix
          pub = new TarWriter(fs.create(new Path(tmpDir, base + taskSuffix), true))
          priv = new TarWriter(fs.create(new Path(tmpDir, privName + taskSuffix), true))
        }
        require(ordinal > lastOrdinal,
          s"entries for $archive are out of order at ordinal $ordinal — caller reordered rows")
        lastOrdinal = ordinal
        val w = if (r.getAs[String]("route") == Schemas.RoutePublic) pub else priv
        w.write(r)
      }
      closeCurrent()
      // every writer closed cleanly — mark this attempt's files complete so
      // commit can tell them from the debris of attempts that died mid-write.
      // RenameCommit marks by renaming the data file itself (atomic on
      // posix/HDFS); CopyCommit never renames — it PUTs a one-byte
      // `.done` marker beside the data file (atomic single-object PUT).
      stagedNames.foreach { n =>
        protocol match {
          case RenameCommit =>
            if (!fs.rename(new Path(tmpDir, n), new Path(tmpDir, n + DoneSuffix)))
              throw new java.io.IOException(s"failed to mark staged file $n complete")
          case CopyCommit =>
            val m = fs.create(new Path(tmpDir, n + DoneSuffix), true)
            // non-empty on purpose: the commit election lists the staging
            // dir through Spark's file index, which prunes zero-length
            // files — an empty marker would be invisible to it
            m.write('k'); m.close()
        }
      }
    }

    commit(spark, outDir, sconf, protocol)
  }

  /** Publish `_tmp` outputs: consider only `.done`-marked files (attempts
    * whose task closed every writer — unmarked files are mid-write debris
    * and are dropped with the staging dir), fail on any final name marked
    * by two distinct partitions, keep the latest marked attempt per final
    * name, rename winners into place (overwriting prior runs' outputs).
    *
    * The staging catalog is DATA: the listing is a distributed `binaryFile`
    * METADATA scan (content pruned, file discovery parallelized by Spark's
    * file index — the same shape as [[FsOps.list]]) and the winner election
    * is a `groupBy(finalName)` aggregation, so commit holds no per-archive
    * state on the driver and survives ~10⁷ staged archives where a
    * driver-side `listStatus` array would be the scaling wall. The renames
    * are likewise distributed, metadata-only ops; the driver sees only the
    * conflict verdict (a handful of example names).
    */
  private[io] def commit(spark: org.apache.spark.sql.SparkSession, outDir: String,
                         sconf: SerializableHadoopConf,
                         protocol: CommitProtocol = RenameCommit): Unit = {
    import org.apache.spark.sql.functions._
    val out = new Path(outDir)
    val tmp = new Path(out, TmpDir)
    val fs = out.getFileSystem(sconf.value)

    val stagedRe = "^(.*)\\.p(\\d+)\\.a(\\d+)\\" + DoneSuffix + "$"
    val perFin = spark.read.format("binaryFile").load(tmp.toString)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("tmpName"))
      .select(col("tmpName"),
        regexp_extract(col("tmpName"), stagedRe, 1).as("fin"),
        regexp_extract(col("tmpName"), stagedRe, 2).cast("long").as("part"),
        regexp_extract(col("tmpName"), stagedRe, 3).cast("long").as("attempt"))
      .filter(col("fin") =!= "") // unmarked debris doesn't parse — dropped
      .groupBy("fin").agg(
        countDistinct(col("part")).as("n_parts"),
        // latest attempt per final name wins (earlier = retry debris of the
        // same partition writing identical content)
        max_by(col("tmpName"), col("attempt")).as("winner"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      val conflicts = perFin.filter(col("n_parts") > 1)
        .select("fin").orderBy("fin").limit(5)
        .collect().map(_.getString(0))
      if (conflicts.nonEmpty) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          "archive rows were split across partitions — outputs claimed by " +
            s"multiple tasks: ${conflicts.mkString(", ")}")
      }
      perFin.select("winner", "fin").foreachPartition { it: Iterator[Row] =>
        val conf = sconf.value
        val o = new Path(outDir)
        val pfs = o.getFileSystem(conf)
        val t = new Path(o, TmpDir)
        it.foreach { r =>
          val target = new Path(o, r.getString(1))
          protocol match {
            case RenameCommit =>
              // the `.done` file IS the data under rename marking
              pfs.delete(target, false)
              if (!pfs.rename(new Path(t, r.getString(0)), target))
                throw new java.io.IOException(
                  s"commit rename failed for ${r.getString(1)}")
            case CopyCommit =>
              // the `.done` file is a marker; the data sits beside it.
              // Copy-then-verify: object copy/PUT is complete-or-absent,
              // and the length check turns "copy claimed success" into
              // "published object verifiably holds the staged bytes"
              // before the winner is declared committed. The staged
              // source is left for the staging-dir sweep.
              val src = new Path(t, r.getString(0).stripSuffix(DoneSuffix))
              val srcLen = pfs.getFileStatus(src).getLen
              org.apache.hadoop.fs.FileUtil.copy(pfs, src, pfs, target,
                false, true, conf)
              val dstLen = pfs.getFileStatus(target).getLen
              if (dstLen != srcLen)
                throw new java.io.IOException(
                  s"commit verify failed for ${r.getString(1)}: " +
                    s"published $dstLen bytes, staged $srcLen")
          }
        }
      }
    } finally perFin.unpersist()
    fs.delete(tmp, true)
  }

  /** One gzipped tar stream; copies the 5 header fields the reference
    * preserves (`/root/reference/embargo.go:163-168`).
    */
  private final class TarWriter(os: OutputStream) {
    private val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(os))
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)

    def write(r: Row): Unit = {
      val e = new TarArchiveEntry(r.getAs[String]("name"))
      e.setSize(r.getAs[Long]("size"))
      e.setMode(r.getAs[Long]("mode").toInt)
      e.setModTime(r.getAs[java.sql.Timestamp]("modTime"))
      tar.putArchiveEntry(e)
      tar.write(r.getAs[Array[Byte]]("content"))
      tar.closeArchiveEntry()
    }

    def close(): Unit = tar.close()
  }
}
