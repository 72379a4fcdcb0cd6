package graft.io

import java.io.OutputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}

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
  */
object TgzSink {

  /** Write `(archive × route)` tgz pairs under `outDir`.
    *
    * `routed` must have columns `archive, ordinal, name, size, mode, modTime,
    * typeflag, content, route` with each archive's rows contiguous and
    * ordinal-ascending within a partition — true by construction for
    * `TgzSource.entries → route` pipelines (narrow ops only). Rows of an
    * archive must not span partitions; re-encountering a closed archive
    * fails fast rather than silently corrupting output.
    *
    * Output names: `<archiveBasename>` for the public half,
    * `<archiveBasename>` with `.tgz` → `-e.tgz` for the private half.
    */
  def writeSplit(routed: Dataset[Row], outDir: String): Unit = {
    routed.foreachPartition { rows: Iterator[Row] =>
      val conf = new Configuration()
      val out = new Path(outDir)
      val fs = out.getFileSystem(conf)
      fs.mkdirs(out)
      val closed = scala.collection.mutable.HashSet.empty[String]
      var current: String = null
      var pub: TarWriter = null
      var priv: TarWriter = null

      def closeCurrent(): Unit = if (current != null) {
        pub.close(); priv.close()
        closed += current
        current = null
      }

      rows.foreach { r =>
        val archive = r.getAs[String]("archive")
        if (archive != current) {
          closeCurrent()
          require(!closed.contains(archive),
            s"entries for $archive are not contiguous — pipeline introduced a shuffle")
          current = archive
          val base = archive.substring(archive.lastIndexOf('/') + 1)
          // S8 rename (/root/reference/embargo.go:105)
          val privName = base.replace(".tgz", "-e.tgz")
          pub = new TarWriter(fs.create(new Path(out, base), true))
          priv = new TarWriter(fs.create(new Path(out, privName), true))
        }
        val w = if (r.getAs[String]("route") == Schemas.RoutePublic) pub else priv
        w.write(r)
      }
      closeCurrent()
    }
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
