package graft.io

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `tgz` format: `spark.read.format("tgz").load(path)` scans
  * `.tgz` archives directly — no `binaryFile` + `flatMap`, no
  * `LATERAL VIEW explode_tar` — with the [[graft.model.TarEntry]] schema
  * (SURVEY §4's optional DSv2 surface; the reference's scan loop is
  * `/root/reference/embargo.go:125-173`).
  *
  * Scale shape, mirrored from [[TgzSource]]:
  *   - **one InputPartition per archive** — the task unit the reference
  *     processes serially; 1000 executors split 1000 tarballs at once. A
  *     gzip stream has no split points, so sub-file splitting buys nothing.
  *   - **column pruning reaches the tar reader**: a projection without
  *     `content` streams PAST every payload (tar knows each entry's size,
  *     so skipping is a seek, not an inflate+discard) — a name/size
  *     manifest over 100 TB of archives decompresses headers only.
  *   - entries decode lazily, one at a time, inside the partition reader —
  *     memory is O(largest entry), never O(archive).
  *
  * Options: `pathGlobFilter` (default `*.tgz`) filters directory listings,
  * matching the `binaryFile` option of the same name.
  */
class TgzTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "tgz"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TgzTableProvider.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TgzTable(new CaseInsensitiveStringMap(properties))
}

object TgzTableProvider {

  /** The [[graft.model.TarEntry]] fields, in declaration order. */
  val Schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("ordinal", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mode", LongType, nullable = false),
    StructField("modTime", TimestampType),
    StructField("typeflag", StringType, nullable = false),
    StructField("content", BinaryType)))

  /** Resolve the `.load(...)` paths to concrete archive files: globs
    * expand, directories list non-recursively through `pathGlobFilter`.
    */
  private[io] def listArchives(paths: Seq[String], glob: String): Seq[FileStatus] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val filter = new org.apache.hadoop.fs.GlobFilter(glob)
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap {
        case d if d.isDirectory =>
          fs.listStatus(d.getPath).toSeq.filter(s => s.isFile && filter.accept(s.getPath))
        case f => Seq(f)
      }
    }
  }
}

private[io] class TgzTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"tgz(${TgzScan.paths(options).mkString(",")})"

  override def schema(): StructType = TgzTableProvider.Schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new TgzScanBuilder(options)
}

private[io] class TgzScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = TgzTableProvider.Schema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source field order regardless of projection order
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(TgzTableProvider.Schema.fields.filter(f => keep(f.name)))
  }

  override def build(): Scan = new TgzScan(options, required)
}

private[io] object TgzScan {
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    // `.load(p)` arrives as "path"; `.load(p1, p2, ...)` as a JSON array
    // under "paths" — the same contract FileTable consumes
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      org.json4s.jackson.JsonMethods.parse(json)
        .asInstanceOf[org.json4s.JArray].arr
        .map(_.asInstanceOf[org.json4s.JString].s)
    }
    multi ++ Option(options.get("path")).toSeq
  }
}

private[io] class TgzScan(options: CaseInsensitiveStringMap,
                          requiredSchema: StructType) extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema

  override def toBatch: Batch = this

  override def description(): String = {
    val content = if (requiredSchema.fieldNames.contains("content")) "" else ", payloads skipped"
    s"tgz ReadSchema: ${requiredSchema.simpleString}$content"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val glob = Option(options.get("pathGlobFilter")).getOrElse("*.tgz")
    TgzTableProvider.listArchives(TgzScan.paths(options), glob)
      .map(s => TgzInputPartition(s.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    TgzReaderFactory(conf, requiredSchema)
  }
}

/** One archive = one partition: the reference's serial unit of work,
  * parallelized across the cluster.
  */
private[io] case class TgzInputPartition(path: String) extends InputPartition

private[io] case class TgzReaderFactory(conf: SerializableHadoopConf,
                                        requiredSchema: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TgzInputPartition]
    new TgzPartitionReader(p.path, conf, requiredSchema)
  }
}

private[io] class TgzPartitionReader(pathStr: String,
                                     conf: SerializableHadoopConf,
                                     requiredSchema: StructType)
    extends PartitionReader[InternalRow] {

  private val needContent = requiredSchema.fieldNames.contains("content")
  // per-field writers bound once (not per row): ordinal in the pruned row
  // -> extractor from the TarEntry
  private val writers: Array[graft.model.TarEntry => Any] =
    requiredSchema.fieldNames.map {
      case "archive"  => (e: graft.model.TarEntry) => UTF8String.fromString(e.archive)
      case "ordinal"  => (e: graft.model.TarEntry) => e.ordinal
      case "name"     => (e: graft.model.TarEntry) => UTF8String.fromString(e.name)
      case "size"     => (e: graft.model.TarEntry) => e.size
      case "mode"     => (e: graft.model.TarEntry) => e.mode
      case "modTime"  => (e: graft.model.TarEntry) => DateTimeUtils.fromJavaTimestamp(e.modTime)
      case "typeflag" => (e: graft.model.TarEntry) => UTF8String.fromString(e.typeflag)
      case "content"  => (e: graft.model.TarEntry) => e.content
    }

  private lazy val stream = {
    val path = new Path(pathStr)
    path.getFileSystem(conf.value).open(path)
  }
  private lazy val entries =
    TgzSource.readTgzStream(pathStr, stream, readContent = needContent)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (entries.hasNext) {
      val e = entries.next()
      val row = new GenericInternalRow(writers.length)
      var i = 0
      while (i < writers.length) { row.update(i, writers(i)(e)); i += 1 }
      current = row
      true
    } else false

  override def get(): InternalRow = current

  override def close(): Unit = stream.close()
}
