package graft.io

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.TarEntry

/** web100 snapshot parsing (SURVEY §1.1 row 6): the domain data inside the
  * sidestream payloads, which the reference treats as opaque bytes. Format
  * (FIXTURES.md §6): line 1 `K: ` + 121 space-separated variable names,
  * then one `C: ` + 121 values row per poll snapshot.
  *
  * Parsed into a typed core (connection id, poll time, 4-tuple) plus a
  * `vars` map retaining all 121 variables — long-form and schema-stable, so
  * windows/joins/aggregations work without committing a 121-column static
  * schema; individual metrics project out via `element_at(vars, name)`.
  * Parsing runs inside the same task that exploded the archive (flatMap,
  * no shuffle).
  */
object Web100 {

  /** One poll snapshot: typed core + all variables as strings. `snapSeq` is
    * the 0-based position of the `C:` row within its entry — it makes the
    * (pollTime, entry, snapSeq) ordering total, so latest-per-cid picks are
    * deterministic across engines.
    */
  final case class Snapshot(
      entry: String,
      snapSeq: Long,
      cid: Long,
      pollTimeRaw: String,
      localAddress: String,
      localPort: Int,
      remAddress: String,
      remPort: Int,
      vars: Map[String, String])

  /** Parse one web100 payload; malformed rows are DROPPED, never thrown on:
    * value count mismatching the header (the reference-era logs are
    * line-oriented and can truncate at the tail), or a typed-core field
    * (cid/ports) that is missing or non-numeric.
    */
  def parsePayload(entryName: String, bytes: Array[Byte]): Iterator[Snapshot] = {
    val lines = new String(bytes, StandardCharsets.UTF_8).linesIterator.toSeq
    lines.find(_.startsWith("K: ")) match {
      case None => Iterator.empty
      case Some(k) =>
        val cols = k.drop(3).trim.split("\\s+")
        val idx = cols.zipWithIndex.toMap
        def at(vals: Array[String], name: String): String =
          idx.get(name).filter(_ < vals.length).map(vals).getOrElse("")
        lines.iterator
          .filter(_.startsWith("C: "))
          .map(_.drop(3).trim.split("\\s+"))
          .zipWithIndex
          .filter(_._1.length == cols.length)
          .flatMap { case (vals, seq) =>
            for {
              cid <- at(vals, "cid").toLongOption
              localPort <- at(vals, "LocalPort").toIntOption
              remPort <- at(vals, "RemPort").toIntOption
            } yield Snapshot(
              entry = entryName,
              snapSeq = seq.toLong,
              cid = cid,
              pollTimeRaw = at(vals, "PollTime"),
              localAddress = at(vals, "LocalAddress"),
              localPort = localPort,
              remAddress = at(vals, "RemAddress"),
              remPort = remPort,
              vars = cols.zip(vals).toMap)
          }
    }
  }

  /** All snapshots in the web100 entries of an exploded archive Dataset,
    * with `pollTime` as a proper UTC timestamp
    * (raw form `2017-03-15-05:00:37Z`).
    */
  def snapshots(entries: Dataset[TarEntry]): DataFrame = {
    import entries.sparkSession.implicits._
    entries
      .filter(e => e.typeflag == "0" && e.name.contains("web100"))
      .flatMap(e => parsePayload(e.name, e.content))
      .withColumn("pollTime",
        to_timestamp(col("pollTimeRaw"), "yyyy-MM-dd-HH:mm:ss'Z'"))
  }

  /** W1 on the real domain data: the latest snapshot per connection id
    * (`row_number` over cid by poll time desc; entry + in-entry sequence
    * tie-breaks make the pick total and engine-independent).
    */
  def latestPerConnection(snaps: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("pollTime").desc, col("entry").desc, col("snapSeq").desc)
    snaps.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cid"), col("pollTime").as("last_poll"),
        col("localAddress"), col("remAddress"),
        element_at(col("vars"), "DataBytesOut").cast("long").as("data_bytes_out"))
  }
}
