package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StateStores, StreamDedup}

/** Pins that the stateful streaming drains actually run on the RocksDB
  * state store provider (not just that the conf briefly held the value):
  * the provider's on-disk checkpoint artifacts are unmistakable —
  * RocksDB commits `*.changelog`/`*.zip` under `state/`, the default
  * HDFS-backed provider commits `*.delta`.
  */
class StateStoresSpec extends AnyFunSuite with SparkSuite {

  private def stateFiles(ckpt: Path): Seq[String] = {
    val state = ckpt.resolve("state")
    if (!Files.exists(state)) Seq.empty
    else {
      val walk = Files.walk(state)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.getFileName.toString).toList
      } finally walk.close()
    }
  }

  test("stream dedup drains through a RocksDB state store") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-rocks")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt")
    (1 to 40).map(i => s"fp${i % 10}").toDF("fp")
      .repartition(2).write.parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    StreamDedup.distinctFingerprints(stream, out, ckpt.toString,
      statePartitions = Some(2))
    assert(spark.read.parquet(out).count() === 10)
    val files = stateFiles(ckpt)
    assert(files.nonEmpty, "drain left no state artifacts")
    assert(files.exists(f => f.endsWith(".changelog") || f.endsWith(".zip")),
      s"no RocksDB commit artifacts in state dir: $files")
    assert(!files.exists(_.endsWith(".delta")),
      s"HDFS-provider .delta files present — RocksDB did not engage: $files")
  }

  test("withSizedStore picks on-heap for small keyspaces, RocksDB for large/unknown") {
    import spark.implicits._
    import graft.streaming.StateSizing
    def drain(stateKeys: Option[Long]): Seq[String] = {
      val base = Files.createTempDirectory("graft-sized")
      val src = base.resolve("src").toString
      val out = base.resolve("out").toString
      val ckpt = base.resolve("ckpt")
      (1 to 40).map(i => s"fp${i % 10}").toDF("fp")
        .repartition(2).write.parquet(src)
      val stream = spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
      StreamDedup.distinctFingerprints(stream, out, ckpt.toString,
        statePartitions = Some(2), stateKeys = stateKeys)
      assert(spark.read.parquet(out).count() === 10) // result identical either way
      stateFiles(ckpt)
    }
    // small keyspace estimate: the on-heap (HDFS-backed) provider — .delta
    // commits, no RocksDB artifacts
    val small = drain(Some(1000L))
    assert(small.exists(_.endsWith(".delta")),
      s"small keyspace did not engage the on-heap provider: $small")
    assert(!small.exists(f => f.endsWith(".changelog") || f.endsWith(".zip")),
      s"small keyspace unexpectedly ran RocksDB: $small")
    // above the on-heap bound: the RocksDB large-state posture
    val large = drain(Some(StateSizing.OnHeapMaxKeys + 1))
    assert(large.exists(f => f.endsWith(".changelog") || f.endsWith(".zip")),
      s"large keyspace did not engage RocksDB: $large")
    // no estimate (None): conservative — RocksDB (the prior default, and
    // what the artifact test above already pins via distinctFingerprints)
  }

  test("withRocksDb restores prior session confs") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StateStores.withRocksDb(spark) {
      assert(spark.conf.get(key) === StateStores.RocksDbProvider)
    }
    assert(spark.conf.getOption(key) === before)
  }
}
