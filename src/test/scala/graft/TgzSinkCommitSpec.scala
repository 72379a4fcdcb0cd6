package graft.io

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Commit-protocol spec for [[TgzSink]]: only `.done`-marked staged files
  * are publishable — an attempt that died mid-write (no marker) must never
  * beat a complete attempt, whatever its attempt id.
  */
class TgzSinkCommitSpec extends AnyFunSuite with SparkSuite {

  private def sconf() =
    new SerializableHadoopConf(
      org.apache.spark.sql.graft.bridge.sessionHadoopConf(spark))

  test("commit publishes marked attempts and drops unmarked mid-write debris") {
    val outDir = Files.createTempDirectory("graft-commit").toString
    Files.createDirectories(Paths.get(s"$outDir/_tmp"))
    // complete attempt 3 (marked) vs a KILLED attempt 9 that wrote more
    // bytes but never closed — the higher attempt id must not win
    Files.write(Paths.get(s"$outDir/_tmp/x.tgz.p0.a3.done"), "COMPLETE".getBytes)
    Files.write(Paths.get(s"$outDir/_tmp/x.tgz.p0.a9"), "TRUNCATED-BUT-LONGER".getBytes)
    // a second final name whose only attempt is unmarked: nothing published
    Files.write(Paths.get(s"$outDir/_tmp/y.tgz.p1.a1"), "DEAD".getBytes)

    TgzSink.commit(spark, outDir, sconf())

    assert(Files.readString(Paths.get(s"$outDir/x.tgz")) === "COMPLETE")
    assert(!Files.exists(Paths.get(s"$outDir/y.tgz")))
    assert(!Files.exists(Paths.get(s"$outDir/_tmp"))) // staging cleaned up
  }

  test("commit picks the latest marked attempt of duplicate successes") {
    val outDir = Files.createTempDirectory("graft-commit2").toString
    Files.createDirectories(Paths.get(s"$outDir/_tmp"))
    Files.write(Paths.get(s"$outDir/_tmp/z.tgz.p2.a4.done"), "EARLY".getBytes)
    Files.write(Paths.get(s"$outDir/_tmp/z.tgz.p2.a7.done"), "LATE".getBytes)

    TgzSink.commit(spark, outDir, sconf())

    assert(Files.readString(Paths.get(s"$outDir/z.tgz")) === "LATE")
  }

  test("commit still rejects a final name marked by two partitions") {
    val outDir = Files.createTempDirectory("graft-commit3").toString
    Files.createDirectories(Paths.get(s"$outDir/_tmp"))
    Files.write(Paths.get(s"$outDir/_tmp/w.tgz.p0.a1.done"), "P0".getBytes)
    Files.write(Paths.get(s"$outDir/_tmp/w.tgz.p1.a2.done"), "P1".getBytes)

    val e = intercept[IllegalStateException] {
      TgzSink.commit(spark, outDir, sconf())
    }
    assert(e.getMessage.contains("split across partitions"))
    assert(!Files.exists(Paths.get(s"$outDir/w.tgz")))
  }
}
