package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.FsOps

/** S1-S3/S9-S11 catalog-operation specs over a temp dir (posix stands in
  * for the object store; the code path is Hadoop FileSystem either way).
  */
class FsOpsSpec extends AnyFunSuite with SparkSuite {

  test("list / read / copy / delete / mkdirs round-trip") {
    val root = Files.createTempDirectory("graft-fs").toString
    assert(FsOps.mkdirs(spark, s"$root/src"))
    Files.write(java.nio.file.Paths.get(s"$root/src/a.tgz"), "alpha".getBytes)
    Files.write(java.nio.file.Paths.get(s"$root/src/b.tgz"), "beta!!".getBytes)
    Files.write(java.nio.file.Paths.get(s"$root/src/c.txt"), "gamma".getBytes)

    // S1 suffix-filtered vs S2 full listing
    val tgz = FsOps.list(spark, s"$root/src", ".tgz").collect()
    assert(tgz.map(_.getString(0)).toSeq === Seq("a.tgz", "b.tgz"))
    assert(tgz.map(_.getLong(1)).toSeq === Seq(5L, 6L))
    assert(FsOps.list(spark, s"$root/src").count() === 3)

    // S3 download
    assert(new String(FsOps.readBytes(spark, s"$root/src/a.tgz")) === "alpha")

    // S9 copy, S11 mkdirs implied by copy dir creation
    assert(FsOps.mkdirs(spark, s"$root/dst"))
    assert(FsOps.copy(spark, s"$root/src/a.tgz", s"$root/dst/a.tgz"))
    assert(new String(FsOps.readBytes(spark, s"$root/dst/a.tgz")) === "alpha")

    // S10 delete by prefix
    assert(FsOps.deletePrefix(spark, s"$root/src"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/src")))
  }
}
