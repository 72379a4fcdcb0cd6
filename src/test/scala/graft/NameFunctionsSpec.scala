package graft

import graft.functions.{IpFunctions, NameFunctions => NF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-level specs for the name/date projection surface (SURVEY.md §2.2/2.3)
  * and the Catalyst local_ip / normalize_ip expressions, evaluated through a
  * real plan so codegen paths are exercised.
  */
class NameFunctionsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("local_ip expression matches reference parser cases through codegen") {
    val df = Seq(
      "20170225T23:00:00Z_4.34.58.34_0.web100.gz",
      "20170225T23:00:00Z_ALL0.web100.gz",
      "20170225T23:00:00Z_2001:4c08:2003:3f:::230_ALL0.web100.gz"
    ).toDF("name")
    val got = df.select(IpFunctions.local_ip($"name")).as[String].collect().toSeq
    assert(got == Seq("4.34.58.34", "", "2001:4c08:2003:3f::230"))
  }

  test("normalize_ip expression") {
    val got = Seq("2001:4c08:2003:3f:::230", "4.34.58.34", "ALL0")
      .toDF("ip").select(IpFunctions.normalize_ip($"ip")).as[String].collect().toSeq
    assert(got == Seq("2001:4c08:2003:3f::230", "4.34.58.34", ""))
  }

  test("local_ip survives null input") {
    val got = Seq[Option[String]](Some("a_1.2.3.4_b"), None)
      .toDF("name").select(IpFunctions.local_ip($"name")).collect()
    assert(got(0).getString(0) == "1.2.3.4")
    assert(got(1).isNullAt(0)) // null-intolerant unary: null in → null out
  }

  test("basename / privateName / dayPrefix / fileDate projections") {
    val df = Seq(
      ("sidestream/2017/03/15/20170315T000000Z-mlab3-sea03-sidestream-0000.tgz", "20170315")
    ).toDF("path", "d")
    val row = df.select(
      NF.basename($"path").as("b"),
      NF.privateName(NF.basename($"path")).as("p"),
      NF.dayPrefix($"d").as("pref"),
      NF.fileDate(NF.basename($"path")).as("fd"),
      NF.fileDateInt(NF.basename($"path")).as("fdi"),
      NF.isSidestreamArchive($"path").as("ok")
    ).head()
    assert(row.getString(0) == "20170315T000000Z-mlab3-sea03-sidestream-0000.tgz")
    assert(row.getString(1) == "20170315T000000Z-mlab3-sea03-sidestream-0000-e.tgz")
    assert(row.getString(2) == "sidestream/2017/03/15")
    assert(row.getString(3) == "20170315")
    assert(row.getInt(4) == 20170315)
    assert(row.getBoolean(5))
  }

  test("fileDateInt is null (not an ANSI error) on malformed names (F5)") {
    val got = Seq("notes.tra", "2017031X_rest.web100", "20170315T_ok.web100", "")
      .toDF("n").select(NF.fileDateInt($"n")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
    assert(got(2).getInt(0) == 20170315)
    assert(got(3).isNullAt(0))
  }

  test("formatDateAsInt and cutoffDateInt (F3/F4)") {
    val df = Seq("2017-03-15 10:00:00").toDF("s")
      .select(to_timestamp($"s").as("t"))
    val row = df.select(
      NF.formatDateAsInt($"t").as("di"),
      NF.cutoffDateInt($"t").as("cut")).head()
    assert(row.getInt(0) == 20170315)
    assert(row.getInt(1) == 20160315)
  }

  test("base64 + gs path split (F6/F7)") {
    val url = "gs://scraper-mlab-oti/sidestream/2017/03/15/x.tgz"
    val df = Seq(java.util.Base64.getEncoder.encodeToString(url.getBytes)).toDF("b64")
    val row = df.select(
      NF.decodeBase64Path($"b64").as("url"),
      NF.gsBucket(NF.decodeBase64Path($"b64")).as("bkt"),
      NF.gsObject(NF.decodeBase64Path($"b64")).as("obj")).head()
    assert(row.getString(0) == url)
    assert(row.getString(1) == "scraper-mlab-oti")
    assert(row.getString(2) == "sidestream/2017/03/15/x.tgz")
  }
}
