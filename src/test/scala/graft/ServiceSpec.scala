package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TgzSource
import graft.ops.{EmbargoSplit, Service}
import graft.queries.TarQueries

/** The HTTP service surface (`/root/reference/deploy/deploy.go:118-126`)
  * driven over REAL loopback HTTP: every route's success arm must produce
  * the same staged-store outcomes the graded pipelines (e1/e3/e4) grade,
  * and the reject arms must answer with the reference's statuses —
  * missing-params 404, invalid-filename 500, failed-processing 500,
  * non-integer unembargo date 400.
  */
class ServiceSpec extends AnyFunSuite with SparkSuite {

  private def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
  private def b64(s: String) =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private lazy val root = Files.createTempDirectory("graft-svc").toString
  private lazy val (srcDir, pubDir, privDir) =
    (s"$root/src", s"$root/public", s"$root/embargoed")

  private val sitesJson =
    """[
      |  {"hostname": "mlab1.sea03.measurement-lab.org", "ipv4": "173.205.3.39", "ipv6": "2001:4c08:2003:3f::39"},
      |  {"hostname": "mlab1.abc01.samknows.measurement-lab.org", "ipv4": "9.9.9.9", "ipv6": ""}
      |]""".stripMargin

  private lazy val service = {
    // the scraper store: both fixtures under their day prefixes
    Seq((TarQueries.FixtureTgz, "sidestream/2017/03/15"),
        (TarQueries.Fixture2Tgz, "sidestream/2017/03/16")).foreach {
      case (tgz, prefix) =>
        graft.io.FsOps.mkdirs(spark, s"$srcDir/$prefix")
        graft.io.FsOps.copy(spark, tgz, s"$srcDir/$prefix/${base(tgz)}")
    }
    val sites = Files.createTempFile("graft-svc-sites", ".json")
    Files.writeString(sites, sitesJson)
    // today pinned to 2018-03-15 → the one-year default cutoff is
    // 20170315: neither fixture day is aged out, so the split is a real
    // whitelist split (both stores non-empty) rather than all-public
    Service.serve(spark, Service.ServiceConfig(
      srcDir = srcDir, publicDir = pubDir, privateDir = privDir,
      whitelistPath = TarQueries.FixtureWhitelist,
      sitesUrl = sites.toUri.toString,
      whitelistOut = s"$root/whitelist.parquet",
      today = () => java.time.LocalDate.of(2018, 3, 15)))
  }

  private def get(path: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:${service.port}$path"))
      .GET().build()
    val resp =
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def entryNames(tgz: String): Set[String] =
    TgzSource.entries(spark, tgz).filter(col("typeflag") === "0")
      .select("name").collect().map(_.getString(0)).toSet

  test("/_ah/health answers 200 ok") {
    assert(get("/_ah/health") === ((200, "ok")))
  }

  test("non-exact paths 404 without side effects (Go ServeMux exact-match parity, r19 review)") {
    // the JDK server's longest-prefix dispatch would otherwise RUN the
    // /submit pipeline for /submitfoo
    assert(get("/submitfoo?date=20170316")._1 === 404)
    assert(get("/_ah/healthz")._1 === 404)
    assert(get("/cron/unembargoX?date=20170315")._1 === 404)
    assert(get("/cron/update_embargo_whitelistX")._1 === 404)
  }

  test("/submit with neither date nor file is the deploy.go:26-30 404 arm") {
    val (code, body) = get("/submit")
    assert(code === 404)
    assert(body.contains("Missing date or filename there"))
  }

  test("/submit rejects undecodable / non-gs / non-sidestream filenames with 500 (deploy.go:32-37)") {
    for (raw <- Seq("@@not-base64@@",
        b64("https://example.com/sidestream/x.tgz"),
        b64("gs://scraper-mlab/switch/2017/03/16/speedtest-0001.dat"))) {
      val (code, body) = get(s"/submit?file=$raw")
      assert(code === 500, s"raw=$raw body=$body")
      assert(body.startsWith("Invalid filename:"), body)
    }
  }

  test("/submit?file= splits the archive into the two stores exactly like a direct EmbargoSplit.run") {
    val fixBase = base(TarQueries.FixtureTgz)
    val url = s"gs://scraper-mlab/sidestream/2017/03/15/$fixBase"
    val (code, _) = get(s"/submit?file=${b64(url)}")
    assert(code === 200)
    val pubTgz = s"$pubDir/sidestream/2017/03/15/$fixBase"
    val privTgz =
      s"$privDir/sidestream/2017/03/15/${fixBase.replace(".tgz", "-e.tgz")}"
    // parity: the same split run directly (cutoff = the service's
    // one-year default, 20170315)
    val direct = s"$root/direct_split"
    EmbargoSplit.run(spark, TarQueries.FixtureTgz,
      TarQueries.FixtureWhitelist, 20170315, direct)
    assert(entryNames(pubTgz) === entryNames(s"$direct/$fixBase"))
    assert(entryNames(privTgz) ===
      entryNames(s"$direct/${fixBase.replace(".tgz", "-e.tgz")}"))
    assert(entryNames(pubTgz).nonEmpty && entryNames(privTgz).nonEmpty)
  }

  test("/submit?file= with a missing source object is the 500 processing-failure arm") {
    val (code, body) =
      get(s"/submit?file=${b64("gs://scraper-mlab/sidestream/2099/01/01/nope-sidestream-0000.tgz")}")
    assert(code === 500)
    assert(body === "Fail with embargo single file.")
  }

  test("/submit?date= embargoes the whole day; an empty day is a success no-op") {
    val (code, _) = get("/submit?date=20170316")
    assert(code === 200)
    val fix2 = base(TarQueries.Fixture2Tgz)
    assert(entryNames(s"$pubDir/sidestream/2017/03/16/$fix2").nonEmpty)
    assert(entryNames(
      s"$privDir/sidestream/2017/03/16/${fix2.replace(".tgz", "-e.tgz")}").nonEmpty)
    assert(get("/submit?date=20250101")._1 === 200) // no data staged there
    assert(get("/submit?date=2017031")._1 === 500)  // malformed date
  }

  test("/cron/update_embargo_whitelist reloads the site feed into the whitelist store") {
    val (code, body) = get("/cron/update_embargo_whitelist")
    assert((code, body) === ((200, "OK")))
    val got = spark.read.parquet(s"$root/whitelist.parquet")
      .collect().map(_.getString(0)).toSet
    // samknows dropped, empty ipv6 dropped — the graded S6/P7/P8 semantics
    assert(got === Set("173.205.3.39", "2001:4c08:2003:3f::39"))
  }

  test("/cron/unembargo promotes a day's -e archives; bad date is the 400 strconv arm") {
    assert(get("/cron/unembargo?date=2017-03-15")._1 === 400)
    // int-OVERFLOW is also the strconv.Atoi 400 arm (r19 review), while
    // an in-syntax but out-of-range date is the validDate 500 arm
    assert(get("/cron/unembargo?date=99999999999999999999")._1 === 400)
    assert(get("/cron/unembargo?date=3000000000")._1 === 500)
    // a date NEWER than the one-year cutoff (20170315) fails validDate →
    // the reference's 500 error arm (unembargo.go:145-147)
    assert(get("/cron/unembargo?date=20170316")._1 === 500)
    val fixBase = base(TarQueries.FixtureTgz).replace(".tgz", "-e.tgz")
    val (code, body) = get("/cron/unembargo?date=20170315")
    assert(code === 200, body)
    assert(body === "OK") // exact deploy.go body (r19 review)
    // the promoted object now exists in the PUBLIC store, content intact
    assert(entryNames(s"$pubDir/sidestream/2017/03/15/$fixBase") ===
      entryNames(s"$privDir/sidestream/2017/03/15/$fixBase"))
    // default date (no param) = one year before the pinned today →
    // 20170315 again: the copy is an OVERWRITE (unembargo.go's
    // delete-then-copy case) and must succeed idempotently
    assert(get("/cron/unembargo") === ((200, "OK")))
    assert(entryNames(s"$pubDir/sidestream/2017/03/15/$fixBase").nonEmpty)
  }

  test("service shuts down cleanly") {
    service.close()
    intercept[Exception](get("/_ah/health"))
  }
}
