package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dashboard HTTP JSON API — the reference's main user surface
  * (`waddle serve` → Starlette app, /root/reference/waddle/_server.py:33-124)
  * re-expressed over the Parquet store:
  *
  *   GET    /                         tiny HTML index
  *   GET    /api/runs                 run list (?project=&status=&sort=&order=&limit=&offset=)
  *   GET    /api/runs/{id}            run detail: run + params + tags + artifacts + metric keys
  *   GET    /api/runs/{id}/metrics    metric series (?key=&limit=)
  *   DELETE /api/runs/{id}            tombstone delete
  *   POST   /api/compare              {"run_ids": [...]} → runs + param pivot + latest metrics
  *   GET    /api/metric-keys          global metric key list (system/ excluded)
  *   GET    /api/metric-summary       leaderboard for one key (?key=&limit=)
  *
  * Design: every response body is rendered ENGINE-SIDE — each route builds
  * a LIMIT-capped DataFrame view on [[WaddleStore]] and serializes it with
  * `Json.responseBody` (codegen'd `to_json`, canonical sorted keys); the
  * driver only concatenates the capped rows. The JDK's built-in
  * `com.sun.net.httpserver` serves them — zero added dependencies. The
  * reference's WebSocket push (`_server.py:112-124`, best-effort refresh
  * hints) maps to the Structured Streaming fan-out in
  * `streaming/Streams.fanout`; an HTTP poll of these routes is the
  * transport here.
  */
final class DashboardServer(spark: SparkSession, root: String, port: Int = 0) {
  private val store = new WaddleStore(spark, root)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private def nowSec(): Double = System.currentTimeMillis() / 1000.0

  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = { server.createContext("/", handle _); server.start() }
  def stop(): Unit = server.stop(0)

  // ---- request plumbing ----------------------------------------------

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8)
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Extract `"run_ids": [...]` from a compare POST body. Deliberately a
    * single-field extractor, not a JSON parser — the route accepts exactly
    * one shape and the repo takes no dependencies for the rest.
    */
  private[api] def parseRunIds(body: String): Seq[String] = {
    val arr = "\"run_ids\"\\s*:\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
    "\"([^\"]*)\"".r.findAllMatchIn(arr).map(_.group(1)).toSeq
  }

  // ---- routes ---------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    try {
      (method, path.stripSuffix("/").split("/").toList.drop(1)) match {
        case ("GET", Nil) =>
          respond(ex, 200,
            "<h1>graft dashboard</h1><p>JSON API under /api</p>", "text/html")
        case ("GET", List("api", "runs")) => listRuns(ex)
        case ("GET", List("api", "runs", id)) => getRun(ex, id)
        case ("DELETE", List("api", "runs", id)) =>
          store.deleteRun(id); respond(ex, 200, """{"ok":true}""")
        case ("GET", List("api", "runs", id, "metrics")) => getMetrics(ex, id)
        case ("POST", List("api", "compare")) => compare(ex)
        case ("GET", List("api", "metric-keys")) =>
          respond(ex, 200, Json.responseBody(store.metricKeys()))
        case ("GET", List("api", "metric-summary")) =>
          val q = query(ex)
          respond(ex, 200, Json.responseBody(store.metricLeaderboard(
            q.getOrElse("key", ""), nowSec(), q.getOrElse("limit", "20").toInt)))
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: IllegalArgumentException =>
        respond(ex, 400, Json.jsonObject(Seq("error" -> e.getMessage)))
      case e: Throwable =>
        respond(ex, 500, Json.jsonObject(Seq("error" -> String.valueOf(e.getMessage))))
    }
  }

  private def listRuns(ex: HttpExchange): Unit = {
    val q = query(ex)
    val df = store.listRuns(
      nowSec(),
      project = q.get("project"),
      status = q.get("status"),
      sortBy = q.getOrElse("sort", "started_at"),
      descending = q.getOrElse("order", "desc") == "desc",
      limit = q.getOrElse("limit", "200").toInt,
      offset = q.getOrElse("offset", "0").toInt)
    respond(ex, 200, Json.responseBody(df))
  }

  /** Composite run detail (reference get_run,
    * /root/reference/waddle/_dashboard_api.py:74-130): each section is its
    * own capped engine query; the driver only assembles the envelope.
    */
  private def getRun(ex: HttpExchange, id: String): Unit = {
    val run = store.runs(nowSec()).where(col("id") === id)
    if (run.isEmpty) { respond(ex, 404, """{"error":"not found"}"""); return }
    val params = Json.responseBody(
      store.latestKv("param").where(col("run_id") === id).orderBy("key"))
    val tags = Json.responseBody(
      store.latestKv("tag").where(col("run_id") === id).orderBy("key"))
    val arts = Json.responseBody(store.artifacts(id).orderBy("name"))
    val keys = Json.responseBody(
      store.metrics(id).select("key").distinct().orderBy("key"))
    respond(ex, 200,
      s"""{"run":${Json.responseBody(run).stripPrefix("[").stripSuffix("]")},""" +
        s""""params":$params,"tags":$tags,"artifacts":$arts,"metric_keys":$keys}""")
  }

  private def getMetrics(ex: HttpExchange, id: String): Unit = {
    val q = query(ex)
    var df = store.metrics(id)
    q.get("key").foreach(k => df = df.where(col("key") === k))
    respond(ex, 200,
      Json.responseBody(df, limit = q.getOrElse("limit", "5000").toInt))
  }

  private def compare(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val ids = parseRunIds(body)
    if (ids.isEmpty) { respond(ex, 400, """{"error":"run_ids required"}"""); return }
    val runs = Json.responseBody(
      store.runs(nowSec()).where(col("id").isin(ids: _*)).orderBy("id"))
    val params = Json.responseBody(store.compareParams(ids))
    val summary = Json.responseBody(store.metricSummary(ids))
    respond(ex, 200, s"""{"runs":$runs,"params":$params,"summary":$summary}""")
  }
}

/** `waddle serve` analog (/root/reference/waddle/cli.py:80-124).
  * Usage: runMain graft.api.Serve <storeRoot> [port]
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(sys.error("usage: Serve <storeRoot> [port]"))
    val port = args.lift(1).map(_.toInt).getOrElse(8350)
    val spark = graft.GraftSession.create()
    val srv = new DashboardServer(spark, root, port)
    srv.start()
    println(s"graft dashboard api listening on 127.0.0.1:${srv.boundPort} over $root")
    Thread.currentThread().join()
  }
}
