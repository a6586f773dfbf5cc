package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.streaming.{IngestEngine, StatusDoc}

/** The reference's HTTP surface (SURVEY.md §2 API table): exactly two
  * endpoints with its exact JSON and error shapes —
  *
  *   POST /ingest            → 200 {"ingestion_id": uuid}
  *                           | 400 {"error": "Invalid input"}
  *   GET  /status/:id        → 200 {ingestion_id, status, batches: [...]}
  *                           | 404 {"error": "Ingestion ID not found"}
  *
  * (reference: src/app.js:106-155, 158-187). Zero new dependencies:
  * `com.sun.net.httpserver` ships with the JDK (offline build). The
  * server is a thin driver-side adapter over [[IngestEngine]] — HTTP
  * never touches executors (SURVEY.md §2 S1/S2: REST ingress lives
  * outside Spark).
  */
final class GraftServer(engine: IngestEngine, port: Int = 5001) {

  private var server: HttpServer = _

  def start(): Int = synchronized {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/ingest", (ex: HttpExchange) => handleIngest(ex))
    server.createContext("/status", (ex: HttpExchange) => handleStatus(ex))
    server.setExecutor(null) // single dispatcher ≈ the reference's event loop
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  // -------------------------------------------------------- handlers
  /** POST /ingest (reference: src/app.js:106-155). Body must be
    * `{"ids": [int...], "priority": "HIGH|MEDIUM|LOW"}`; any parse or
    * shape failure is the reference's 400 'Invalid input'.
    */
  private def handleIngest(ex: HttpExchange): Unit =
    guard(ex) {
      // JDK HttpServer contexts match by raw string prefix, so
      // /ingestfoo lands here too — require the exact route like
      // Express's app.post('/ingest') does (non-strict routing:
      // exactly one trailing slash is tolerated)
      if (ex.getRequestMethod != "POST" ||
        ex.getRequestURI.getPath.stripSuffix("/") != "/ingest")
        respond(ex, 404, err("Not found"))
      else {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        parseRequest(body) match {
          case Some((ids, priority)) =>
            engine.ingest(ids, priority) match {
              case Right(id) =>
                respond(ex, 200, Json.obj("ingestion_id" -> Json.escape(id)))
              case Left(_) => respond(ex, 400, err("Invalid input"))
            }
          case None => respond(ex, 400, err("Invalid input"))
        }
      }
    }

  /** GET /status/:id (reference: src/app.js:158-187). */
  private def handleStatus(ex: HttpExchange): Unit =
    guard(ex) {
      // Express's '/status/:id' matches exactly one extra segment
      // (plus an optional trailing slash — non-strict routing);
      // /statusfoo and /status/a/b must fall through to plain 404
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val id =
        if (path.startsWith("/status/")) path.stripPrefix("/status/")
        else ""
      if (ex.getRequestMethod != "GET" || id.isEmpty || id.contains("/"))
        respond(ex, 404, err("Not found"))
      else engine.status(id) match {
        case Some(doc) => respond(ex, 200, renderStatus(doc))
        case None => respond(ex, 404, err("Ingestion ID not found"))
      }
    }

  // --------------------------------------------------------- helpers
  /** Extract (ids, priority), enforcing JSON types strictly: ids must
    * be an array of integral numbers (the reference's Number.isInteger
    * check, src/app.js:112), priority a string. Range/enum validation
    * happens in the engine so HTTP and embedded callers share it.
    */
  private def parseRequest(body: String): Option[(Seq[Long], String)] =
    try {
      Json.parse(body) match {
        case Json.JObj(fields) =>
          for {
            idsV <- fields.get("ids")
            prioV <- fields.get("priority")
            ids <- idsV match {
              case Json.JArr(items) =>
                val longs = items.collect {
                  case n: Json.JNum if n.isIntegral => n.toLong
                }
                if (longs.size == items.size) Some(longs) else None
              case _ => None
            }
            prio <- prioV match {
              case Json.JStr(s) => Some(s)
              case _ => None
            }
          } yield (ids, prio)
        case _ => None
      }
    } catch { case _: Json.ParseError | _: NumberFormatException => None }

  private def renderStatus(doc: StatusDoc): String =
    Json.obj(
      "ingestion_id" -> Json.escape(doc.ingestionId),
      "status" -> Json.escape(doc.status),
      "batches" -> Json.arr(doc.batches.map(b => Json.obj(
        "batch_id" -> Json.escape(b.batchId),
        "ids" -> Json.arr(b.ids.map(_.toString)),
        "status" -> Json.escape(b.status)))))

  private def err(msg: String): String =
    Json.obj("error" -> Json.escape(msg))

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }

  private def guard(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case t: Throwable =>
        try respond(ex, 500, err("Internal server error"))
        catch { case _: Throwable => () }
    }
}

/** Embeddable module surface mirroring the reference's exports
  * `{app, startServer, stopServer, resetState, PRIORITY_LEVELS}`
  * (reference: src/app.js:243).
  */
object GraftServer {
  val PriorityLevels: Map[String, Int] = graft.ingest.Priority.weights

  def startServer(engine: IngestEngine, port: Int = 5001): GraftServer = {
    val s = new GraftServer(engine, port)
    s.start()
    s
  }
}
