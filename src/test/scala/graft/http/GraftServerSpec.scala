package graft.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{GraftConfig, Priority}
import graft.streaming.{IngestEngine, SystemSleeper}

/** Black-box HTTP parity (the reference's test style, test_api.js —
  * real HTTP against a live server) for shapes and status codes; the
  * timing scenarios live in EngineSpec under virtual time.
  */
class GraftServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val engine = new IngestEngine(GraftConfig.bench, SystemSleeper)
  private val server = new GraftServer(engine, port = 0)
  private var port: Int = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = { port = server.start() }
  override def afterAll(): Unit = server.stop()

  private def post(body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port/ingest"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  test("POST /ingest accepts a valid request and returns an ingestion_id") {
    val res = post("""{"ids": [1, 2, 3, 4, 5], "priority": "MEDIUM"}""")
    assert(res.statusCode() == 200)
    assert(res.body().contains("ingestion_id"))
  }

  test("POST /ingest rejects non-integer ids with 400 Invalid input") {
    val res = post("""{"ids": [1, 2, "a"], "priority": "HIGH"}""")
    assert(res.statusCode() == 400)
    assert(res.body().contains("Invalid input"))
  }

  test("POST /ingest rejects bad priority and out-of-range ids") {
    assert(post("""{"ids": [1, 2, 3], "priority": "VERY_HIGH"}""")
      .statusCode() == 400)
    assert(post("""{"ids": [0], "priority": "LOW"}""").statusCode() == 400)
    assert(post("""{"ids": [1000000008], "priority": "LOW"}""")
      .statusCode() == 400)
  }

  test("POST /ingest rejects malformed JSON") {
    assert(post("""{"ids": [1,""").statusCode() == 400)
    assert(post("""[]""").statusCode() == 400)
  }

  test("empty ids: 200, immediately completed, batches []") {
    val res = post("""{"ids": [], "priority": "LOW"}""")
    assert(res.statusCode() == 200)
    val id = extractId(res.body())
    val st = get(s"/status/$id")
    assert(st.statusCode() == 200)
    assert(st.body().contains("\"completed\""))
    assert(st.body().replaceAll("\\s", "").contains("\"batches\":[]"))
  }

  test("GET /status returns the batch split in order") {
    val res = post("""{"ids": [1, 2, 3, 4, 5, 6, 7], "priority": "HIGH"}""")
    val id = extractId(res.body())
    val body = get(s"/status/$id").body().replaceAll("\\s", "")
    assert(body.contains("\"ids\":[1,2,3]"))
    assert(body.contains("\"ids\":[4,5,6]"))
    assert(body.contains("\"ids\":[7]"))
    assert(body.contains("\"yet_to_start\""))
  }

  test("GET /status on unknown id is 404 with the reference error shape") {
    val res = get("/status/does-not-exist")
    assert(res.statusCode() == 404)
    assert(res.body().contains("Ingestion ID not found"))
  }

  test("unintended routes fall through to plain 404, not handler output") {
    // JDK HttpServer matches contexts by prefix — these must NOT be
    // treated as /ingest and /status/:id (Express matches segments)
    val r1 = post("""{"ids": [1], "priority": "LOW"}""").body()
    val badIngest = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port/ingestfoo"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"ids": [1], "priority": "LOW"}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(badIngest.statusCode() == 404)
    assert(!badIngest.body().contains("ingestion_id"))
    val badStatus = get("/statusfoo")
    assert(badStatus.statusCode() == 404)
    assert(!badStatus.body().contains("Ingestion ID not found"))
    val twoSegments = get(s"/status/${extractId(r1)}/extra")
    assert(twoSegments.statusCode() == 404)
    assert(!twoSegments.body().contains("Ingestion ID not found"))
  }

  test("one trailing slash is tolerated (Express non-strict routing)") {
    val viaSlash = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port/ingest/"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"ids": [8], "priority": "LOW"}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(viaSlash.statusCode() == 200)
    val id = extractId(viaSlash.body())
    assert(get(s"/status/$id/").statusCode() == 200)
    // but only one — double slash does not match (as in Express)
    assert(get(s"/status/$id//").statusCode() == 404)
  }

  test("integral-valued float literals are valid ids (JS Number.isInteger)") {
    // JSON 1.0 and 1e2 parse to integers in the reference's JS runtime
    val res = post("""{"ids": [1.0, 1e2, 3], "priority": "LOW"}""")
    assert(res.statusCode() == 200)
    val body = get(s"/status/${extractId(res.body())}").body()
      .replaceAll("\\s", "")
    assert(body.contains("\"ids\":[1,100,3]"))
    // genuinely fractional still 400s
    assert(post("""{"ids": [1.5], "priority": "LOW"}""").statusCode() == 400)
  }

  test("end-to-end: ingest over HTTP, processor drains, status completes") {
    val e2eEngine = new IngestEngine(GraftConfig.bench, SystemSleeper)
    val e2eServer = new GraftServer(e2eEngine, port = 0)
    val p = e2eServer.start()
    val proc = new graft.streaming.StreamingProcessor(
      graft.SparkSuite.session, e2eEngine, triggerMs = 50L)
    val query = proc.start()
    try {
      val res = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$p/ingest"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"ids": [1, 2, 3, 4], "priority": "HIGH"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      val id = extractId(res.body())
      val deadline = System.currentTimeMillis() + 30000
      var body = ""
      // the OVERALL status precedes "batches" in the rendered doc; a
      // bare substring would match an individual batch's status
      while (System.currentTimeMillis() < deadline &&
        !body.contains("\"status\": \"completed\", \"batches\"")) {
        Thread.sleep(100)
        body = client.send(
          HttpRequest.newBuilder(URI.create(s"http://localhost:$p/status/$id"))
            .GET().build(), HttpResponse.BodyHandlers.ofString()).body()
      }
      assert(body.contains("\"status\": \"completed\", \"batches\""))
      assert(e2eEngine.processLog.map(_._2) == Seq(id, id)) // 2 batches
    } finally { query.stop(); e2eServer.stop() }
  }

  private def extractId(body: String): String =
    "\"ingestion_id\": \"([0-9a-f-]+)\"".r
      .findFirstMatchIn(body).get.group(1)
}
