package graft.sources

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Real-socket ingest test: a local HTTP server serves the reference
  * API shape (paginated consolidated pages, single-shot toponyms and
  * sheets, plus one flaky endpoint) and Engine.download drives the
  * actual java.net.http client through it — pagination until the empty
  * page, retry-on-500, and landing-file layout.
  */
class HttpIngestSpec extends AnyFunSuite {

  private def withServer(test: (String, () => Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var flakyHits = 0
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/api", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        path match {
          case p if p.endsWith("/consolidated/page/1") =>
            respond(ex, 200, """{"features": ["f1", "f2"]}""")
          case p if p.endsWith("/consolidated/page/2") =>
            respond(ex, 200, """{"features": ["f3"]}""")
          case p if p.matches(".*/consolidated/page/\\d+") =>
            respond(ex, 200, """{"features": []}""")
          case p if p.endsWith("/toponyms") =>
            // fail twice, succeed on the third attempt (retry policy)
            flakyHits += 1
            if (flakyHits < 3) respond(ex, 500, "boom")
            else respond(ex, 200, """{"type":"FeatureCollection","features":[]}""")
          case p if p.endsWith("/sheets") =>
            respond(ex, 200, """{"type":"FeatureCollection","features":[1]}""")
          case _ => respond(ex, 404, "nope")
        }
      }
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/api", () => flakyHits)
    finally server.stop(0)
  }

  test("download drives pagination, retry, and landing files over real HTTP") {
    withServer { (base, flakyHits) =>
      val out = Files.createTempDirectory("ingest-http").toString
      graft.Engine.download(
        base, out,
        body => "\"f\\d+\"".r.findAllIn(body).toSeq,
        graft.sources.Ingest.Options(timeoutMs = 5000, retries = 5, pageSleepMs = 1),
      )
      val consolidated = Files.readString(Paths.get(s"$out/consolidated.ndjson"))
      assert(consolidated == "\"f1\"\n\"f2\"\n\"f3\"\n")
      assert(Files.readString(Paths.get(s"$out/toponyms.geojson"))
        .contains("FeatureCollection"))
      assert(flakyHits() == 3, "two 500s then success = retry policy exercised")
      assert(Files.readString(Paths.get(s"$out/sheets.geojson")).contains("features"))
    }
  }
}
