package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Duration

/** Driver-side ingest of the three Building Inspector datasets
  * (SURVEY §2.1 S1-S3; reference download step,
  * building-inspector.js:337-369). Not a Spark job: a sequential,
  * rate-limited page loop materializing landing files the engine then
  * reads. The reference's resilience policy is kept: 25 s timeout,
  * 5 retries (building-inspector.js:14-18), 1000 ms sleep between
  * pages (building-inspector.js:64).
  *
  * Unlike the reference (one FeatureCollection envelope per file,
  * building-inspector.js:55), the paginated writer emits NDJSON — one
  * feature per line — so the transform reads it fully parallel at any
  * scale ([[GeoJson.featuresNdjson]]); the single-shot fetch keeps the
  * upstream body verbatim.
  */
object Ingest {

  final case class Options(
      timeoutMs: Long = 25000,
      retries: Int = 5,
      pageSleepMs: Long = 1000,
  )

  private def client(o: Options): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(o.timeoutMs)).build()

  /** GET with retries; returns the body. */
  def fetch(url: String, o: Options = Options()): String = {
    val c = client(o)
    var attempt = 0
    var last: Throwable = null
    while (attempt <= o.retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(o.timeoutMs)).GET().build()
        val resp = c.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return resp.body()
        last = new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      } catch { case t: Throwable => last = t }
      attempt += 1
    }
    throw last
  }

  /** Paginated loop: GET {base}/page/{n} until a page has no features;
    * extract `features[]` per page and append one JSON object per line.
    * `extractFeatures` is injected so tests can drive the loop without
    * a JSON parser dependency here.
    */
  def pagesToNdjson(
      base: String,
      out: String,
      extractFeatures: String => Seq[String],
      o: Options = Options(),
      sleeper: Long => Unit = Thread.sleep,
      fetcher: (String, Options) => String = fetch(_, _),
  ): Int = {
    Files.deleteIfExists(Paths.get(out))
    Files.createFile(Paths.get(out))
    var page = 0
    var more = true
    var total = 0
    while (more) {
      page += 1
      val body = fetcher(s"$base/page/$page", o)
      val features = extractFeatures(body)
      if (features.nonEmpty) {
        Files.write(
          Paths.get(out),
          (features.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.APPEND)
        total += features.size
        sleeper(o.pageSleepMs)
      } else more = false
    }
    total
  }

  /** Single-shot fetch to file (toponyms, sheets). */
  def toFile(url: String, out: String, o: Options = Options()): Unit =
    Files.write(Paths.get(out), fetch(url, o).getBytes(StandardCharsets.UTF_8))
}
