package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC/1.0 writer — renders a `documents`-shaped DataFrame
  * (doc_id, text, lang, source, …) as ISO-28500 response records, the
  * interchange format every web-crawl training corpus ships in
  * (Common Crawl's WARC segments are the canonical 100-TB input). The
  * reference ETL consumes per-API JSON (building-inspector.js:50-83);
  * this sink plus [[graft.sources.v2.WarcDataSource]] extend the same
  * source/sink family to the crawl-archive format so a corpus can
  * round-trip graft → WARC → graft byte-exactly.
  *
  * Record layout (one per input row):
  * {{{
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Record-ID: <urn:md5:…>\r\n
  *   WARC-Date: 2020-01-01T<hh:mm:ss>Z\r\n
  *   WARC-Target-URI: http://<source>.example/doc/<doc_id>\r\n
  *   Content-Type: text/plain; charset=utf-8\r\n
  *   Content-Length: <payload UTF-8 bytes>\r\n
  *   \r\n
  *   <payload>\r\n\r\n
  * }}}
  *
  * Every derived header is deterministic arithmetic over the row
  * (record id = md5 of a tagged doc_id, date = doc_id-derived
  * hh:mm:ss), so a DuckDB oracle can replay the bytes without reading
  * the files back. Content-Length counts payload bytes in UTF-8 —
  * `octet_length`, not the character count — which is what makes the
  * reader's framing independent of payload contents (a payload
  * containing `\r\n\r\n` or header-looking lines parses fine; the
  * reader never scans payload bytes).
  *
  * The rendered record is ONE string column; the text writer with
  * `lineSep = \r\n` appends the record's final CRLF, completing the
  * spec's double-CRLF record separator. String rendering restricts
  * THIS sink to text payloads (the training-corpus case); the reader
  * side is fully binary and accepts any payload bytes.
  *
  * Scale shape: rendering is one zero-shuffle projection (everything
  * in-row, whole-stage codegen); files parallelize by the input's
  * partitioning, records never cross partition boundaries. No global
  * record order is promised — WARC readers (ours included) treat
  * files as unordered record bags, exactly like parquet part files.
  */
object Warc {

  /** The WARC record envelope around a payload expression: every
    * derived header stays deterministic row arithmetic so a DuckDB
    * oracle can replay the bytes without reading the files back.
    */
  private def envelope(
      docs: DataFrame,
      payload: org.apache.spark.sql.Column,
      contentType: String): DataFrame = {
    val two = (c: org.apache.spark.sql.Column) => lpad(c.cast("string"), 2, "0")
    val date = concat(
      lit("2020-01-01T"),
      two(col("doc_id") % 24), lit(":"),
      two(col("doc_id") % 60), lit(":"),
      two((col("doc_id") * 7) % 60), lit("Z"))
    docs.select(concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Record-ID: <urn:md5:"),
      md5(concat(lit("warc:"), col("doc_id").cast("string")).cast("binary")),
      lit(">\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("WARC-Target-URI: http://"), col("source"),
      lit(".example/doc/"), col("doc_id").cast("string"), lit("\r\n"),
      lit(s"Content-Type: $contentType\r\n"),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"),
      payload, lit("\r\n"),
    ).as("value"))
  }

  /** Render documents rows to one WARC record string per row. */
  def render(docs: DataFrame): DataFrame =
    envelope(docs, col("text"), "text/plain; charset=utf-8")

  /** The deterministic HTML wrapping of a document's text, shared by
    * [[renderHttp]] and the oracle replays of the http/wet entries.
    */
  def htmlBody: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>doc "), col("doc_id").cast("string"),
    lit("</title></head><body><p>"), col("text"), lit("</p></body></html>"))

  /** Render documents as `application/http; msgtype=response` WARC
    * records — the ACTUAL Common Crawl layout, where each payload is a
    * full HTTP response (status line, headers, blank line, HTML body)
    * and consumers must split headers from body before any text
    * processing. Status is 200 except every 17th doc (404), so a
    * status-filtering operator has real work; the body is the
    * deterministic [[htmlBody]] wrap either way.
    */
  def renderHttp(docs: DataFrame): DataFrame = {
    val status = when(col("doc_id") % 17 === 0, lit("404 Not Found"))
      .otherwise(lit("200 OK"))
    val http = concat(
      lit("HTTP/1.1 "), status, lit("\r\n"),
      lit("Content-Type: text/html; charset=utf-8\r\n"),
      lit("X-Crawl-Lang: "), col("lang"), lit("\r\n"),
      lit("Content-Length: "), octet_length(htmlBody).cast("string"),
      lit("\r\n\r\n"),
      htmlBody)
    envelope(docs, http, "application/http; msgtype=response")
  }

  /** Write documents as WARC part files under `path` (overwrite) —
    * via the DSv2 sink (byte-identical record stream to the text
    * writer with lineSep=CRLF, which this replaced), so plain archives
    * also carry the sidecar split index and planning reads marks
    * instead of skimming headers.
    */
  def write(docs: DataFrame, path: String): Unit =
    render(docs).write.format("warc").option("compression", "none")
      .mode("overwrite").save(path)

  /** Write documents as `.warc.gz` part files (overwrite): one gzip
    * MEMBER per record — the Common Crawl layout — via the DSv2 warc
    * sink, so the archives stay splittable (members are
    * self-delimiting; the reader's member walk starts at any member
    * boundary). A generic text sink with gzip compression would emit
    * ONE member per file and destroy splittability.
    */
  def writeGzip(docs: DataFrame, path: String): Unit =
    render(docs).write.format("warc").option("compression", "gzip")
      .mode("overwrite").save(path)

  /** Write documents as application/http WARC records (plain, via the
    * DSv2 sink — byte-identical envelope discipline to [[write]]).
    */
  def writeHttp(docs: DataFrame, path: String): Unit =
    renderHttp(docs).write.format("warc").option("compression", "none")
      .mode("overwrite").save(path)

  /** [[writeHttp]] as per-record gzip members. */
  def writeHttpGzip(docs: DataFrame, path: String): Unit =
    renderHttp(docs).write.format("warc").option("compression", "gzip")
      .mode("overwrite").save(path)
}
