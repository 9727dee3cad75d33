package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) — THE web-crawl container: Common Crawl, the
  * Internet Archive, and every self-hosted fetcher land pages as
  * WARC shards, so a 100-TB curation engine that cannot read them
  * starts from someone else's ETL. A WARC file is a sequence of
  * records — `WARC/1.0` version line, named headers (`WARC-Type`,
  * `WARC-Target-URI`, `WARC-Date`, `Content-Length`), blank line,
  * exactly `Content-Length` payload bytes, blank separator — and
  * Common Crawl ships each record as its own concatenated-gzip
  * member, which the explicit member walker in [[gunzip]] handles.
  *
  * ==What the reader emits==
  * One row per record: the WARC headers that matter for curation,
  * plus — for `response` records — the parsed HTTP status line,
  * `Content-Type`, and the HTTP BODY as binary (the bytes the HTML
  * pipeline consumes). Malformed records (bad version line, missing
  * or lying `Content-Length`, truncated payload) quarantine the REST
  * of that file member with `warc_type = "invalid"` — never a throw,
  * never a guess about where the next record starts.
  *
  * ==Scale notes==
  * Files load via Spark's `binaryFile` source — one task per shard,
  * the crawl world's natural parallelism unit (Common Crawl shards
  * are ~1 GB compressed, well under `binaryFile`'s 2 GB bound; the
  * record ITERATOR streams over the loaded bytes, nothing is copied
  * per record but the payload slice). Record parsing is per-task
  * map work; no shuffle until the caller aggregates. A deployment
  * needing >2 GB single files swaps the loader for a Hadoop stream
  * — the record walker is `Array[Byte]`-independent of how bytes
  * arrive. */
object Warc {

  /** One parsed record. `httpStatus`/`contentType`/`body` are
    * populated for `response` records with a parseable HTTP block;
    * `body` is null otherwise. `warcFields` carries the parsed
    * `application/warc-fields` block of `warcinfo`/`metadata`
    * records (crawl provenance: software, isPartOf, operator …);
    * `requestLine` carries a `request` record's HTTP request line —
    * the audit trail of WHAT was asked for, the other half of a
    * responsible-crawl story. */
  final case class Record(warcType: String, targetUri: String,
                          warcDate: String, recordId: String,
                          httpStatus: Int, contentType: String,
                          body: Array[Byte],
                          warcFields: Map[String, String] = null,
                          requestLine: String = null,
                          httpLocation: String = null,
                          httpHeaders: Map[String, String] = null)

  private val Crlf = "\r\n"

  /** Parse one header block (version line + `Name: value` lines up
    * to a blank line) starting at `off`. Returns (headers lowercased
    * by name, index past the blank line), or null on a malformed
    * block. */
  private def headerBlock(b: Array[Byte], off: Int, expectVersion: Boolean)
      : (Map[String, String], Int) = {
    var i = off
    def line(): String = {
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) return null
      val s = new String(b, start, i - start, StandardCharsets.UTF_8)
      i += 2
      s
    }
    val first = line()
    if (first == null) return null
    if (expectVersion && !first.startsWith("WARC/")) return null
    val hdrs = Map.newBuilder[String, String]
    if (!expectVersion) {
      // HTTP status line: "HTTP/1.1 200 OK"
      hdrs += ("" -> first)
    }
    var l = line()
    while (l != null && l.nonEmpty) {
      val c = l.indexOf(':')
      if (c > 0)
        hdrs += (l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
                   -> l.substring(c + 1).trim)
      l = line()
    }
    if (l == null) null else (hdrs.result(), i)
  }

  /** Walk the records of one (decompressed) WARC byte stream. */
  def parseWarc(bytes: Array[Byte]): Seq[Record] =
    parseWarcExtents(bytes).map(_._1)

  /** [[parseWarc]] plus each record's byte EXTENT `(start, end)` in
    * the stream (version line through the trailing record separator)
    * — the indexing fact a CDX needs for range-request retrieval.
    * The terminal `invalid` marker's extent covers the unparseable
    * tail. */
  private[sources] def parseWarcExtents(bytes: Array[Byte])
      : Seq[(Record, Int, Int)] = {
    val out = Seq.newBuilder[(Record, Int, Int)]
    var i = 0
    var dead = false
    while (!dead && i < bytes.length) {
      val start = i
      headerBlock(bytes, i, expectVersion = true) match {
        case null => dead = true
          out += ((Record("invalid", null, null, null, 0, null, null),
                   start, bytes.length))
        case (h, bodyStart) =>
          val len = try h.getOrElse("content-length", "-1").toLong
                    catch { case _: NumberFormatException => -1L }
          if (len < 0 || bodyStart + len > bytes.length) {
            dead = true
            out += ((Record("invalid", h.getOrElse("warc-target-uri", null),
                            null, null, 0, null, null),
                     start, bytes.length))
          } else {
            val payload = java.util.Arrays.copyOfRange(
              bytes, bodyStart, (bodyStart + len).toInt)
            val wtype = h.getOrElse("warc-type", "unknown")
            var status = 0; var ctype: String = null
            var body: Array[Byte] = null
            var fields: Map[String, String] = null
            var reqLine: String = null
            var location: String = null
            var headers: Map[String, String] = null
            if (wtype == "response")
              headerBlock(payload, 0, expectVersion = false) match {
                case null => ()
                case (hh, hb) =>
                  val statusLine = hh.getOrElse("", "")
                  val parts = statusLine.split(" ")
                  if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
                    status = try parts(1).toInt
                             catch { case _: NumberFormatException => 0 }
                  ctype = hh.getOrElse("content-type", null)
                  // the redirect fact: where a 3xx sends the crawler
                  // (RFC 9110 Location may be RELATIVE - callers
                  // resolve against the request URI)
                  location = hh.getOrElse("location", null)
                  // the FULL response header map (lowercased names,
                  // repeats last-wins — declared semantics): the
                  // general surface X-Robots-Tag / ETag /
                  // Last-Modified / Cache-Control policies read
                  headers = hh - ""
                  body = java.util.Arrays.copyOfRange(
                    payload, hb, payload.length)
              }
            else if (wtype == "request")
              // the HTTP request line ("GET /path HTTP/1.1") is the
              // provenance fact; request headers parse but stay
              // internal (no curation stage keys on them yet)
              headerBlock(payload, 0, expectVersion = false) match {
                case null => ()
                case (hh, _) => reqLine = hh.getOrElse("", null)
              }
            else if (wtype == "conversion") {
              // WET (Common Crawl extracted text): the payload IS the
              // text — no HTTP block; Content-Type is the WARC
              // record's own header (text/plain)
              body = payload
              ctype = h.getOrElse("content-type", null)
            } else if (wtype == "warcinfo" || wtype == "metadata") {
              if (wtype == "metadata" && payload.length > 0 &&
                  payload(0) == '{') {
                // WAT (Common Crawl metadata): a JSON envelope, not
                // warc-fields — surface the raw JSON for Spark-side
                // get_json_object extraction
                body = payload
                ctype = h.getOrElse("content-type", null)
              } else
                // application/warc-fields: "Name: value" lines — the
                // crawl's self-description (software, isPartOf, …)
                fields = new String(payload, StandardCharsets.UTF_8)
                  .split("\r?\n").iterator
                  .flatMap { l =>
                    val c = l.indexOf(':')
                    if (c <= 0) None
                    else Some(
                      l.substring(0, c).trim
                        .toLowerCase(java.util.Locale.ROOT) ->
                        l.substring(c + 1).trim)
                  }.toMap
            }
            // past the payload and the \r\n\r\n record separator
            i = (bodyStart + len).toInt
            while (i + 1 < bytes.length &&
                   b2(bytes, i)) i += 2
            out += ((Record(wtype,
              h.getOrElse("warc-target-uri", null),
              h.getOrElse("warc-date", null),
              h.getOrElse("warc-record-id", null),
              status, ctype, body, fields, reqLine, location, headers),
              start, i))
          }
      }
    }
    out.result()
  }

  private def b2(b: Array[Byte], i: Int): Boolean =
    b(i) == '\r' && b(i + 1) == '\n'

  /** Gunzip a (possibly multi-member) stream — the Common Crawl
    * record-per-member layout — returning `(bytes, clean)`. The
    * member walk is explicit (header parse + `Inflater` + 8-byte
    * trailer) because `GZIPInputStream` treats a CORRUPT next-member
    * header as a clean end-of-stream: with it, one flipped byte at a
    * member boundary would silently drop every later record with no
    * quarantine row. Here any unconsumed tail — bad member header,
    * mid-member corruption, missing trailer — yields the bytes
    * decompressed so far and `clean = false`, which [[readWarc]]
    * turns into an `invalid` marker row (never a task-killing throw
    * for one bad shard). Non-gzip bytes pass through clean. */
  private[sources] def gunzip(bytes: Array[Byte]): (Array[Byte], Boolean) = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return (bytes, true)
    val walk = gzipMemberExtents(bytes)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    walk.members.foreach { case (_, _, m) => out.write(m) }
    (out.toByteArray, walk.clean)
  }

  /** One gzip member walk: each member's compressed EXTENT `(offset,
    * length)` in the file — the CDX retrieval fact for the Common
    * Crawl record-per-member layout — plus its decompressed bytes.
    * On corruption (`clean = false`) the partially-decompressed
    * member (if any bytes inflated) is still included with its
    * extent running to EOF, and `failedAt` marks where the walk
    * died — the quarantine offset an index row carries. */
  private[sources] final case class MemberWalk(
      members: Seq[(Int, Int, Array[Byte])], clean: Boolean,
      failedAt: Int)

  private[sources] def gzipMemberExtents(bytes: Array[Byte]): MemberWalk = {
    val out = Seq.newBuilder[(Int, Int, Array[Byte])]
    var i = 0
    var clean = true
    var halt = false
    var failedAt = -1
    while (!halt && i < bytes.length) {
      val h = gzipHeaderEnd(bytes, i)
      if (h < 0) { clean = false; halt = true; failedAt = i }
      else {
        val inf = new java.util.zip.Inflater(true) // raw deflate
        inf.setInput(bytes, h, bytes.length - h)
        val mem = new ByteArrayOutputStream(1 << 16)
        val buf = new Array[Byte](1 << 16)
        var memOk = false
        try {
          var n = inf.inflate(buf)
          while (n > 0 || (!inf.finished() && !inf.needsInput())) {
            mem.write(buf, 0, n); n = inf.inflate(buf)
          }
          if (!inf.finished()) { clean = false; halt = true; failedAt = i }
          else {
            val next = h + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE
            if (next > bytes.length) {
              clean = false; halt = true; failedAt = i
            } else {
              out += ((i, next - i, mem.toByteArray))
              memOk = true
              i = next
            }
          }
        } catch {
          case _: java.util.zip.DataFormatException =>
            clean = false; halt = true; failedAt = i
        } finally inf.end()
        // a partially-inflated member still surfaces its bytes (the
        // pre-refactor gunzip concatenated them — complete records
        // inside a cut member stay readable) with an EOF-bound extent
        if (!memOk && mem.size() > 0)
          out += ((i, bytes.length - i, mem.toByteArray))
      }
    }
    MemberWalk(out.result(), clean, failedAt)
  }

  /** Index just past one gzip member header starting at `off`, or -1
    * if the bytes there are not a valid header (RFC 1952: magic, CM=8,
    * then optional FEXTRA/FNAME/FCOMMENT/FHCRC fields per FLG). */
  private def gzipHeaderEnd(b: Array[Byte], off: Int): Int = {
    if (off + 10 > b.length) return -1
    if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b ||
        (b(off + 2) & 0xff) != 8) return -1
    val flg = b(off + 3) & 0xff
    var i = off + 10
    if ((flg & 4) != 0) { // FEXTRA: u16le length
      if (i + 2 > b.length) return -1
      val xlen = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      i += 2 + xlen
      if (i > b.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return -1
      i += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return -1
      i += 1
    }
    if ((flg & 2) != 0) { // FHCRC
      i += 2
      if (i > b.length) return -1
    }
    i
  }

  /** Records of one shard's raw (possibly gzipped) bytes — gunzip,
    * record walk, and the boundary-cut quarantine marker in one call;
    * shared by the batch reader and the streaming ingest
    * ([[graft.streaming.CrawlIngest]]). A gzip cut exactly at a
    * record boundary parses clean — surface it as one quarantine row
    * (mid-record cuts are already flagged by [[parseWarc]]; don't
    * double-flag). */
  private[graft] def recordsOf(raw: Array[Byte]): Seq[Record] = {
    val (bytes, clean) = gunzip(raw)
    val recs = parseWarc(bytes)
    if (clean || recs.lastOption.exists(_.warcType == "invalid")) recs
    else recs :+ Record("invalid", null, null, null, 0, null, null)
  }

  /** Read WARC shards (plain or gzip) → one row per record:
    * `(warc_file, warc_type, target_uri, warc_date, record_id,
    * http_status, content_type, body, warc_fields, request_line,
    * http_location, http_headers)`. `http_headers` is the full
    * response header map (lowercased names, repeats last-wins) —
    * the general surface X-Robots-Tag / ETag / Last-Modified /
    * Cache-Control policies read; null on non-response records. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        recordsOf(raw).map(r =>
          (p, r.warcType, r.targetUri, r.warcDate, r.recordId,
           r.httpStatus, r.contentType, r.body, r.warcFields,
           r.requestLine, r.httpLocation, r.httpHeaders))
      }
      .toDF("warc_file", "warc_type", "target_uri", "warc_date",
            "record_id", "http_status", "content_type", "body",
            "warc_fields", "request_line", "http_location",
            "http_headers")
  }

  /** Read WET shards (Common Crawl extracted-text sidecars: WARC
    * files of `conversion` records whose payload is the page text) →
    * `(warc_file, target_uri, warc_date, record_id, text)`. The same
    * walker as [[readWarc]] — WET is WARC syntax — filtered to the
    * conversion records, payload decoded as UTF-8 (the WET
    * contract). Map-shaped per shard, like every source here. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("warc_file"), col("target_uri"), col("warc_date"),
        col("record_id"), decode(col("body"), "UTF-8").as("text"))

  /** Read WAT shards (Common Crawl metadata sidecars: WARC files of
    * `metadata` records carrying a JSON envelope) → `(warc_file,
    * target_uri, warc_date, record_id, json)`. Field extraction is
    * the caller's `get_json_object` over `json` — the envelope is
    * deeply nested and version-skewed, so the source stays schema-
    * free and extraction stays declarative (codegen'd JSON path
    * evaluation, no UDF). */
  def readWat(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .filter(col("warc_type") === "metadata" &&
        col("content_type").contains("json"))
      .select(col("warc_file"), col("target_uri"), col("warc_date"),
        col("record_id"), decode(col("body"), "UTF-8").as("json"))

  // ---- CDX indexing ------------------------------------------------

  /** One index row: the record, its byte extent in the FILE (the
    * compressed member extent under the record-per-member gzip
    * layout — the unit a ranged GET retrieves; the raw record extent
    * for plain files), and the sha256 hex digest of the record's
    * content (HTTP body for `response` records with a parsed block,
    * whole payload-ish content otherwise; null when there is none). */
  final case class IndexedRecord(record: Record, offset: Long,
                                 length: Long, digest: String)

  private def sha256Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(b)
    val sb = new java.lang.StringBuilder(64)
    d.foreach(x => sb.append("%02x".format(x & 0xff)))
    sb.toString
  }

  /** CDX rows of one shard's raw bytes. Gzip shards index by
    * compressed MEMBER extent (a multi-record member repeats its
    * extent per record — the member is the retrieval unit); plain
    * shards by record extent. A corrupt gzip tail lands as one
    * `invalid` row whose extent covers the unwalkable remainder —
    * the index never silently shortens a file. */
  private[graft] def indexRecords(raw: Array[Byte]): Seq[IndexedRecord] = {
    def digestOf(r: Record): String =
      if (r.body != null) sha256Hex(r.body) else null
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
        (raw(1) & 0xff) == 0x8b) {
      val walk = gzipMemberExtents(raw)
      val rows = walk.members.flatMap { case (off, len, bytes) =>
        parseWarc(bytes).map(r =>
          IndexedRecord(r, off, len, digestOf(r)))
      }
      if (walk.clean) rows
      else rows :+ IndexedRecord(
        Record("invalid", null, null, null, 0, null, null),
        math.max(walk.failedAt, 0),
        raw.length - math.max(walk.failedAt, 0), null)
    } else
      parseWarcExtents(raw).map { case (r, start, end) =>
        IndexedRecord(r, start, end - start, digestOf(r))
      }
  }

  /** The CDX surface: one index row per record across WARC shards —
    * `(warc_file, warc_type, target_uri, warc_date, http_status,
    * content_type, digest, offset, length)`. Same `binaryFile`
    * map-shape as [[readWarc]]; the output IS the random-access +
    * digest-dedup index Common Crawl publishes beside its crawls
    * (their CDXJ carries exactly these facts). Cross-crawl digest
    * dedup = group this frame by `digest`. */
  def readCdx(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        indexRecords(raw).map(ir =>
          (p, ir.record.warcType, ir.record.targetUri, ir.record.warcDate,
           ir.record.httpStatus, ir.record.contentType, ir.digest,
           ir.offset, ir.length))
      }
      .toDF("warc_file", "warc_type", "target_uri", "warc_date",
            "http_status", "content_type", "digest", "offset", "length")
  }

  // ---- fixture writer (the encoder side of the same syntax) --------

  /** Serialize records into one WARC file's bytes; `gzipPerRecord`
    * writes the Common Crawl record-per-member layout. */
  def writeWarc(records: Seq[(String, String, String, String, String)],
                gzipPerRecord: Boolean = false): Array[Byte] =
    writeWarcRaw(records.map { case (t, u, d, r, http) =>
      (t, u, d, r, http.getBytes(StandardCharsets.UTF_8))
    }, gzipPerRecord)

  /** Byte-payload spelling of [[writeWarc]] — the charset fixtures
    * need HTTP bodies in encodings a String round-trip would
    * destroy (windows-1252 bytes, BOMs, invalid UTF-8). */
  def writeWarcRaw(
      records: Seq[(String, String, String, String, Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    // (warcType, uri, date, recordId, httpPayload bytes)
    val out = new ByteArrayOutputStream()
    records.foreach { case (wtype, uri, date, rid, payload) =>
      val rec = new ByteArrayOutputStream()
      val hdr = new StringBuilder()
        .append("WARC/1.0").append(Crlf)
        .append("WARC-Type: ").append(wtype).append(Crlf)
      if (uri != null)
        hdr.append("WARC-Target-URI: ").append(uri).append(Crlf)
      hdr.append("WARC-Date: ").append(date).append(Crlf)
        .append("WARC-Record-ID: ").append(rid).append(Crlf)
        .append("Content-Type: ").append(wtype match {
          case "metadata" if payload.length > 0 && payload(0) == '{' =>
            "application/json"
          case "warcinfo" | "metadata" => "application/warc-fields"
          case "conversion" => "text/plain"
          case "request" => "application/http; msgtype=request"
          case _ => "application/http; msgtype=response"
        }).append(Crlf)
        .append("Content-Length: ").append(payload.length).append(Crlf)
        .append(Crlf)
      rec.write(hdr.toString.getBytes(StandardCharsets.UTF_8))
      rec.write(payload)
      rec.write(s"$Crlf$Crlf".getBytes(StandardCharsets.UTF_8))
      if (gzipPerRecord) {
        val gz = new ByteArrayOutputStream()
        val g = new GZIPOutputStream(gz)
        g.write(rec.toByteArray); g.close()
        out.write(gz.toByteArray)
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }
}
