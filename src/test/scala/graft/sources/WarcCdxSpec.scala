package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDX indexing ([[Warc.readCdx]]/[[Warc.indexRecords]]). The plain
  * layout is oracle-gated byte-for-byte (`q_warc_cdx`); these cases
  * pin what SQL cannot replay — compressed member extents — via the
  * property that MAKES an index an index: slicing the raw file at
  * `[offset, offset+length)` and re-reading must reproduce the
  * record. */
class WarcCdxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def recs(n: Int) = (0 until n).map { id =>
    ("response", s"http://x.example/p$id", "2024-01-01T00:00:00Z",
     s"<urn:uuid:$id>",
     s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody $id " * 1)
  }

  test("gzip member extents: ranged slice re-reads the record") {
    val raw = Warc.writeWarc(recs(6), gzipPerRecord = true)
    val idx = Warc.indexRecords(raw)
    assert(idx.length == 6)
    // extents tile the file exactly, in order
    assert(idx.head.offset == 0)
    idx.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.length == b.offset)
    }
    assert(idx.last.offset + idx.last.length == raw.length)
    // the index contract: a ranged GET of [offset, offset+length)
    // alone reproduces the record
    idx.foreach { ir =>
      val slice = java.util.Arrays.copyOfRange(
        raw, ir.offset.toInt, (ir.offset + ir.length).toInt)
      val re = Warc.recordsOf(slice)
      assert(re.length == 1)
      assert(re.head.targetUri == ir.record.targetUri)
      assert(java.util.Arrays.equals(re.head.body, ir.record.body))
    }
  }

  test("digests agree across layouts and name identical bodies") {
    val plain = Warc.indexRecords(Warc.writeWarc(recs(4)))
    val gz = Warc.indexRecords(Warc.writeWarc(recs(4), gzipPerRecord = true))
    assert(plain.map(_.digest) == gz.map(_.digest))
    assert(plain.forall(_.digest != null))
    // same body → same digest (recs' bodies differ by id → all distinct)
    assert(plain.map(_.digest).distinct.length == 4)
    val dup = Warc.indexRecords(Warc.writeWarc(recs(1) ++ recs(1)))
    assert(dup.map(_.digest).distinct.length == 1)
  }

  test("a corrupt gzip tail lands as one EOF-bound invalid row") {
    val raw = Warc.writeWarc(recs(4), gzipPerRecord = true)
    val idx0 = Warc.indexRecords(raw)
    // flip a byte in the THIRD member's gzip header magic
    val cut = idx0(2).offset.toInt
    val bad = raw.clone(); bad(cut) = 0x00
    val idx = Warc.indexRecords(bad)
    // two clean members survive, then the quarantine row
    assert(idx.count(_.record.warcType == "response") == 2)
    val inv = idx.last
    assert(inv.record.warcType == "invalid")
    assert(inv.offset == cut && inv.offset + inv.length == bad.length)
  }

  test("readCdx is the DataFrame spelling over shards") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdxspec")
    java.nio.file.Files.write(tmp.resolve("a.warc.gz"),
      Warc.writeWarc(recs(3), gzipPerRecord = true))
    java.nio.file.Files.write(tmp.resolve("b.warc"),
      Warc.writeWarc(recs(2)))
    val df = Warc.readCdx(spark, tmp.toString)
    assert(df.count() == 5)
    assert(df.filter(col("digest").isNotNull).count() == 5)
    // offsets are per-file: both shards start a record at 0
    assert(df.filter(col("offset") === 0).count() == 2)
  }
}
