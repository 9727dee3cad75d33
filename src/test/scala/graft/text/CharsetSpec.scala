package graft.text

import java.nio.charset.StandardCharsets

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Charset sniffing, charset-aware decode, and mojibake repair
  * ([[CharsetSniff]]). */
class CharsetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sniff(body: Array[Byte], ct: String): String =
    Seq((body, ct)).toDF("b", "ct")
      .select(CharsetSniff.sniffCharset(col("b"), col("ct")))
      .head().getString(0)

  private def decode(body: Array[Byte], ct: String): String =
    Seq((body, ct)).toDF("b", "ct")
      .select(CharsetSniff.decodePayload(col("b"), col("ct")))
      .head().getString(0)

  private def fix(s: String): String =
    Seq(Tuple1(s)).toDF("s")
      .select(CharsetSniff.fixMojibake(col("s"))).head().getString(0)

  private def w1252(s: String): Array[Byte] =
    s.getBytes("windows-1252")

  test("BOM is authoritative over header and meta") {
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val body = bom ++ "<meta charset=\"iso-8859-1\">x".getBytes("UTF-8")
    assert(sniff(body, "text/html; charset=iso-8859-1") == "utf-8")
    // BOM bytes never leak into the decoded text
    assert(decode(bom ++ "hi".getBytes("UTF-8"), null) == "hi")
  }

  test("UTF-16 BOMs route to the right decoder") {
    val le = Array(0xff.toByte, 0xfe.toByte) ++
      "ab".getBytes(StandardCharsets.UTF_16LE)
    assert(sniff(le, null) == "utf-16le")
    assert(decode(le, null) == "ab")
    val be = Array(0xfe.toByte, 0xff.toByte) ++
      "cd".getBytes(StandardCharsets.UTF_16BE)
    assert(sniff(be, null) == "utf-16be")
    assert(decode(be, null) == "cd")
  }

  test("header charset beats meta; labels normalize per WHATWG") {
    val body = "<meta charset=\"utf-8\"><p>café</p>"
    assert(sniff(w1252(body), "text/html; charset=ISO-8859-1")
      == "windows-1252")
    assert(decode(w1252(body), "text/html; charset=ISO-8859-1")
      .contains("café"))
    // quoted parameter, extra params, case
    assert(sniff("x".getBytes, "text/html; charset=\"Latin1\"; q=1")
      == "windows-1252")
    assert(sniff("x".getBytes, "text/html;charset=UTF8") == "utf-8")
  }

  test("meta prescan: direct charset and http-equiv content forms") {
    val direct = "<html><head><meta charset=windows-1252></head>"
    assert(sniff(direct.getBytes, "text/html") == "windows-1252")
    val equiv = "<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\">"
    assert(sniff(equiv.getBytes, null) == "windows-1252")
    // beyond the 1024-byte prescan window the label is invisible
    val far = (" " * 1100) + "<meta charset=utf-16le>"
    assert(sniff(far.getBytes, null) == "utf-8") // valid-ASCII path
    // charset= inside prose (not a meta tag) does not match
    assert(sniff("<p>set charset=latin1 please</p>".getBytes, null)
      == "utf-8")
  }

  test("unlabeled: strict UTF-8 validation, else windows-1252") {
    assert(sniff("plain ascii".getBytes, null) == "utf-8")
    assert(sniff("café utf8".getBytes("UTF-8"), null) == "utf-8")
    assert(sniff(w1252("café legacy"), null) == "windows-1252")
    assert(decode(w1252("café legacy"), null) == "café legacy")
    // overlong and surrogate encodings are NOT valid UTF-8
    assert(sniff(Array(0xc0.toByte, 0xaf.toByte), null)
      == "windows-1252")
    assert(sniff(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte), null)
      == "windows-1252")
  }

  test("cp1252-specific bytes decode to their cp1252 code points") {
    // 0x93/0x94 are curly quotes in cp1252, unmapped in Latin-1 —
    // decoding them right proves the fallback really is cp1252
    val b = Array(0x93.toByte, 'q'.toByte, 0x94.toByte)
    assert(decode(b, null) == "“q”")
  }

  test("unknown labels fall through to validation, not failure") {
    assert(sniff("ascii body".getBytes, "text/html; charset=bogus-9")
      == "utf-8")
    assert(sniff(w1252("café"), "text/html; charset=bogus-9")
      == "windows-1252")
    // a known non-alias JVM charset label is honored
    assert(sniff("abc".getBytes, "text/plain; charset=koi8-r")
      == "koi8-r")
  }

  test("mojibake repairs; clean text is a fixed point") {
    val clean = "café naïve – “quoted”"
    val broken = CharsetSniff.mangle(clean)
    assert(broken != clean)
    assert(broken.contains("Ã")) // the Ã signature
    assert(fix(broken) == clean)
    // correctly-encoded text passes through untouched
    assert(fix(clean) == clean)
    assert(fix("plain ascii") == "plain ascii")
    // a LONE high char (not valid UTF-8 when re-encoded) stays put
    assert(fix("État") == "État")
  }

  test("double-mangled text repairs in two passes") {
    val clean = "déjà vu — encore"
    val twice = CharsetSniff.mangle(clean, rounds = 2)
    assert(twice != CharsetSniff.mangle(clean))
    assert(fix(twice) == clean)
  }

  test("null content-type column is absent-header, not null result") {
    val df = Seq((w1252("café"), Option.empty[String]))
      .toDF("b", "ct")
      .select(CharsetSniff.sniffCharset(col("b"), col("ct")).as("c"),
              CharsetSniff.decodePayload(col("b"), col("ct")).as("t"))
    val r = df.head()
    assert(r.getString(0) == "windows-1252")
    assert(r.getString(1) == "café")
  }

  test("kernels run inside whole-stage codegen") {
    // a range scan (unlike a LocalTableScan) compiles whole-stage —
    // the kernels appearing inside that span proves the doGenCode
    // path, not just the interpreted eval
    val df = spark.range(4)
      .select(CharsetSniff.sniffCharset(
        encode(concat(lit("café "), col("id")), "utf-8"),
        lit("text/html")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)")) // the WholeStageCodegen stage marker
    assert(df.collect().forall(_.getString(0) == "utf-8"))
    val fixed = spark.range(4)
      .select(CharsetSniff.fixMojibake(
        concat(lit("cafÃ© "), col("id"))).as("t"))
    assert(fixed.queryExecution.executedPlan.toString.contains("*(1)"))
    assert(fixed.collect().zipWithIndex.forall {
      case (r, i) => r.getString(0) == s"café $i"
    })
  }
}
