package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURT-range-sorted URL index ([[UrlIndex]]). The q_surt_scan
  * oracle gates the subtree slice values; these cases pin what the
  * twin can't see — file PRUNING (the layout's reason to exist),
  * row preservation including the null-key quarantine, and the
  * subtree range arithmetic against label-character decoys. */
class UrlIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(): String = {
    val p = java.nio.file.Files
      .createTempDirectory("urlindex_spec").toString + "/idx"
    val urls = (0 until 320).map { id =>
      val host = (id % 8) match {
        case 0 => "alpha.example"
        case 1 => "beta.example"
        case 2 => "news.beta.example"
        case 3 => "betax.example"
        case 4 => "beta-2.example"
        case 5 => "gamma.example"
        case 6 => "www.beta.example"
        case _ => "zeta.example"
      }
      s"http://$host/p$id"
    } :+ "not a url" // one null-surt quarantine row
    UrlIndex.writeSurtIndexed(urls.toDF("url"), "url", p, numFiles = 8)
    p
  }

  test("write preserves every row, including the null-surt quarantine") {
    val p = writeFixture()
    val back = spark.read.parquet(p)
    assert(back.count() == 321)
    assert(back.filter(col("surt").isNull).count() == 1)
  }

  test("domain lookup captures the subtree, excludes prefix decoys") {
    val p = writeFixture()
    val hosts = UrlIndex.lookupDomain(spark, p, "beta.example")
      .select(lower(parse_url(col("url"), lit("HOST"))))
      .distinct().collect().map(_.getString(0)).toSet
    assert(hosts == Set("beta.example", "news.beta.example",
                        "www.beta.example"))
  }

  test("a domain lookup prunes to a fraction of the index files") {
    val p = writeFixture()
    val total = UrlIndex.fileEnvelopes(spark, p).count()
    assert(total >= 6, s"fixture should spread over files (got $total)")
    // each single domain's range overlaps only its neighborhood
    for (d <- Seq("alpha.example", "beta.example", "zeta.example")) {
      val opened = UrlIndex.filesOverlapping(spark, p, d)
      assert(opened <= total / 2,
        s"$d lookup should prune (opened $opened of $total)")
    }
  }

  test("domainRange bounds: label characters sort outside the subtree") {
    val (lo, hi) = UrlIndex.domainRange("beta.example")
    assert(lo == "example,beta)")
    assert(hi == "example,beta-")
    // subtree members inside, decoys outside, half-open
    assert("example,beta)/p1" >= lo && "example,beta)/p1" < hi)
    assert("example,beta,news)/p2" >= lo && "example,beta,news)/p2" < hi)
    assert("example,betax)/p3" >= hi)   // label letter > '-' boundary
    assert("example,beta-2)/p4" >= hi)  // dash label excluded half-open
    assert("example,alpha)/p0" < lo)
  }
}
