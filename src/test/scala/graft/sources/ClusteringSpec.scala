package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering ([[Clustering]]): the Morton key is a correct
  * bit interleave, the clustered write preserves data exactly, and —
  * the point of the layout — file min/max envelopes prune BOTH
  * dimensions where a single-sort layout prunes one. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val F = 16 // files per layout

  // two independent uniform dimensions, deterministic
  private lazy val data = spark.range(4096)
    .select(col("id"),
      (col("id") * 48271 % 4096).as("a"),
      (col("id") * 69621 % 4096).as("b"))

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  test("zOrder2 interleaves bits (known values)") {
    val r = spark.range(1)
      .select(
        Clustering.zOrder2(lit(0L), lit(0L)).as("z00"),
        Clustering.zOrder2(lit(1L), lit(0L)).as("z10"),
        Clustering.zOrder2(lit(0L), lit(1L)).as("z01"),
        Clustering.zOrder2(lit(0xFFFFL), lit(0xFFFFL)).as("zff"),
        Clustering.zOrder2(lit(0b101L), lit(0b011L)).as("zmix"))
      .head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1L)          // a occupies even bits
    assert(r.getLong(2) == 2L)          // b occupies odd bits
    assert(r.getLong(3) == 0xFFFFFFFFL) // full interleave
    // a=101, b=011 -> bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert(r.getLong(4) == 27L)
  }

  test("scale16 maps the domain to [0,65535] monotonically") {
    val s = spark.range(1).select(
      Clustering.scale16(lit(0), 0, 100).as("lo"),
      Clustering.scale16(lit(100), 0, 100).as("hi"),
      Clustering.scale16(lit(50), 0, 100).as("mid"),
      Clustering.scale16(lit(7), 7, 7).as("degenerate")).head()
    assert(s.getLong(0) == 0L && s.getLong(1) == 65535L)
    assert(s.getLong(2) > 0L && s.getLong(2) < 65535L)
    assert(s.getLong(3) == 0L)
  }

  test("clustered write preserves rows exactly and lands numFiles files") {
    val path = tmp("zorder")
    Clustering.writeClustered(data, path, "a", "b", F)
    val back = spark.read.parquet(path)
    assert(back.schema.fieldNames.toSet == Set("id", "a", "b"))
    assert(back.count() == 4096)
    val orig = data.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet
    val got = back.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(got == orig)
    assert(Clustering.fileEnvelopes(spark, path, "a").count() == F)
  }

  test("z-order prunes BOTH dimensions; single-sort prunes one") {
    val zPath = tmp("zorder2")
    val sPath = tmp("asort")
    Clustering.writeClustered(data, zPath, "a", "b", F)
    // reference layout: range-sorted by a only
    data.repartitionByRange(F, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sPath)

    // a 1/8-domain range predicate on each dimension
    val (lo, hi) = (1024.0, 1535.0)
    val zA = Clustering.filesOverlapping(spark, zPath, "a", lo, hi)
    val zB = Clustering.filesOverlapping(spark, zPath, "b", lo, hi)
    val sA = Clustering.filesOverlapping(spark, sPath, "a", lo, hi)
    val sB = Clustering.filesOverlapping(spark, sPath, "b", lo, hi)

    // sorted-by-a: near-perfect on a, no pruning on b
    assert(sA <= F / 4, s"sorted layout should prune on a (got $sA/$F)")
    assert(sB == F, s"sorted layout cannot prune on b (got $sB/$F)")
    // z-order: real pruning on BOTH dimensions
    assert(zA <= F / 2, s"z layout should prune on a (got $zA/$F)")
    assert(zB <= F / 2, s"z layout should prune on b (got $zB/$F)")

    // and the data is identical across layouts under the predicate
    val q1 = spark.read.parquet(zPath)
      .filter(col("b").between(lo, hi)).agg(sum("id"), count(lit(1)))
      .head()
    val q2 = spark.read.parquet(sPath)
      .filter(col("b").between(lo, hi)).agg(sum("id"), count(lit(1)))
      .head()
    assert(q1 == q2)
  }

  test("zOrderN round-robin interleave (known values); n=2/16-bit " +
    "matches zOrder2 exactly") {
    val r = spark.range(1).select(
      Clustering.zOrderN(Seq(lit(1L), lit(0L), lit(0L)), 4).as("a1"),
      Clustering.zOrderN(Seq(lit(0L), lit(1L), lit(0L)), 4).as("b1"),
      Clustering.zOrderN(Seq(lit(0L), lit(0L), lit(1L)), 4).as("c1"),
      // a=0b11 -> bits 0,3 = 9; b=0b01 -> bit 1 = 2; c=0b10 -> bit 5
      Clustering.zOrderN(Seq(lit(3L), lit(1L), lit(2L)), 4).as("mix"))
      .head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getLong(2) == 4L)
    assert(r.getLong(3) == 9L + 2L + 32L)
    // the general interleave at n=2 equals the magic-number zOrder2
    // for every sampled input (same bit layout, different spelling;
    // the general path is forced by bits=15 vs delegated at 16)
    val probe = spark.range(512).select(
      (col("id") * 48271 % 32768).as("x"),
      (col("id") * 69621 % 32768).as("y"))
    val diff = probe.select(
      Clustering.zOrderN(Seq(col("x"), col("y")), 16).as("z2"),
      { // inline general interleave at 16 bits for comparison
        var acc = lit(0L)
        for (j <- 0 until 16; i <- 0 until 2) {
          val c = if (i == 0) col("x") else col("y")
          acc = acc.bitwiseOR(shiftleft(
            shiftright(c, j).bitwiseAND(lit(1L)), j * 2 + i))
        }
        acc.as("zg")
      }).filter(col("z2") =!= col("zg")).count()
    assert(diff == 0L)
    assert(Clustering.bitsPerCol(2) == 16 &&
      Clustering.bitsPerCol(3) == 16 && Clustering.bitsPerCol(4) == 15)
  }

  test("3-column z-order: EACH dimension's predicate prunes alone; " +
    "rows preserved exactly") {
    val F3 = 64
    val d3 = spark.range(8192).select(col("id"),
      (col("id") * 48271 % 4096).as("a"),
      (col("id") * 69621 % 4096).as("b"),
      (col("id") * 16807 % 4096).as("c"))
    val zPath = tmp("zorder3")
    val sPath = tmp("asort3")
    Clustering.writeClusteredN(d3, zPath, Seq("a", "b", "c"), F3)
    d3.repartitionByRange(F3, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sPath)
    // rows and values survive the layout change exactly
    val back = spark.read.parquet(zPath)
    assert(back.count() == 8192)
    assert(back.agg(sum("id"), sum("a"), sum("b"), sum("c")).head() ==
      d3.agg(sum("id"), sum("a"), sum("b"), sum("c")).head())
    // a 1/8-domain predicate per dimension: the single-sort layout
    // prunes only its sort column; the z layout prunes on ALL THREE
    val (lo, hi) = (1024.0, 1535.0)
    val sB = Clustering.filesOverlapping(spark, sPath, "b", lo, hi)
    assert(sB == F3, s"sorted-by-a layout cannot prune b (got $sB/$F3)")
    Seq("a", "b", "c").foreach { dim =>
      val kept = Clustering.filesOverlapping(spark, zPath, dim, lo, hi)
      assert(kept <= F3 / 2,
        s"z3 layout should prune on $dim alone (kept $kept/$F3)")
    }
    // and answers are identical across layouts under a pruned read
    val q1 = spark.read.parquet(zPath)
      .filter(col("c").between(lo, hi)).agg(sum("id"), count(lit(1)))
      .head()
    val q2 = spark.read.parquet(sPath)
      .filter(col("c").between(lo, hi)).agg(sum("id"), count(lit(1)))
      .head()
    assert(q1 == q2)
  }
}
