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
}
