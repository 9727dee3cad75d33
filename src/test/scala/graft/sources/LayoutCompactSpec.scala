package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** [[Layout.compact]] — micro-batch file-sink maintenance: bounded
  * file counts, identical reads before/after, partition pruning
  * preserved, and a restart-safe swap resumable from every crash
  * point. */
class LayoutCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith("_") || f.getName.startsWith("."))
        Nil
      else Seq(f)
    walk(new java.io.File(dir))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("partitioned dir folds to one file per leaf; reads identical; pruning survives") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/docs"
    val docs = Tables.documents(spark, TestSpark.sf0001).repartition(8)
    docs.write.partitionBy("lang").parquet(dir) // one file per task per key
    val before = spark.read.parquet(dir)
    val beforeRows = sortedRows(before)
    val leafCount = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(dataFiles(dir).size > leafCount, "fixture must start fragmented")

    val stats = Layout.compact(spark, dir) // 128 MB target: 1 file/leaf
    assert(stats.leaves == leafCount)
    assert(stats.filesBefore > stats.filesAfter)
    assert(stats.filesAfter == leafCount,
      s"expected 1 file per leaf, got ${stats.filesAfter}")
    assert(stats.rows == beforeRows.size)

    val after = spark.read.parquet(dir)
    assert(sortedRows(after) == beforeRows, "reads must be identical")
    assert(Layout.isPartitionPruned(after.filter(col("lang") === "en")),
      "lang filter must still prune after compaction")
    // no scratch/marker dirs left behind
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("docs"))
  }

  test("target file size bounds per-leaf file count from above") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val docs = Tables.documents(spark, TestSpark.sf0001).repartition(8)
    docs.write.partitionBy("lang").parquet(dir)
    val leafBytes = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .map(d => d.getName -> dataFiles(d.getPath).map(_.length).sum).toMap
    val target = leafBytes.values.max / 2 + 1
    Layout.compact(spark, dir, targetFileBytes = target)
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .foreach { d =>
        val nf = dataFiles(d.getPath).size
        val bound = (leafBytes(d.getName) + target - 1) / target
        assert(nf >= 1 && nf <= bound,
          s"${d.getName}: $nf files, bound $bound")
      }
  }

  test("unpartitioned dir compacts to bounded files with identical reads") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/flat"
    val docs = Tables.documents(spark, TestSpark.sf0001).repartition(16)
    docs.write.parquet(dir)
    assert(dataFiles(dir).size > 1)
    val beforeRows = sortedRows(spark.read.parquet(dir))
    val stats = Layout.compact(spark, dir)
    assert(stats.leaves == 1 && stats.filesAfter == 1)
    assert(sortedRows(spark.read.parquet(dir)) == beforeRows)
  }

  test("streaming file-sink output compacts: sink log honored, reads identical") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-stream")
    val out = s"$tmp/landed"; val ckpt = s"$tmp/ckpt"
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.MultimodalIngest.land(
      graft.multimodal.Sniff.route(
        in.toDF().toDF("asset_id", "text")
          .withColumn("content", col("text").cast("binary"))),
      out, ckpt)
    try { // several micro-batches -> several file sets in the sink log
      (0 until 4).foreach { b =>
        in.addData((0 until 8).map(i =>
          (b * 8L + i, s"doc $b-$i body")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(new java.io.File(s"$out/_spark_metadata").exists())
    val beforeRows = sortedRows(spark.read.parquet(out))
    val filesBefore = dataFiles(out).size
    assert(filesBefore >= 4, "one file set per micro-batch expected")

    val stats = Layout.compact(spark, out)
    assert(stats.rows == 32)
    assert(stats.filesAfter < filesBefore)
    assert(sortedRows(spark.read.parquet(out)) == beforeRows)
    assert(Layout.isPartitionPruned(
      spark.read.parquet(out).filter(col("route") === "quarantine")))
  }

  test("restart safety: every crash point after the commit point resumes") {
    val base = Files.createTempDirectory("graft-compact-crash").toString
    val dir = s"$base/docs"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def seed(): Seq[String] = {
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val docs = Tables.documents(spark, TestSpark.sf0001)
        .limit(200).repartition(4)
      docs.write.partitionBy("lang").parquet(dir)
      sortedRows(spark.read.parquet(dir))
    }

    // crash A: scratch published (commit point passed), swap not begun
    val rowsA = seed()
    Layout.buildReady(spark, dir, targetFileBytes = 128L << 20)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact-ready")))
    val statsA = Layout.compact(spark, dir) // resume
    assert(statsA.rows == rowsA.size)
    assert(sortedRows(spark.read.parquet(dir)) == rowsA)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact-ready")))

    // crash B: source already renamed away (mid-swap), data only in ready
    val rowsB = seed()
    Layout.buildReady(spark, dir, targetFileBytes = 128L << 20)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".compact-old")))
    Layout.compact(spark, dir)
    assert(sortedRows(spark.read.parquet(dir)) == rowsB)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".compact-old")))

    // crash C: mid-BUILD (no commit point): stale scratch is discarded
    // and rebuilt from the intact source
    val rowsC = seed()
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".compact-tmp/lang=zz"))
    val statsC = Layout.compact(spark, dir)
    assert(statsC.rows == rowsC.size)
    assert(sortedRows(spark.read.parquet(dir)) == rowsC)
    val survivors = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!survivors.contains("lang=zz"), "stale scratch leaked into output")
  }
}
