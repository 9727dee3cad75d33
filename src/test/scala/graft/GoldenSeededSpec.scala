package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Hard-equality gates for the five SEEDED queries the driver can only
  * rows-check (no SQL oracle): committed sf0.01 golden outputs, fixed
  * seeds, fixed test-session partitioning (TestSpark local[8]/8
  * shuffle partitions — randomSplit/LSH/ALS are deterministic for a
  * fixed seed AND fixed partitioning, SURVEY §7.7.5). Floats are pinned
  * at 6dp; row order is canonicalized by sorting, so only CONTENT
  * changes trip the gate.
  *
  * After an INTENDED semantic change, regenerate with:
  * {{{ GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenSeededSpec" }}}
  * and commit the diff (review it — it IS the behavior change).
  */
class GoldenSeededSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"
  private val Seeded = Seq("q_minhash_twins", "q_als_recommend",
    "q_dedup_minhash", "q_simhash_neardup", "q_embedding_neardup",
    "q_semantic_dedup", "q_ann_topk", "q_ivf_topk", "q_nsw_topk",
    "q_phash_neardup",
    "q_pq_topk", "q_ivfpq_residual",
    "q_image_embed", "q_audio_embed",
    "q_audio_fingerprint", "q_video_framedup",
    // not seeded but equally un-oracle-able: deterministic merge /
    // lattice recursions with no SQL form
    "q_bpe_tokens", "q_unigram_tokens", "q_wordpiece_tokens",
    "q_lang_id_model",
    // deterministic zlib output with no DuckDB deflate function
    "q_deflate_ratio")

  private val goldenDir = new java.io.File("src/test/resources/golden")

  /** Schema line + sorted, delimiter-joined, 6dp-float rows. */
  private def canonical(df: DataFrame): Seq[String] = {
    val fields = df.schema.fields.toIndexedSeq
    val header = fields.map(f => s"${f.name}:${f.dataType.simpleString}")
      .mkString("|")
    val rows = df.collect().map { row =>
      fields.zipWithIndex.map { case (f, i) =>
        // Locale.ROOT: the f-interpolator uses the JVM default locale,
        // which would render "0,123456" on comma-decimal locales and
        // break (or mis-regenerate) every golden
        if (row.isNullAt(i)) "NULL"
        else f.dataType match {
          case DoubleType => String.format(java.util.Locale.ROOT,
            "%.6f", Double.box(row.getDouble(i)))
          case FloatType  => String.format(java.util.Locale.ROOT,
            "%.6f", Double.box(row.getFloat(i).toDouble))
          case _          => row.get(i).toString
        }
      }.mkString("|")
    }.sorted.toIndexedSeq
    header +: rows
  }

  Seeded.foreach { name =>
    test(s"$name equals its committed sf0.01 golden output") {
      val got = canonical(SparkEntry.queries(name)(spark, sfDir))
      val file = new java.io.File(goldenDir, s"$name.golden")
      if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")) {
        goldenDir.mkdirs()
        java.nio.file.Files.write(file.toPath,
          (got.mkString("\n") + "\n").getBytes("UTF-8"))
        info(s"regenerated $file (${got.size - 1} rows)")
      } else {
        assert(file.exists(),
          s"$file missing — regenerate with GRAFT_REGEN_GOLDEN=1")
        val expected = new String(
          java.nio.file.Files.readAllBytes(file.toPath), "UTF-8")
          .linesIterator.toSeq
        assert(got.size == expected.size,
          s"row count ${got.size - 1} != golden ${expected.size - 1}")
        val diffs = got.zip(expected).zipWithIndex
          .collect { case ((g, e), i) if g != e => s"line $i: $g != $e" }
        assert(diffs.isEmpty, diffs.take(5).mkString("\n"))
      }
    }
  }
}
