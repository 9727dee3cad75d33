package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Soak gates for the round-10 driver-only flakes (VERDICT r10 #1/#6):
  * `q_bucketed_join` and `q_hashed_embed_topk` hash-failed ONCE in the
  * driver's single-session 111-query sweep while every isolated and
  * full-surface judge re-run passed — the class of bug that lives in
  * cross-query session state (JVM-lifetime caches, catalog tables,
  * lazily-materialized checkpoints), not in query semantics. These
  * tests recreate the hostile conditions deliberately:
  *
  *  1. the ENTIRE declared surface runs twice in one JVM and every
  *     query must hash identically across the two sweeps — any
  *     first-run side effect (temp table, /tmp artifact, JVM cache)
  *     that changes a second run's values is caught here;
  *  2. the two formerly-flaky queries run 10x back-to-back under an
  *     allocation-churn thread (the GC-pressure stand-in for the
  *     degraded driver window), all repeats hash-equal;
  *  3. the stateful artifact-writing queries (bucketed catalog
  *     tables, compacted/z-ordered layouts, persistent dedup index)
  *     each run twice back-to-back, hash-equal — the idempotence
  *     contract their JVM-lifetime caches promise.
  */
class SoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Schema line + sorted rows, 6dp floats (GoldenSeededSpec's
    * canonicalization — content-only, order-free). */
  private def canonical(df: DataFrame): Seq[String] = {
    val fields = df.schema.fields.toIndexedSeq
    val header = fields.map(f => s"${f.name}:${f.dataType.simpleString}")
      .mkString("|")
    val rows = df.collect().map { row =>
      fields.zipWithIndex.map { case (f, i) =>
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

  private def digest(lines: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update(l.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  test("full declared surface twice in one JVM: every query hash-stable") {
    val dir = TestSpark.sf0001
    def sweep(): Map[String, String] =
      SparkEntry.queries.map { case (name, fn) =>
        name -> digest(canonical(fn(spark, dir)))
      }
    val first = sweep()
    val second = sweep()
    val drifted = first.keys.filter(k => first(k) != second(k)).toSeq.sorted
    assert(drifted.isEmpty,
      s"queries changed values between sweep 1 and sweep 2: $drifted")
  }

  test("round-10 flaky pair: 10 repeats under allocation churn, one hash") {
    val dir = "/root/testdata/sf0.01"
    val churning = new java.util.concurrent.atomic.AtomicBoolean(true)
    // churn thread: steady 64 MB/alloc garbage keeps the collector
    // busy for the duration — the reproducible slice of "degraded
    // driver window" available inside a unit test
    val churn = new Thread(() => {
      var sink = 0L
      while (churning.get()) {
        val a = new Array[Byte](64 << 20)
        a(scala.util.Random.nextInt(a.length)) = 1
        sink += a.length
        Thread.sleep(5)
      }
    })
    churn.setDaemon(true)
    churn.start()
    try {
      Seq("q_bucketed_join", "q_hashed_embed_topk").foreach { name =>
        val hashes = (1 to 10).map(_ =>
          digest(canonical(SparkEntry.queries(name)(spark, dir)))).distinct
        assert(hashes.size == 1,
          s"$name produced ${hashes.size} distinct outputs over 10 repeats")
      }
    } finally {
      churning.set(false)
      churn.join(2000)
    }
  }

  test("stateful artifact queries run twice back-to-back, hash-equal") {
    val dir = "/root/testdata/sf0.01"
    Seq("q_compact_scan", "q_cluster_scan", "q_incremental_dedup_index")
      .foreach { name =>
        val a = digest(canonical(SparkEntry.queries(name)(spark, dir)))
        val b = digest(canonical(SparkEntry.queries(name)(spark, dir)))
        assert(a == b, s"$name drifted between back-to-back runs")
      }
  }
}
