package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra–Gries heavy-key watch ([[StreamingSketch]]):
  * bounded state, the superset guarantee across micro-batches, and
  * complete-mode re-emission. */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed key stream: 'mega' is 40% of every batch, 'big' 20%,
  // the rest unique tail keys
  private def batch(b: Int): Seq[String] =
    Seq.fill(40)("mega") ++ Seq.fill(20)("big") ++
      (0 until 40).map(i => s"tail-$b-$i")

  test("candidates stay bounded and keep the superset guarantee across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val k = 8
    val watch = StreamingSketch.candidateStream(
      in.toDF().toDF("key"), "key", sketchSize = k)
    val q = watch.writeStream.format("memory")
      .queryName("sketch_watch").outputMode("complete").start()
    try {
      in.addData(batch(0)); q.processAllAvailable()
      in.addData(batch(1)); q.processAllAvailable()
      val rows = spark.table("sketch_watch").collect()
      // bounded output: at most k counters however many keys passed
      assert(rows.length <= k, s"state leaked past the sketch: ${rows.length}")
      val n = rows.head.getLong(0)
      assert(n == 200L, s"total row count wrong: $n")
      val got = rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      // the guarantee line: every key with count > n/(k+1) is present
      assert(got.contains("mega") && got.contains("big"),
        s"heavy keys missing from candidates: $got")
      // counts are LOWER bounds, never inflations
      assert(got("mega") <= 80L && got("big") <= 40L)
    } finally q.stop()
  }

  test("streaming bottom-k overlap sketch equals the batch sketch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val sk = StreamingSketch.overlapSketchStream(
      in.toDF().toDF("src", "h"), "src", "h", k = 4)
    val q = sk.writeStream.format("memory")
      .queryName("overlap_watch").outputMode("complete").start()
    def data(b: Int) = (0 until 10).flatMap(i =>
      Seq("a" -> f"h${(i * 7 + b) % 13}%02d", "b" -> f"h${i + b * 3}%02d"))
    try {
      in.addData(data(0)); q.processAllAvailable()
      in.addData(data(1)); q.processAllAvailable()
      val streamed = spark.table("overlap_watch")
        .as[(String, Seq[String])].collect().toMap
      val batch = graft.dedup.OverlapSketch.sketchByKey(
        (data(0) ++ data(1)).toDF("src", "h"), "src", "h", 4)
        .as[(String, Seq[String])].collect().toMap
      assert(streamed == batch)
      assert(streamed.values.forall(s => s.size <= 4 && s == s.sorted))
    } finally q.stop()
  }

  test("stream candidates agree with the batch sketch's guarantee set") {
    val all = (batch(0) ++ batch(1)).toDF("key")
    val batchHeavy = graft.ops.Frequent
      .heavyHitters(all, "key", minCount = 30, sketchSize = 8)
      .collect().map(_.getString(0)).toSet
    assert(batchHeavy == Set("mega", "big"))
  }
}
