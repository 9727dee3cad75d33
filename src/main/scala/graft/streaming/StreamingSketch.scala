package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Frequent

/** Streaming heavy-key WATCH — the Misra–Gries sketch
  * ([[Frequent]]) lifted to Structured Streaming: a crawl/ingest
  * stream wants to know "which domains are flooding us" WHILE it
  * runs, not at the next batch audit, but a streaming
  * `groupBy(key).count()` keeps state per DISTINCT KEY — unbounded
  * on a web stream. The sketch inverts that: one GLOBAL typed
  * aggregate whose buffer is the mergeable `Summary` — at most
  * `sketchSize` counters no matter how many keys or rows pass — so
  * complete-mode emission is safe forever.
  *
  * The emitted candidates carry the MG guarantee, not exact counts:
  * every key with true count > n/(sketchSize+1) is PRESENT (counts
  * are lower bounds). Exactness, where needed, is the batch confirm
  * pass ([[Frequent.heavyHitters]] / `q_domain_heavyhitters`'s
  * oracle-gated spelling) over the landed data — the stream names
  * the suspects, the batch convicts.
  *
  * Scale: map-side partial sketches per partition, one k-sized
  * merge at the sink — the aggregate state AND the shuffle are both
  * O(sketchSize). */
object StreamingSketch {

  /** The candidate watch: `(n_rows, key, lower_bound)` rows, one per
    * surviving counter, re-emitted each micro-batch (write with
    * `outputMode("complete")` — the output is ≤ `sketchSize` rows,
    * so complete mode costs nothing). */
  def candidateStream(keys: DataFrame, keyCol: String,
                      sketchSize: Int): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    // the typed select flattens the Summary buffer to (n, counters)
    keys.select(col(keyCol).cast("string")).as[String]
      .select(Frequent.sketchColumn(sketchSize).name("sketch"))
      .select(col("n").as("n_rows"),
              explode(col("counters")).as(Seq("key", "lower_bound")))
  }

  /** Streaming corpus-overlap sketches: the bottom-k KMV aggregate
    * ([[graft.dedup.OverlapSketch.BottomK]]) maintained LIVE per
    * source over an ingest stream — "how much does what is arriving
    * overlap what we already hold" answered while the crawl runs, by
    * pairing these sketches against the landed corpus's stored ones
    * ([[graft.dedup.OverlapSketch.pairwiseEstimates]]). Same
    * bounded-state argument as the heavy-key watch: the aggregate
    * buffer is ≤ k strings PER SOURCE however unbounded the stream,
    * and the merge is order-free, so complete-mode re-emission is
    * safe and deterministic. Emits `(keyCol, sketch)`. */
  def overlapSketchStream(rows: DataFrame, keyCol: String,
                          hashCol: String, k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions
      .udaf(new graft.dedup.OverlapSketch.BottomK(k))
    rows.groupBy(col(keyCol))
      .agg(agg(col(hashCol)).getField("hashes").as("sketch"))
  }
}
