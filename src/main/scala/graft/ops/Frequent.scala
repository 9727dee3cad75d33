package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate heavy-hitters over a key column — the one-pass,
  * map-side-combinable sketch a 100-TB skew guard needs BEFORE any
  * wide stage: a full `groupBy(key).count()` to find mega-keys is
  * itself a shuffle over every key (the thing skew makes expensive),
  * while a Misra–Gries summary rides an existing scan as a tiny
  * aggregate state and shuffles only `k` counters per partition.
  *
  * ==Guarantee (why the two-phase answer is EXACT)==
  * A Misra–Gries summary with `k` counters, merged by the
  * Agarwal/Cormode/et-al. mergeable-summaries rule (sum counts, then
  * subtract the (k+1)-th largest and drop non-positives), retains
  * every key whose true count exceeds n/(k+1). So for any threshold
  * `minCount > n/(k+1)` the summary is a guaranteed SUPERSET of the
  * heavy set — and a second, cheap pass (map-side filter on the ≤ k
  * candidates + an exact count over that tiny key set) removes the
  * false positives. Result: exact heavy-hitters, deterministic
  * output (oracle-gatable), one full scan + one candidate-bounded
  * scan, no full-width shuffle anywhere.
  *
  * The candidate phase is approximate only in what it KEEPS —
  * never in what it returns. If the caller's threshold is below the
  * guarantee line the function fails LOUDLY (raise `sketchSize`)
  * rather than silently missing a heavy key. */
object Frequent {

  /** Mergeable Misra–Gries state: total row count + up to `k`
    * (key, lower-bound-count) counters. */
  final case class Summary(n: Long, counters: Map[String, Long])

  private final class MisraGries(k: Int)
      extends Aggregator[String, Summary, Summary] {
    override def zero: Summary = Summary(0L, Map.empty)

    override def reduce(b: Summary, key: String): Summary = {
      if (key == null) return Summary(b.n + 1, b.counters)
      val c = b.counters
      c.get(key) match {
        case Some(v) => Summary(b.n + 1, c.updated(key, v + 1))
        case None if c.size < k => Summary(b.n + 1, c.updated(key, 1L))
        case None => // classic MG: decrement all, drop zeros
          Summary(b.n + 1,
            c.collect { case (d, v) if v > 1 => d -> (v - 1) })
      }
    }

    override def merge(a: Summary, b: Summary): Summary = {
      val sum = b.counters.foldLeft(a.counters) { case (m, (d, v)) =>
        m.updated(d, m.getOrElse(d, 0L) + v)
      }
      val trimmed =
        if (sum.size <= k) sum
        else { // subtract the (k+1)-th largest count, keep positives
          val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)
            .apply(k)
          sum.collect { case (d, v) if v > cut => d -> (v - cut) }
        }
      Summary(a.n + b.n, trimmed)
    }

    override def finish(r: Summary): Summary = r
    override def bufferEncoder: Encoder[Summary] = Encoders.product[Summary]
    override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** The sketch as a `TypedColumn` — the STREAMING spelling's hook
    * ([[graft.streaming.StreamingSketch]]): a global streaming
    * aggregate whose buffer is this Summary is BOUNDED STATE by
    * construction (≤ `sketchSize` counters however unbounded the
    * stream), which is what makes a complete-mode heavy-key watch
    * safe where a full `groupBy(key).count()` would grow without
    * bound. */
  def sketchColumn(sketchSize: Int)
      : org.apache.spark.sql.TypedColumn[String, Summary] =
    new MisraGries(sketchSize).toColumn

  /** The candidate phase alone: one pass, ≤ `sketchSize` survivors
    * plus the exact total row count. */
  private[graft] def candidates(df: DataFrame, keyCol: String,
                                sketchSize: Int): Summary = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .select(new MisraGries(sketchSize).toColumn)
      .head()
  }

  /** EXACT keys with count ≥ `minCount`, via sketch-then-confirm:
    * Misra–Gries candidates (one scan, map-side combinable), then an
    * exact count over only candidate-matching rows (map-side literal
    * filter + an aggregate whose key space is ≤ `sketchSize`).
    * Throws when `minCount` is inside the sketch's blind spot
    * (`minCount ≤ n/(sketchSize+1)`) — raise `sketchSize` instead of
    * getting a silently incomplete answer. */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
                   sketchSize: Int = 4096): DataFrame =
    heavyHittersOption(df, keyCol, minCount, sketchSize).getOrElse {
      throw new IllegalArgumentException(
        s"minCount=$minCount is under the Misra-Gries guarantee line " +
        s"n/($sketchSize+1) - a heavy key could hide below the sketch; " +
        "raise sketchSize")
    }

  /** [[heavyHitters]] that reports an out-of-guarantee threshold as
    * `None` instead of throwing — for callers with a documented
    * fallback plan (e.g. [[graft.pipelines.WebCuration
    * .capPerDomainSkewed]] degrading to the full window). */
  def heavyHittersOption(df: DataFrame, keyCol: String, minCount: Long,
                         sketchSize: Int = 4096): Option[DataFrame] = {
    require(minCount > 0, s"minCount must be positive: $minCount")
    require(sketchSize > 0, s"sketchSize must be positive: $sketchSize")
    val s = candidates(df, keyCol, sketchSize)
    if (minCount <= s.n / (sketchSize + 1)) return None
    val cand = s.counters.keys.toSeq
    if (cand.isEmpty)
      Some(df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add(keyCol, "string").add("n", "long")))
    else
      Some(df.filter(col(keyCol).cast("string").isInCollection(cand))
        .groupBy(col(keyCol).cast("string").as(keyCol))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount))
  }
}
