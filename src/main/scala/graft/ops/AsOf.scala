package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single latest
  * right row at-or-before the left row's time on the same key. The
  * time-series primitive behind feature backfill ("the user's last
  * purchase before this event"), slowly-changing-dimension lookups, and
  * market-data alignment. The reference has no temporal operators
  * (SURVEY §1.1 — `timestamp` never used); this is §7.5 extension
  * surface, named in the build brief as a first-class custom operator.
  *
  * ==Why not a join?==
  * The naive form is a non-equi join (`r.key = l.key AND r.t <= l.t`)
  * plus a per-left-row argmax — Spark plans that as a broadcast/shuffle
  * range join whose intermediate is |L|·|matching R| per key before the
  * argmax prunes it. This implementation is the linear union-and-carry
  * form instead: tag both sides, union, ONE shuffle on the key, and a
  * running `last(_, ignoreNulls)` window carries each right payload
  * forward to the left rows that follow it in time order. Cost is
  * O(|L|+|R|) rows through one hash partitioning + per-partition sort —
  * the same shape at 100 TB (no quadratic intermediate, no skew beyond
  * the key distribution itself, AQE-splittable).
  *
  * ==Contract==
  *  - `right` must be unique per (key, rightTime) — pre-aggregate if
  *    not (ties would resolve arbitrarily otherwise);
  *  - right payload columns must be non-null (a null payload value
  *    would be skipped by the ignoreNulls carry, silently surfacing an
  *    older row's value for that column);
  *  - output = every left row (left-outer semantics) with
  *    `asof_<payload>` columns, null where no right row precedes;
  *  - `strict = true` matches strictly-before (`r.t < l.t`) — equal
  *    timestamps no longer match (the tag flips which side sorts
  *    first at equal times).
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               rightPayload: Seq[String],
               strict: Boolean = false): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoin needs ≥1 right payload column")
    val leftTag = if (strict) 0 else 1
    val rightTag = 1 - leftTag
    val lExtra = left.columns.filterNot(keyCols.contains).toSeq
    val rPay = (rightPayload :+ rightTimeCol).distinct

    val lSide = left.select(
      keyCols.map(col) ++
        Seq(col(leftTimeCol).as("_t"), lit(leftTag).as("_tag")) ++
        lExtra.map(col) ++
        rPay.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"asof_$c")): _*)
    val rSide = right.select(
      keyCols.map(col) ++
        Seq(col(rightTimeCol).as("_t"), lit(rightTag).as("_tag")) ++
        lExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rPay.map(c => col(c).as(s"asof_$c")): _*)

    // running frame: every row sees the latest right payload at-or-before
    // it; right rows sort before left rows at equal (t) iff non-strict
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.union(rSide)
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_tag")) ++
        lExtra.map(col) ++
        rPay.map(c => last(col(s"asof_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c")): _*)
      .filter(col("_tag") === lit(leftTag))
      .drop("_t", "_tag")
  }

  /** Bounded range self-join — for every row, its same-key rows within
    * `(t, t + horizon]` (strictly after, at most `horizon` later). The
    * "what happened next" primitive: attribution windows, burst
    * detection, lead/follow analysis.
    *
    * A naive theta join (`r.t > l.t AND r.t <= l.t + horizon`) gives
    * Spark no equi-key beyond the entity key, so every key's rows cross
    * (|rows/key|²). This is the BUCKETIZED form: time is floored into
    * `horizon`-width buckets; a right row can only land in its own or
    * the previous bucket's window, so the right side is duplicated into
    * (bucket, bucket−1) and the join becomes a pure equi-join on
    * (key, bucket) — 2|R| rows shuffled, candidates bounded by bucket
    * occupancy, the exact range predicate applied after. Linear at
    * 100 TB in rows-per-bucket, the partition key is (key, bucket) —
    * high cardinality, AQE-splittable on hot buckets.
    *
    * `timeCol` must be a non-negative integral epoch (e.g. nanos):
    * bucketing uses integral `div` — float division of epoch-nanos
    * loses precision above 2⁵³ and flips bucket boundaries. */
  def rangeSelfJoin(df: DataFrame, keyCols: Seq[String], timeCol: String,
                    horizon: Long, payload: Seq[String]): DataFrame = {
    val lCols = keyCols.map(col) ++ Seq(col(timeCol).as("_lt")) ++
      payload.map(c => col(c).as(s"${c}_l"))
    val rCols = keyCols.map(col) ++ Seq(col(timeCol).as("_rt")) ++
      payload.map(c => col(c).as(s"${c}_r"))
    val l = df.select(lCols: _*)
      .withColumn("_bucket", expr(s"_lt div ${horizon}L"))
    val r = df.select(rCols: _*)
      .withColumn("_bucket",
        explode(array(expr(s"_rt div ${horizon}L"),
                      expr(s"_rt div ${horizon}L - 1L"))))
    l.join(r, keyCols :+ "_bucket")
      .filter(col("_rt") > col("_lt") &&
              col("_rt") <= col("_lt") + horizon)
      .drop("_bucket")
  }
}
