package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the `ANALYZE TABLE`-shaped pass every
  * 100-TB ingest runs before anything else: per-column null counts,
  * cardinalities, ranges and mass, landed as one small long-form
  * frame `(col_name, metric, value)`. The numbers drive the layout
  * decisions the rest of the engine assumes ([[graft.sources.Layout]]
  * partition-column choice needs cardinality; skew guards need
  * min/max; [[graft.pipelines.Splitting]] budget math needs token
  * mass) — profiling is how those inputs stop being guesses.
  *
  * Reference anchor: the capstone eyeballs `df.describe()` ad hoc;
  * this is that, made a deterministic, oracle-gateable operator.
  *
  * ==Shape==
  * ONE aggregate over one scan: every metric for every column is an
  * expression in a single `agg(...)` (Spark fuses them into one
  * partial+final hash aggregate), then the 1×(cols·metrics) row is
  * unpivoted driver-free with `stack`. Exact `count(distinct)` per
  * column rewrites to expand+two-phase aggregate — still one scan,
  * but one shuffle per distinct column; at true 100-TB cadence call
  * [[profileApprox]] (HLL sketches, one shuffle total, ~2% error)
  * and reserve the exact spelling for the oracle gate and
  * partition-column shortlists. All values are BIGINT (integer-exact
  * across engines): string columns profile their LENGTHS, numeric
  * columns their values.
  */
object Profile {

  private val numMetrics = Seq("n", "nulls", "distinct", "min", "max", "sum")
  private val strMetrics =
    Seq("n", "nulls", "distinct", "min_len", "max_len", "sum_len")

  private def exprsFor(c: String, isStr: Boolean,
                       approx: Boolean): Seq[Column] = {
    val v = if (isStr) length(col(c)).cast("long") else col(c).cast("long")
    val distinctExpr =
      if (approx) approx_count_distinct(col(c)).cast("long")
      else countDistinct(col(c)).cast("long")
    Seq(
      count(col(c)).cast("long"),                   // non-null count
      count(when(col(c).isNull, lit(1))).cast("long"), // 0 on empty
      distinctExpr,
      min(v).cast("long"), max(v).cast("long"), sum(v).cast("long"))
  }

  /** Exact profile of `numericCols` ++ `stringCols` → long-form
    * `(col_name, metric, value)`, `value: BIGINT` (null on empty
    * input's min/max/sum). Metrics: `n, nulls, distinct` for all;
    * `min, max, sum` over values (numeric) or `min_len, max_len,
    * sum_len` over UTF-8 string lengths. */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String]): DataFrame =
    profileImpl(df, numericCols, stringCols, approx = false)

  /** The 100-TB cadence spelling: identical shape, `distinct` via
    * HyperLogLog++ (`approx_count_distinct`) so the whole profile is
    * one map-side-combined aggregate with a single shuffle. */
  def profileApprox(df: DataFrame, numericCols: Seq[String],
                    stringCols: Seq[String]): DataFrame =
    profileImpl(df, numericCols, stringCols, approx = true)

  private def profileImpl(df: DataFrame, numericCols: Seq[String],
                          stringCols: Seq[String],
                          approx: Boolean): DataFrame = {
    val cols = numericCols.map((_, false)) ++ stringCols.map((_, true))
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.zipWithIndex.flatMap { case ((c, isStr), i) =>
      exprsFor(c, isStr, approx).zipWithIndex.map { case (e, j) =>
        e.as(s"__m_${i}_$j") }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row: stack(k, name1, metric1, v1, ...) — a
    // generator expression, no driver round-trip
    val cells = cols.zipWithIndex.flatMap { case ((c, isStr), i) =>
      val names = if (isStr) strMetrics else numMetrics
      names.zipWithIndex.map { case (m, j) =>
        Seq(lit(c), lit(m), col(s"__m_${i}_$j")) }
    }
    one.select(explode(array(cells.map(cell =>
        struct(cell(0).as("col_name"), cell(1).as("metric"),
               cell(2).as("value"))): _*)).as("cell"))
      .select(col("cell.col_name"), col("cell.metric"), col("cell.value"))
  }
}
