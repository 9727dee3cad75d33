package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — classify every key of two table versions
  * as `added` / `removed` / `changed` / `unchanged`. The audit
  * primitive an incremental 100-TB pipeline runs between epochs:
  * "what did this re-crawl / re-curation / index-GC actually change?"
  * is a diff of the landed snapshots, and the answer gates whether
  * downstream (dedup index appends, shard rewrites, mixture re-cuts)
  * needs to run at all. Pairs with [[graft.dedup.DedupIndex.gc]] and
  * [[graft.sources.Layout.compact]], whose contracts ("nothing but
  * the removed docs changed", "byte-identical reads") this operator
  * turns into a checkable frame.
  *
  * ==Shape==
  * Each side collapses to `(key, fingerprint)` — the fingerprint an
  * md5 over the compared columns ([[rowFingerprint]]) computed
  * map-side, so the wide stage is ONE full-outer join on the key
  * carrying 2×(8+16)-byte rows, never the payload (at 100 TB the
  * payload columns stay in their parquet files; only key+hash
  * shuffle). Snapshots that share a bucketed layout on the key join
  * with no shuffle at all. Output semantics are engine-portable:
  * the declared `q_table_diff` hash-gates status assignment against
  * a DuckDB twin computing the same md5 fingerprints.
  */
object Diff {

  /** Portable row fingerprint: `md5(concat_ws(\u0001, columns))` with
    * every column cast to string and NULL mapped to the sentinel
    * `\u0002` (an STX byte no testdata string contains — without it
    * `concat_ws` would silently skip NULLs and `(NULL,"x")` would
    * collide with `("x",NULL)`). Byte-identical in any engine with
    * UTF-8 strings and md5. */
  def rowFingerprint(cols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
      .cast("binary"))

  /** Per-key diff of `before` → `after` over `compareCols`
    * (fingerprinted); returns `(keyCol, status)` for every key on
    * either side. `keyCol` must be unique per side (the usual
    * snapshot contract; duplicate keys would make the join fan out). */
  def diff(before: DataFrame, after: DataFrame, keyCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "no columns to compare")
    val fp = rowFingerprint(compareCols)
    val b = before.select(col(keyCol), fp.as("__fp_b"))
    val a = after.select(col(keyCol), fp.as("__fp_a"))
    b.join(a, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_b").isNull, lit("added"))
          .when(col("__fp_a").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The one-line epoch report: `(status, n)` — map-side-combined
    * count over [[diff]], at most four rows. */
  def diffSummary(before: DataFrame, after: DataFrame, keyCol: String,
                  compareCols: Seq[String]): DataFrame =
    diff(before, after, keyCol, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
