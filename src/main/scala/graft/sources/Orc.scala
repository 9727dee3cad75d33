package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar interchange format after
  * parquet (warehouses that grew up on Hive hand corpora over as ORC;
  * an engine claiming source/sink completeness reads both). Spark's
  * native vectorized ORC reader gives the same scan properties the
  * parquet path gets: column pruning, predicate pushdown (min/max +
  * Bloom stripe skipping), batched decoding.
  *
  * Same deliberate postures as [[Csv]]/[[Jsonl]]: no `coalesce(1)`
  * (callers coalesce provably small data at the call site), overwrite
  * writes, and compression pinned explicitly (zstd — the modern
  * default; snappy for legacy-reader compatibility) rather than left
  * to cluster-config drift.
  */
object Orc {

  /** Vectorized ORC read. ORC files carry their schema — no inference
    * pass, no explicit schema needed; pass `mergeSchema = true` only
    * when reading a directory whose files evolved (it costs a footer
    * read per file). */
  def read(spark: SparkSession, path: String,
           mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema.toString).orc(path)

  /** Overwrite ORC write, parallelism preserved. */
  def write(df: DataFrame, path: String,
            compression: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .orc(path)

  /** Facet-partitioned ORC write (`path/col=value/…` layout) — the
    * same partition-pruned layout contract as
    * [[Layout.writePartitioned]], in ORC. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       compression: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .partitionBy(cols: _*)
      .orc(path)
}
