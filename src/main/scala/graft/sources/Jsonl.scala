package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines source/sink — the interchange format of LLM training
  * corpora (one JSON document per line; The Pile, RedPajama, Dolma and
  * most web-crawl drops all ship as (gzipped) JSONL shards).
  *
  * Scale rules, same reasoning as [[Csv]]:
  *  - schemas are EXPLICIT, never inferred — `spark.read.json` without
  *    a schema runs a FULL extra pass over 100 TB just to guess types,
  *    and can flip a field's type between runs when shards disagree;
  *  - reads are splittable per-file: plain `.jsonl` splits by line
  *    within a file, `.jsonl.gz` is one task per file (gzip is not a
  *    splittable codec) — so corpora should be sharded into many
  *    moderate files (the layout [[Layout]] controls), never one giant
  *    gz member;
  *  - malformed lines are captured, not silently nulled: PERMISSIVE
  *    mode routes each unparseable line into `corruptCol` so a
  *    cleaning pipeline can count/quarantine them ([[readWithCorrupt]]
  *    returns good and bad rows; [[read]] keeps FAILFAST semantics for
  *    pipelines that would rather die than drop data).
  */
object Jsonl {

  /** The `documents`-table document schema in its JSONL wire form. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** Explicit-schema JSONL read. FAILFAST: a malformed line fails the
    * task instead of becoming a row of nulls. */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "FAILFAST"): DataFrame =
    spark.read
      .option("mode", mode)
      .schema(schema)
      .json(path)

  /** PERMISSIVE read that CAPTURES malformed lines: returns the data
    * columns plus `corruptCol` holding the raw text of any line that
    * failed to parse (null for good rows). Callers split it with
    * {{{ df.filter(col(corruptCol).isNull) }}} /
    * {{{ df.filter(col(corruptCol).isNotNull) }}}.
    *
    * Spark caveat (enforced by the JSON source): a query whose
    * required schema prunes down to ONLY the corrupt column throws —
    * the parser can't know a line is corrupt without attempting the
    * data columns. So CACHE (or persist to parquet) the returned
    * frame before corrupt-only filters/counts; [[corruptStats]]
    * handles that internally and is safe on the raw frame. */
  def readWithCorrupt(spark: SparkSession, path: String,
                      schema: StructType,
                      corruptCol: String = "_corrupt_record"): DataFrame = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(corruptCol, StringType))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(withCorrupt)
      .json(path)
  }

  /** JSONL overwrite write, parallelism preserved (one shard per
    * partition — size shards upstream via repartition/[[Layout]]).
    * `compression = "gzip"` produces `.json.gz` shards (archival /
    * egress form); `"none"` leaves them splittable for downstream
    * Spark reads. */
  def write(df: DataFrame, path: String,
            compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .json(path)

  /** Write partitioned by facet columns (e.g. lang) — directory-level
    * partition pruning for downstream readers, same layout contract as
    * [[Layout.writePartitioned]]. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .partitionBy(partitionCols: _*)
      .json(path)

  /** Malformed-line rate over a [[readWithCorrupt]] frame: one row —
    * (n_rows, n_corrupt, corrupt_rate). The ingest health signal a
    * curation pipeline alerts on.
    *
    * EAGER by design: the aggregate references only the corrupt
    * column, which the JSON source rejects on a raw scan (see
    * [[readWithCorrupt]]), so the input is cached, the one-row result
    * collected, and the cache dropped before returning — the caller
    * gets a plain local one-row frame, never a plan that re-triggers
    * the corrupt-only restriction. */
  def corruptStats(df: DataFrame,
                   corruptCol: String = "_corrupt_record"): DataFrame = {
    val bad: Column = col(corruptCol).isNotNull
    val spark = df.sparkSession
    import spark.implicits._
    val cached = df.cache()
    try {
      val r = cached.agg(
        count(lit(1)).as("n_rows"),
        sum(when(bad, 1L).otherwise(0L)).as("n_corrupt")).head()
      val n = r.getLong(0)
      val c = if (r.isNullAt(1)) 0L else r.getLong(1)
      Seq((n, c, if (n == 0) 0.0 else c.toDouble / n))
        .toDF("n_rows", "n_corrupt", "corrupt_rate")
    } finally cached.unpersist(blocking = false)
  }
}
