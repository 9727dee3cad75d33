package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURT-range-sorted URL index layout — the physical half of
  * [[graft.text.UrlOps.surtKey]]'s ordering story (and the fourth
  * write-side layout leg: [[Layout]] partitions by VALUE,
  * [[Clustering]] z-orders WITHIN files, [[Bucketing]] hashes by
  * join key; this one RANGE-sorts by a prefix-searchable key).
  * A URL index laid out in SURT order puts every domain — and every
  * subdomain subtree — in one contiguous key range, so the standing
  * per-domain questions ("all our URLs under beta.example", CDX
  * lookups, blocklist audits, per-site recrawl slices) become range
  * scans over a handful of files: parquet min/max footers prune at
  * both the file and row-group level against a string-range
  * predicate. At 100 TB that is the difference between opening a
  * few files and opening all of them.
  *
  * ==Subtree range arithmetic==
  * After the reversed-host prefix `example,beta`, a same-subtree key
  * continues with `)` (the exact host) or `,` (a subdomain), while a
  * DIFFERENT domain sharing the spelling prefix (`betax.example`,
  * `beta-2.example`) continues with a label character — and every
  * label character (`-`, digits, letters) sorts ABOVE `,`. So the
  * half-open range `[prefix + ")", prefix + "-")` captures exactly
  * the host and its subtree, nothing else. */
object UrlIndex {

  /** Write `df` as a SURT-range-sorted parquet index: the `surt`
    * column is added, rows are range-partitioned and sorted by it
    * into `numFiles` files. Rows with unresolvable URLs (null surt)
    * are KEPT (they land in the range-partitioner's null partition)
    * — an index write must not silently drop rows. The range
    * shuffle on the key is the only wide stage — the same price as
    * any sorted write. */
  def writeSurtIndexed(df: DataFrame, urlCol: String, path: String,
                       numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("surt", graft.text.UrlOps.surtKey(col(urlCol)))
      .repartitionByRange(numFiles, col("surt"))
      .sortWithinPartitions("surt")
      .write.mode("overwrite").parquet(path)
  }

  /** The half-open SURT range `[lo, hi)` covering `domain` and every
    * subdomain of it (see object scaladoc for why `-` is the right
    * exclusive bound). */
  def domainRange(domain: String): (String, String) = {
    val rev = domain.toLowerCase(java.util.Locale.ROOT)
      .split('.').reverse.mkString(",")
    (rev + ")", rev + "-")
  }

  /** All index rows of `domain` and its subdomains — a string-range
    * filter on the sorted key, which parquet footer stats prune to
    * the few files whose envelope overlaps the range. */
  def lookupDomain(spark: SparkSession, path: String, domain: String)
      : DataFrame = {
    val (lo, hi) = domainRange(domain)
    spark.read.parquet(path)
      .filter(col("surt") >= lo && col("surt") < hi)
  }

  /** Per-file [min, max] envelope of the surt key — the same
    * statistic parquet footers carry, computed relationally; the
    * pruning audit for specs and layout health checks. */
  def fileEnvelopes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("surt").isNotNull)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("surt")).as("lo"), max(col("surt")).as("hi"))

  /** Number of files a stats-pruned `domain` lookup must open. */
  def filesOverlapping(spark: SparkSession, path: String,
                       domain: String): Long = {
    val (lo, hi) = domainRange(domain)
    fileEnvelopes(spark, path)
      .filter(col("hi") >= lo && col("lo") < hi)
      .count()
  }
}
