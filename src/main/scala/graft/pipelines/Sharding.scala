package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic output sharding — the last step of a training-data
  * pipeline: spread the packed sequences over N shard files so every
  * data-loader rank reads its own slice, with a MANIFEST the trainer
  * can trust (per-shard row and token counts) without listing or
  * scanning the data.
  *
  * Assignment is `uint32(md5(id)[0,8)) mod n`: a pure, seedless
  * function of the row id — identical on any engine, any partitioning,
  * any day (the md5-permutation trick of
  * [[Splitting.stratifiedExactK]]), which is what makes
  * `q_shard_manifest` hash-oracleable where a `hash()`-based spread
  * would be engine-private. Balance is hash-binomial: shard sizes
  * concentrate within O(√(rows/n)) of rows/n — at training scale
  * (millions of sequences per shard) the imbalance is noise, and no
  * global sort or row_number pass is ever needed: assignment is
  * map-side arithmetic, the ONLY wide stage is the write's own
  * partitioning, so the operator scales like a write, not like a sort.
  *
  * The reference's pipelines end with `coalesce(1)` single-file writes
  * (splitting_data.py:48-50) — the anti-pattern this module replaces:
  * N independent shard directories, written by N tasks.
  */
object Sharding {

  /** Portable deterministic shard id for a row id: the first 8 md5 hex
    * chars parsed as a uint32, mod `nShards`. `conv` parses unsigned
    * (max 0xffffffff fits a long); the SQL twin spells the same parse
    * as a Horner chain over `strpos('0123456789abcdef', …)`. */
  def shardId(idCol: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    pmod(conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8),
              16, 10).cast("long"),
         lit(nShards.toLong))
  }

  /** Attach the shard assignment as a `shard` column (map-only). */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardId(col(idCol), nShards))

  /** Per-epoch seeded order key: `md5("ep:<epoch>:<id>")` — a FRESH
    * deterministic permutation for every epoch number, so a trainer
    * re-shuffles its corpus between passes (the global-shuffle knob of
    * every data loader) without any engine-private randomness: the
    * epoch number IS the seed, and two engines replaying the same
    * epoch derive byte-identical order. Ordering by the hex string
    * (lowercase, fixed 32 chars) is ordering by the hash value;
    * ties are impossible on unique ids and broken by the id anyway
    * wherever this key is used. Map-side arithmetic — the cost is
    * wherever the ORDER lands (a shard-local sort in
    * [[writeShards]]; a global sort only in the audit query). */
  def epochKey(idCol: Column, epoch: Long): Column =
    md5(concat(lit(s"ep:$epoch:"), idCol.cast("string")).cast("binary"))

  /** The manifest: per-shard row count and token mass — one narrow
    * aggregate, `nShards` output rows. Every shard id appears, even
    * empty ones (a trainer sizing its ranks needs the zero row): the
    * id range is generated and left-joined, not discovered. */
  def shardManifest(df: DataFrame, idCol: String, tokensCol: String,
                    nShards: Int): DataFrame =
    manifestOfAssigned(assignShards(df, idCol, nShards), tokensCol, nShards)

  /** The manifest aggregate over an already-`shard`-carrying frame —
    * shared by [[shardManifest]] (assigns in-flight) and
    * [[writeShards]] (reads the shard column back from the written
    * directories). */
  private def manifestOfAssigned(assigned: DataFrame, tokensCol: String,
                                 nShards: Int): DataFrame = {
    val spark = assigned.sparkSession
    val counts = assigned
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
           sum(col(tokensCol)).as("sum_tokens"))
    spark.range(nShards).select(col("id").as("shard"))
      .join(counts, Seq("shard"), "left")
      .select(col("shard"),
              coalesce(col("n_rows"), lit(0L)).as("n_rows"),
              coalesce(col("sum_tokens"), lit(0L)).as("sum_tokens"))
  }

  /** Write `df` as `path/shard=K/` parquet directories plus
    * `path/_manifest/` (the [[shardManifest]] as one small parquet),
    * and return the manifest. `repartition` on the shard column makes
    * one write task per shard produce one file run — the shard count,
    * not the upstream partitioning, controls the file layout; readers
    * of a single shard prune every other directory (LayoutSpec
    * contract for partitioned layouts).
    *
    * `orderWithinShards = true` additionally fixes each shard's ROW
    * ORDER to the seedless md5(id) permutation — a deterministic,
    * source-interleaved training order any engine can reproduce —
    * via `sortWithinPartitions`: a map-side sort on the already-
    * shuffled shard partitions, no extra exchange.
    *
    * `epoch >= 0` (with `orderWithinShards`) swaps the seedless key
    * for [[epochKey]]: each epoch writes the SAME shard membership
    * (assignment ignores the epoch — rank k always owns its slice)
    * in a fresh per-epoch order. That is the production spelling of
    * epoch re-shuffling at 100 TB: shard-LOCAL sorts, never a global
    * one — the cross-shard mixing is already done by the hash
    * assignment, so per-shard reorder is all an epoch needs. */
  def writeShards(df: DataFrame, idCol: String, tokensCol: String,
                  nShards: Int, path: String,
                  orderWithinShards: Boolean = false,
                  epoch: Long = -1L): DataFrame = {
    val assigned = assignShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
    val orderKey =
      if (epoch >= 0L) epochKey(col(idCol), epoch)
      else md5(col(idCol).cast("string").cast("binary"))
    // `shard` leads the sort: the partitioned write REQUIRES rows
    // grouped by the partition column and would otherwise insert its
    // own (tie-unstable) sort on `shard`, scrambling the permutation —
    // leading with it makes the writer's required ordering already
    // satisfied, so this one map-side sort is the only one
    val placed =
      if (orderWithinShards)
        assigned.sortWithinPartitions(col("shard"), orderKey, col(idCol))
      else assigned
    placed.write.mode("overwrite").partitionBy("shard").parquet(path)
    // the manifest derives from the WRITTEN directories, not a second
    // scan of `df`: a nondeterministic input (or a source mutated
    // between actions) could otherwise commit a _manifest disagreeing
    // with the shard files it describes (ADVICE r9) — reading back
    // what the write landed makes that divergence impossible, and the
    // read is of the compacted shard layout, not the raw source
    val manifest = manifestOfAssigned(
      df.sparkSession.read.parquet(path), tokensCol, nShards)
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/_manifest")
    manifest
  }
}
