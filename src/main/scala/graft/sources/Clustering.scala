package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data clustering (Z-order / Morton layout) — the
  * third leg of write-side scan performance next to [[Layout]]'s
  * partition pruning and [[Layout.compact]]'s file-count hygiene.
  *
  * Partition directories prune on ONE low-cardinality column. A sorted
  * layout prunes row groups on ONE ordered column. Z-order interleaves
  * the bits of TWO rank-scaled columns into one sort key, so every
  * written file covers a small RECTANGLE of the (a, b) domain instead
  * of a thin stripe — and parquet's min/max footer stats then prune
  * files/row groups for predicates on EITHER column (~√F of F files
  * for a point-ish predicate, vs all F on the unsorted dimension of a
  * single-sort layout). This is how large lakehouse tables make
  * `WHERE user_id = ?` AND `WHERE ts BETWEEN ?` both cheap on the same
  * copy of 100 TB.
  *
  * Everything here is pure `Column` bit arithmetic (shift/and/or —
  * whole-stage codegen), one bounded 2-row stats collect for the
  * scaling bounds, and one range shuffle for the write — the same
  * shuffle any sorted write pays. */
object Clustering {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * Morton magic-number sequence), as codegen'd Column arithmetic. */
  private def spread16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Rank-scale a numeric column to [0, 65535] given its domain
    * bounds (degenerate domains scale to 0). */
  def scale16(c: Column, min: Double, max: Double): Column =
    if (max <= min) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) * lit(65536.0 / (max - min)))
        .cast("long")))

  /** 32-bit Morton code of two 16-bit scaled columns: bits of `a` at
    * even positions, `b` at odd. */
  def zOrder2(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Per-column bit budget for an N-dim Morton code: 16 bits per
    * column while the interleaved code fits 63 bits (the long's sign
    * bit stays clear so range partitioning orders codes correctly),
    * narrower past 3 columns (4 → 15 bits, 5 → 12, 6 → 10). Fewer
    * bits = coarser cells = slightly weaker per-dimension pruning,
    * the inherent N-dim trade. */
  def bitsPerCol(n: Int): Int = {
    require(n >= 1, s"need at least one cluster column: $n")
    math.min(16, 63 / n)
  }

  /** Rank-scale a numeric column to [0, 2^bits - 1] given its domain
    * bounds — [[scale16]] at an arbitrary width. */
  def scaleBits(c: Column, min: Double, max: Double,
                bits: Int): Column = {
    val top = (1L << bits) - 1L
    if (max <= min) lit(0L)
    else least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) *
        lit((top + 1).toDouble / (max - min))).cast("long")))
  }

  /** N-dimensional Morton code: ROUND-ROBIN bit interleave of N
    * `bits`-wide scaled columns — column i's bit j lands at output
    * position `j·N + i`, so every column contributes equally at every
    * granularity and a predicate on ANY one dimension confines the
    * code to ~2^(-selectivity·bits) of the range per file. Pure
    * shift/and/or Column arithmetic (bits·N terms, all whole-stage
    * codegen — for the common 3×16 that is 48 fused ops per row, no
    * UDF, no shuffle of its own). Two 16-bit columns short-circuit to
    * the magic-number [[zOrder2]] (identical bit layout, fewer ops). */
  def zOrderN(scaled: Seq[Column], bits: Int): Column = {
    val n = scaled.size
    require(n >= 1, "zOrderN of zero columns")
    require(bits >= 1 && bits * n <= 63,
      s"$n x $bits-bit interleave overflows a signed long")
    if (n == 1) scaled.head
    else if (n == 2 && bits == 16) zOrder2(scaled(0), scaled(1))
    else {
      var acc: Column = lit(0L)
      for (j <- 0 until bits; i <- 0 until n) {
        val b = shiftright(scaled(i), j).bitwiseAND(lit(1L))
        acc = acc.bitwiseOR(shiftleft(b, j * n + i))
      }
      acc
    }
  }

  /** Cluster-write `df` by the Z-order of `(colA, colB)` into
    * `numFiles` range-partitioned, internally sorted parquet files.
    * One bounded stats pass (4 scalars to the driver) fixes the
    * scaling bounds; the range shuffle on the z key is the only wide
    * stage — the same price as any sorted write. Rows, schema, and
    * values are untouched (the z key is dropped before the write);
    * only the ORDER and FILE ASSIGNMENT change, which is what makes
    * the layout safe to apply to any existing table. */
  def writeClustered(df: DataFrame, path: String, colA: String,
                     colB: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val b = df.agg(min(col(colA)).cast("double"),
                   max(col(colA)).cast("double"),
                   min(col(colB)).cast("double"),
                   max(col(colB)).cast("double")).head()
    require(!(0 until 4).exists(b.isNullAt),
      s"cannot cluster on all-null column(s) $colA/$colB")
    val z = zOrder2(scale16(col(colA), b.getDouble(0), b.getDouble(1)),
                    scale16(col(colB), b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Cluster-write `df` by the N-dimensional Z-order of `cols` into
    * `numFiles` range-partitioned, internally sorted parquet files —
    * [[writeClustered]] generalized past two dimensions (tenant ×
    * time × key is the routine three-column ask). One bounded stats
    * pass (2 scalars per column) fixes the scaling bounds; the range
    * shuffle on the interleaved key is the only wide stage. Rows,
    * schema, and values are untouched; per-dimension pruning weakens
    * gracefully with N ([[bitsPerCol]]) — past ~4 columns prefer
    * partitioning one dimension away first. */
  def writeClusteredN(df: DataFrame, path: String, cols: Seq[String],
                      numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    require(cols.nonEmpty, "no cluster columns")
    if (cols.size == 1) {
      // degenerate: a plain sorted layout, no interleave needed
      df.repartitionByRange(numFiles, col(cols.head))
        .sortWithinPartitions(cols.head)
        .write.mode("overwrite").parquet(path)
      return
    }
    val bits = bitsPerCol(cols.size)
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("double"),
      max(col(c)).cast("double")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    require(!(0 until 2 * cols.size).exists(b.isNullAt),
      s"cannot cluster on all-null column(s) ${cols.mkString(", ")}")
    val z = zOrderN(cols.indices.map(i =>
      scaleBits(col(cols(i)), b.getDouble(2 * i),
        b.getDouble(2 * i + 1), bits)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] envelope of `valueCol` for a written layout —
    * the same statistic parquet footers carry, computed relationally
    * (one group per file; file counts are bounded by construction).
    * The pruning audit: a predicate `valueCol ∈ [lo, hi]` can only
    * require files whose envelope overlaps the range. */
  def fileEnvelopes(spark: SparkSession, path: String,
                    valueCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))

  /** Number of files whose [lo, hi] envelope on `valueCol` overlaps
    * `[lo, hi]` — i.e. the files a stats-pruned scan must open. */
  def filesOverlapping(spark: SparkSession, path: String,
                       valueCol: String, lo: Double,
                       hi: Double): Long =
    fileEnvelopes(spark, path, valueCol)
      .filter(col("hi").cast("double") >= lo &&
              col("lo").cast("double") <= hi)
      .count()
}
