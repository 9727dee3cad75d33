package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing — turning a curated corpus into fixed-token-budget
  * training sequences, the last hop of an LLM data pipeline.
  *
  * Two contracts, matching the two shapes in production use:
  *
  *  - [[concatChunks]] — GPT-style concatenate-then-chunk: documents
  *    are laid end-to-end in a deterministic order and the token
  *    stream is cut every `budget` tokens; a document may straddle a
  *    chunk boundary. Pure window arithmetic (one sort-shuffle on the
  *    order key), SQL-expressible → full DuckDB oracle
  *    (`q_pack_chunks`).
  *
  *  - [[binPackGreedy]] — no-straddle packing (each sequence holds
  *    whole documents; leftover budget is padding): first-fit over a
  *    size-descending stream, run INDEPENDENTLY PER PARTITION with
  *    globally-unique bin ids (partition id ⊕ local bin counter).
  *    Greedy first-fit is inherently sequential, so the distributed
  *    form accepts per-partition locality: waste is bounded per
  *    partition (first-fit-decreasing ≤ 11/9·OPT + 6/9 bins), and
  *    partitions pack in parallel with no shuffle beyond the initial
  *    size sort. This is the `mapPartitions`-as-last-resort case the
  *    build plan reserves for genuinely imperative per-partition
  *    logic (SURVEY §7.3).
  */
object Packing {

  /** Token-stream offsets and chunk assignment for each document:
    * (input columns…, n_tokens, offset, chunk, chunk_end) where
    * `offset` is the document's first-token position in the
    * concatenated stream ordered by `orderCol`, `chunk` =
    * offset / budget is the training sequence its first token lands
    * in, and `chunk_end` the sequence of its last token (straddles
    * when chunk_end > chunk).
    *
    * One global sort on `orderCol` (range-partitioned at scale —
    * Spark's window exchange); everything else is codegen'd
    * arithmetic. */
  def concatChunks(docs: DataFrame, tokensCol: String, budget: Int,
                   orderCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("offset",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("chunk", (col("offset") / budget).cast("long"))
      .withColumn("chunk_end",
        ((col("offset") + greatest(col(tokensCol), lit(1L)) - 1L) / budget)
          .cast("long"))
  }

  /** Whole-document first-fit packing: output (idCol, n_tokens,
    * bin_id), every document assigned to exactly one bin, no bin's
    * token sum exceeding `budget` — except a single over-budget
    * document, which gets a bin of its own (the caller decides to
    * truncate or split those upstream).
    *
    * Documents are sorted size-descending (first-fit-DECREASING —
    * the classic waste bound) and round-robin distributed over
    * `numPartitions`, then each partition packs its slice with a
    * local first-fit; bin ids are (partition index) + numPartitions ·
    * (local bin ordinal), so they are globally unique without any
    * cross-partition coordination. */
  def binPackGreedy(docs: DataFrame, tokensCol: String, budget: Int,
                    idCol: String = "doc_id",
                    numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val prepped = docs
      .select(col(idCol), col(tokensCol).cast("long").as("n_tokens"))
      // size-descending global order, then round-robin so every
      // partition sees a similar size mix (repartition on the rank,
      // not the raw size — same-sized docs must spread, not collide)
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("n_tokens").desc, col(idCol))))
      .repartition(n, pmod(col("__rank"), lit(n)))
      .sortWithinPartitions(col("__rank"))
      .drop("__rank")
    val outSchema = StructType(prepped.schema.fields :+
      StructField("bin_id", LongType, nullable = false))
    val rows = prepped.rdd.mapPartitionsWithIndex { (pid, it) =>
      // first-fit: bins keep remaining capacity; linear scan is fine —
      // per-partition bin count is bounded by slice token sum / budget
      val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { r =>
        val id = r.get(0)
        val tok = r.getLong(1)
        var b = 0
        while (b < remaining.length && remaining(b) < tok) b += 1
        if (b == remaining.length) remaining += budget.toLong
        remaining(b) = remaining(b) - math.min(tok, budget.toLong)
        Row(id, tok, pid.toLong + n.toLong * b.toLong)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
