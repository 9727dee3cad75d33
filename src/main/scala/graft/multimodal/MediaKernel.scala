package graft.multimodal

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** Pluggable per-partition kernel seam for the multimodal stages
  * (VERDICT r6 "Next round" #7): a real codec or model runtime drops in
  * by implementing [[MediaKernel.Factory]] — the column contracts,
  * batching, and partition lifecycle in [[Multimodal]] do not change.
  *
  * The split mirrors how native resources actually behave on a
  * cluster:
  *  - [[MediaKernel.Factory]] is what SHIPS to executors — small and
  *    serializable (a model path, a codec config), never the resource
  *    itself. A GPU session or libav context is not serializable and
  *    must not try to be.
  *  - [[MediaKernel.Handle]] is the per-partition resource the factory
  *    opens ON the executor — opened once per task, fed fixed-size
  *    batches (one vectorized inference / decode call per batch), and
  *    closed by a task-completion listener whether the task succeeds,
  *    fails, or is killed.
  */
object MediaKernel {

  /** Per-partition handle over a native resource (codec context, model
    * session). `processBatch` must return exactly one output per input,
    * in input order — [[runKernel]] zips outputs back to asset ids. */
  trait Handle[I, O] {
    def processBatch(batch: Seq[I]): Seq[O]
    def close(): Unit = ()
  }

  /** What ships to executors: small, serializable, opens the handle. */
  trait Factory[I, O] extends Serializable {
    def open(): Handle[I, O]
  }

  /** Runs a kernel over `(asset_id, content)` in fixed-size batches —
    * the production shape for any native codec/model stage: one handle
    * per partition, one vectorized call per batch, close guaranteed via
    * the task-completion listener (the grouped iterator is lazy, so a
    * `finally` around `mapPartitions`' body would close BEFORE any
    * batch runs). Map-shaped: no shuffle; blobs never leave their
    * partition. */
  def runKernel[O](assets: DataFrame,
                   factory: Factory[Array[Byte], O],
                   batchSize: Int)
                  (implicit enc: Encoder[(Long, O)]): Dataset[(Long, O)] = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    assets.select(col("asset_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val handle = factory.open()
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => handle.close()))
        it.grouped(batchSize).flatMap { batch =>
          val out = handle.processBatch(batch.map(_._2))
          require(out.size == batch.size,
            s"kernel returned ${out.size} outputs for ${batch.size} inputs")
          out.zip(batch).map { case (o, (id, _)) => (id, o) }
        }
      }
  }
}
