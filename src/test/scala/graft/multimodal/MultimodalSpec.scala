package graft.multimodal

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val assets = Multimodal.assetsFromDocuments(
    Tables.documents(spark, TestSpark.sf0001)).cache()

  test("asset schema: opaque binary content + typed metadata struct") {
    val s = assets.schema
    assert(s("content").dataType == BinaryType)
    assert(s("modality").dataType == StringType)
    val meta = s("meta").dataType.asInstanceOf[StructType]
    assert(meta("format").dataType == StringType)
    assert(meta("width").dataType == IntegerType)
    assert(meta("duration_ms").dataType == LongType)
    assert(assets.select(col("modality")).distinct().count() == 3)
  }

  test("enrich: deterministic stub kernels, correct column contracts") {
    val e1 = Multimodal.enrich(assets).cache()
    val e2 = Multimodal.enrich(assets)
    assert(e1.exceptAll(e2).count() == 0, "stub kernels must be deterministic")
    val s = e1.schema
    assert(s("content_hash").dataType == StringType)
    assert(s("features").dataType == ArrayType(FloatType, true) ||
           s("features").dataType == ArrayType(FloatType, false))
    val row = e1.filter(col("modality") === "video").head()
    val feats = row.getAs[collection.Seq[Float]]("features")
    assert(feats.size == 16)
    assert(feats.forall(f => f >= -1.0f && f <= 1.0f))
    val frames = row.getAs[collection.Seq[Long]]("frame_times_ms")
    assert(frames.nonEmpty, "video assets must get a frame plan")
    assert(frames.forall(_ % 2000 == 0), "every 50th frame at 25fps = 2s")
    // non-video assets have no frame plan
    assert(e1.filter(col("modality") =!= "video" &&
      size(col("frame_times_ms")) > 0).count() == 0)
  }

  test("frame plan: zero-duration assets plan zero frames") {
    import spark.implicits._
    val out = Seq(0L, 39L, 40L, 4000L).toDF("duration_ms")
      .select(col("duration_ms"),
              Multimodal.frameSampleStub(col("duration_ms")).as("frames"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Long]]("frames"))
      .toMap
    assert(out(0L).isEmpty, "duration 0 must plan no frames")
    assert(out(39L).isEmpty, "sub-frame durations must plan no frames")
    assert(out(40L) == Seq(0L), "one full frame → frame 0 sampled")
    assert(out(4000L) == Seq(0L, 2000L),
      "100 frames at stride 50 → frames 0 and 50 → 0ms and 2000ms")
  }

  test("decode stub: same bytes → same dims; hash is content-addressed") {
    val d = assets
      .select(Multimodal.decodeImageStub(col("content")).as("d"),
              Multimodal.contentHash(col("content")).as("h"),
              col("content"))
    val dup = d.union(d)
    assert(dup.select(col("h"), col("d.width")).distinct().count()
      == d.count())
    val dims = d.select(col("d.width"), col("d.height")).collect()
    assert(dims.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 1920))
    assert(dims.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 1080))
  }

  test("resizeMeta: fits inside maxDim, preserves aspect-ish, idempotent on small") {
    val resized = assets.select(col("meta"),
      Multimodal.resizeMeta(col("meta"), 256).as("r"))
    val rows = resized.collect()
    rows.foreach { r =>
      val w = r.getStruct(1).getAs[Int]("width")
      val h = r.getStruct(1).getAs[Int]("height")
      assert(w <= 256 && h <= 256, s"resize out of bounds: $w x $h")
      assert(w >= 1 && h >= 1)
    }
  }

  test("batched kernel: output invariant to partitioning and batch size") {
    val base = Multimodal.batchedFeatureExtract(assets).cache()
    assert(base.count() == assets.count())
    // same rows regardless of how partitions/batches slice the input
    val repart = Multimodal.batchedFeatureExtract(assets.repartition(7))
    val smallBatch = Multimodal.batchedFeatureExtract(assets, batchSize = 3)
    assert(base.exceptAll(repart).count() == 0)
    assert(base.exceptAll(smallBatch).count() == 0)
    val feats = base.head().getAs[collection.Seq[Float]]("features")
    assert(feats.size == 16)
    assert(feats.forall(f => f >= -1.0f && f <= 1.0f))
  }

  test("kernel seam: a second implementation drops in with no plumbing change") {
    // trivial alternative kernel: mean byte value, replicated — proves
    // the Factory/Handle seam works for any implementation, not just
    // the shipped fake (VERDICT r6 #7)
    val meanKernel = new MediaKernel.Factory[Array[Byte], Array[Float]] {
      def open() = new MediaKernel.Handle[Array[Byte], Array[Float]] {
        def processBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
          batch.map { b =>
            val m = if (b.isEmpty) 0f
                    else b.map(_ & 0xff).sum.toFloat / b.length / 255f
            Array.fill(4)(m)
          }
      }
    }
    val out = Multimodal.batchedFeatureExtract(assets, kernel = meanKernel)
    assert(out.columns.toSeq == Seq("asset_id", "features"))
    assert(out.count() == assets.count())
    val feats = out.head().getAs[collection.Seq[Float]]("features")
    assert(feats.size == 4)
    assert(feats.distinct.size == 1, "mean kernel replicates one value")
    assert(feats.forall(f => f >= 0f && f <= 1f))
    // partition/batch invariance holds for the plugged kernel too
    val repart = Multimodal.batchedFeatureExtract(
      assets.repartition(5), kernel = meanKernel, batchSize = 2)
    assert(out.exceptAll(repart).count() == 0)
  }

  test("kernel seam: handle opened per partition and closed on task end") {
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val counting = new MediaKernel.Factory[Array[Byte], Array[Float]] {
      def open() = {
        opens.add(1)
        new MediaKernel.Handle[Array[Byte], Array[Float]] {
          def processBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
            batch.map(_ => Array(1f))
          override def close(): Unit = closes.add(1)
        }
      }
    }
    val nParts = 3
    val n = Multimodal.batchedFeatureExtract(
      assets.repartition(nParts), kernel = counting).count()
    assert(n == assets.count())
    assert(opens.value == nParts, s"one open per partition: ${opens.value}")
    assert(closes.value == nParts, s"every handle closed: ${closes.value}")
  }

  test("batchedDecode: kernel-form decode matches the stub's contract") {
    val d = Multimodal.batchedDecode(assets).cache()
    assert(d.columns.toSeq ==
      Seq("asset_id", "width", "height", "channels"))
    assert(d.count() == assets.count())
    val rows = d.collect()
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 1920))
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 1080))
    assert(rows.forall(_.getInt(3) == 3))
    // deterministic + batch-invariant
    val again = Multimodal.batchedDecode(assets, batchSize = 7)
    assert(d.exceptAll(again).count() == 0)
  }

  test("repartitionForBlobs sizes partitions by payload") {
    val small = Multimodal.repartitionForBlobs(assets,
      totalBytes = 10L << 20, targetPartitionBytes = 1L << 20)
    assert(small.rdd.getNumPartitions == 10)
    val one = Multimodal.repartitionForBlobs(assets,
      totalBytes = 100, targetPartitionBytes = 1L << 20)
    assert(one.rdd.getNumPartitions == 1)
  }
}
