package graft.pipelines

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic output sharding ([[Sharding]], SP7): portable
  * assignment arithmetic, hash balance, manifest integrity, and the
  * partitioned write + pruning contract. The testdata path is
  * hash-gated by `q_shard_manifest`. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference of the assignment: uint32 of the first 8
    * md5 hex chars of the id's decimal string, mod n. */
  private def refShard(id: Long, n: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % n
  }

  test("assignment matches the driver-side md5 reference on 200 ids") {
    val got = Sharding.assignShards(
        spark.range(200).select(col("id").as("doc_id")), "doc_id", 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 200L).foreach { id =>
      assert(got(id) == refShard(id, 12), s"id $id")
    }
  }

  test("assignment is partitioning-invariant and in range") {
    val base = spark.range(5000).select(col("id").as("doc_id"))
    val a = Sharding.assignShards(base.repartition(1), "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sharding.assignShards(base.repartition(11), "doc_id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < 16))
  }

  test("hash balance: 20k rows over 16 shards stay within 20% of the mean") {
    val m = Sharding.shardManifest(
        spark.range(20000).select(col("id").as("doc_id"),
                                  lit(1L).as("tokens")),
        "doc_id", "tokens", 16)
      .collect().map(r => r.getLong(1))
    val mean = 20000.0 / 16
    assert(m.length == 16)
    assert(m.max <= mean * 1.2 && m.min >= mean * 0.8,
      s"imbalance: min ${m.min} max ${m.max} mean $mean")
  }

  test("manifest covers every shard id, zeros included") {
    // 3 rows over 8 shards: most shards are empty but still listed
    val m = Sharding.shardManifest(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "tokens"),
        "doc_id", "tokens", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.map(_._1).toSeq == (0L until 8L))
    assert(m.map(_._2).sum == 3L && m.map(_._3).sum == 60L)
    assert(m.count(_._2 == 0L) == 8 - m.count(_._2 > 0L))
  }

  test("writeShards: layout, manifest parity, and partition pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards")
    val path = tmp.toString
    val df = spark.range(1000).select(col("id").as("doc_id"),
                                      (col("id") % 7 + 1).as("tokens"))
    val manifest = Sharding.writeShards(df, "doc_id", "tokens", 6, path)

    // one directory per shard, all rows land exactly once (the
    // partition column comes back integer-inferred from the dir
    // names — normalize to long for the comparisons below)
    val back = spark.read.parquet(path)
      .withColumn("shard", col("shard").cast("long"))
    assert(back.count() == 1000)
    assert(back.select(col("shard")).distinct().count() == 6)

    // the written manifest equals the returned one
    val written = spark.read.parquet(s"$path/_manifest")
      .orderBy(col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ret = manifest.orderBy(col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(written.sameElements(ret))

    // manifest counts equal the read-back per-shard truth
    val truth = back.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("tokens")).as("t"))
      .orderBy(col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(truth.sameElements(ret))

    // a single-shard read prunes the other directories (LayoutSpec
    // contract: the scan's partition filter count proves pruning)
    val one = back.filter(col("shard") === 3)
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") &&
           scan.contains("shard"), s"no partition filter in:\n$scan")
    val expected = ret.find(_._1 == 3L).get._2
    assert(one.count() == expected)
  }

  test("epochKey: fresh permutation per epoch, partitioning-invariant") {
    val base = spark.range(2000).select(col("id").as("doc_id"))
    def order(ep: Long, parts: Int): Seq[Long] =
      base.repartition(parts)
        .orderBy(Sharding.epochKey(col("doc_id"), ep), col("doc_id"))
        .collect().map(_.getLong(0)).toSeq
    val e0 = order(0, 1)
    val e1 = order(1, 1)
    // both are permutations of the same ids
    assert(e0.sorted == (0L until 2000L) && e1.sorted == (0L until 2000L))
    // the epoch number genuinely re-shuffles: almost no position agrees
    val agree = e0.zip(e1).count { case (a, b) => a == b }
    assert(agree < 20, s"epochs 0/1 agree on $agree of 2000 positions")
    // same epoch, different partitioning -> identical order
    assert(order(0, 13) == e0)
  }

  test("writeShards epoch: same shard membership, fresh per-epoch order") {
    val df = spark.range(600).select(col("id").as("doc_id"),
                                     lit(1L).as("tokens"))
    def shardRows(epoch: Long): Map[Int, Seq[Long]] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-shards-ep")
      Sharding.writeShards(df, "doc_id", "tokens", 4, tmp.toString,
        orderWithinShards = true, epoch = epoch)
      (0 until 4).map { s =>
        s -> spark.read.parquet(s"$tmp/shard=$s")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      }.toMap
    }
    val ep0  = shardRows(0)
    val ep0b = shardRows(0)
    val ep1  = shardRows(1)
    (0 until 4).foreach { s =>
      // membership is epoch-independent; order is epoch-seeded
      assert(ep0(s).sorted == ep1(s).sorted, s"shard $s membership moved")
      assert(ep0(s) == ep0b(s), s"shard $s epoch-0 order not deterministic")
      assert(ep0(s) != ep1(s), s"shard $s order did not re-shuffle")
    }
  }

  test("orderWithinShards: each shard file is in md5-permutation order") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards-ord")
    val df = spark.range(500).select(col("id").as("doc_id"),
                                     lit(1L).as("tokens"))
    Sharding.writeShards(df, "doc_id", "tokens", 4, tmp.toString,
      orderWithinShards = true)
    (0 until 4).foreach { s =>
      // read ONE shard's files in order; no sort on the read side —
      // the on-disk row order itself must be the permutation
      val ids = spark.read.parquet(s"$tmp/shard=$s")
        .select(col("doc_id")).collect().map(_.getLong(0))
      val md5Of = (id: Long) => java.security.MessageDigest
        .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val sorted = ids.sortBy(id => (md5Of(id), id))
      assert(ids.sameElements(sorted), s"shard $s not in md5 order")
    }
  }
}
