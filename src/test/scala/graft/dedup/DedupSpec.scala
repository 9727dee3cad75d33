package graft.dedup

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** sf0.001 documents + planted duplicates:
    *  - exact clones of every 10th doc under id+10000
    *  - near clones (3 junk words prepended) of every 10th-plus-1 doc
    *    under id+20000. */
  lazy val docs: DataFrame = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"), col("text"))
    .cache()
  lazy val planted: DataFrame = {
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val near = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 20000).as("doc_id"),
              concat(lit("zz1 zz2 zz3 "), col("text")).as("text"))
    docs.union(exact).union(near).cache()
  }
  lazy val nExact = docs.filter(col("doc_id") % 10 === 0).count()
  lazy val nNear = docs.filter(col("doc_id") % 10 === 1).count()

  test("exactGroups finds exactly the planted clone groups") {
    val groups = Dedup.exactGroups(planted).cache()
    assert(groups.filter(col("n_copies") === 2).count() == nExact)
    assert(groups.filter(col("n_copies") > 2).count() == 0)
    // canonical id is always the original, never the clone
    assert(groups.filter(col("n_copies") === 2)
      .filter(col("keep_id") >= 10000).count() == 0)
    assert(groups.agg(sum(col("n_copies"))).head().getLong(0)
      == planted.count())
  }

  test("dropExactDuplicates keeps one minimal-id row per content") {
    val deduped = Dedup.dropExactDuplicates(planted).cache()
    assert(deduped.count() == docs.count() + nNear)
    assert(deduped.filter(col("doc_id") >= 10000 && col("doc_id") < 20000)
      .count() == 0, "exact clones must be dropped")
    assert(deduped.columns.toSeq == planted.columns.toSeq)
  }

  test("minhash near-dup recovers planted exact and near clones") {
    val pairs = Dedup.minhashNearDuplicates(planted, minJaccard = 0.5)
      .cache()
    val found = pairs.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantExact = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000)).toSet
    val wantNear = docs.filter(col("doc_id") % 10 === 1)
      .select(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 20000)).toSet
    assert(wantExact.subsetOf(found),
      s"missing exact-clone pairs: ${(wantExact -- found).take(5)}")
    assert(wantNear.subsetOf(found),
      s"missing near-clone pairs: ${(wantNear -- found).take(5)}")
    // exact clones estimate Jaccard 1.0 (restrict to the planted pairs —
    // the raw corpus carries its own organic near-dups at J≈0.99)
    val exactSims = pairs
      .filter(col("id_b") === col("id_a") + 10000)
      .select(col("jaccard_sim")).collect().map(_.getDouble(0))
    assert(exactSims.nonEmpty)
    assert(exactSims.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("minhash jaccard agrees with the exact n-gram detector") {
    val mh = Dedup.minhashNearDuplicates(planted, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard_sim"))
    val ex = Dedup.ngramJaccardPairs(planted, k = 5, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val joined = mh.join(ex, Seq("id_a", "id_b"), "inner").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.05,
        s"minhash vs exact jaccard diverged: $r")
    }
  }

  test("ngram jaccard: planted dups found, organic corpus dups preserved") {
    val pairs = Dedup.ngramJaccardPairs(planted, k = 5, minJaccard = 0.5)
      .cache()
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
    // the raw corpus has organic near-dups; the planted run must contain
    // every raw pair plus every planted pair
    val rawPairs = Dedup.ngramJaccardPairs(docs, k = 5, minJaccard = 0.5)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = pairs.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rawPairs.subsetOf(found))
    assert(pairs.count() >= rawPairs.size + nExact + nNear)
    pairs.collect().foreach { r =>
      val j = r.getDouble(3)
      assert(j >= 0.5 && j <= 1.0, s"jaccard out of range: $r")
      if (r.getLong(1) == r.getLong(0) + 10000)
        assert(j == 1.0, s"exact clone must be 1.0: $r")
      if (r.getLong(1) == r.getLong(0) + 20000)
        assert(j < 1.0, s"near clone must be < 1.0: $r")
    }
  }

  test("ngram jaccard: generator form == flat-join form, row for row") {
    val gen = Dedup.ngramJaccardPairs(planted, k = 5, minJaccard = 0.5)
    val join = Dedup.ngramJaccardPairsJoin(planted, k = 5, minJaccard = 0.5)
    assert(gen.exceptAll(join).count() == 0)
    assert(join.exceptAll(gen).count() == 0)
  }

  test("simhash near-dup finds planted clones with small hamming") {
    val pairs = Dedup.simhashNearDuplicates(planted, maxHamming = 3)
      .cache()
    val found = pairs.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantExact = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 10000)).toSet
    assert(wantExact.subsetOf(found),
      s"missing exact-clone pairs: ${(wantExact -- found).take(5)}")
    // exact clones have identical signatures (organic corpus near-dups
    // may land at any small hamming, so restrict to the planted pairs)
    assert(pairs.filter(col("id_b") === col("id_a") + 10000)
      .filter(col("hamming") =!= 0).count() == 0)
    assert(pairs.filter(col("hamming") > 3).count() == 0)
  }

  test("connected components: chains collapse transitively to min id") {
    import spark.implicits._
    // 1-2, 2-3 (chain), 10-11, and 20 alone in a pair with 21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: a 200-hop chain converges (pointer jumping)") {
    import spark.implicits._
    // plain min-label propagation needs DIAMETER sweeps — 200 here,
    // 10x the default cap; the pointer-jump step makes it O(log d).
    // The old code silently truncated; the new code would throw.
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // driverEdgeLimit = 0 forces the distributed iterative path — the
    // pointer-jump property is meaningless on the driver fast path
    val comp = Dedup.connectedComponents(chain, driverEdgeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(comp.length == 201)
    assert(comp.forall(_._2 == 0L),
      s"all chain nodes must label 0, got ${comp.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("connected components: random graphs match a driver-side union-find") {
    import spark.implicits._
    // property pin for the round-7 sweep refactor (convergence check
    // folded into the aggregate): seeded random graphs of mixed shape
    // — dense pockets, long paths, isolated pairs — vs naive union-find
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 * trial
      val edges = (1 to n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = a + 1 + rnd.nextInt(1 + n / 10) // mostly-local edges
        (math.min(a, b), math.max(a, b))
      }.distinct.filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      // BOTH execution paths must agree with the ground truth: the
      // driver fast path (default limit) and the distributed
      // iterative path (limit 0)
      val fast = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
          driverEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == expected, s"trial $trial: fast path disagrees")
      assert(dist == expected, s"trial $trial: iterative path disagrees")
    }
  }

  test("markNearDuplicates: one keeper per cluster, planted clones dropped") {
    val marked = Dedup.markNearDuplicates(planted, k = 5, minJaccard = 0.5)
      .cache()
    assert(marked.count() == planted.count())
    // exactly one kept doc per component
    val bad = marked.groupBy(col("component"))
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("keepers"))
      .filter(col("keepers") =!= 1)
    assert(bad.count() == 0)
    // every planted clone (exact and near) is dropped, its original kept
    val clones = marked.filter(col("doc_id") >= 10000)
    assert(clones.filter(col("kept")).count() == 0)
    assert(marked.filter(col("doc_id") < 10000 && !col("kept"))
      .count() > 0, "organic corpus dups should also be dropped")
  }

  test("simhash64 expression: deterministic, order-insensitive-ish kernel") {
    import graft.functions.SimHash64
    val df = spark.createDataFrame(Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")),
      (3L, Seq("x", "y", "z")))).toDF("id", "toks")
    val sigs = df.select(col("id"),
      SimHash64.simhash64(col("toks")).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "same tokens → same signature")
    assert(sigs(1L) != sigs(3L), "different tokens → different signature")
    // kernel matches a reference computation of FNV-1a majority vote
    val h = Seq("a", "b", "c").map(s =>
      SimHash64.fnv1a64(s.getBytes("UTF-8")))
    val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
      val v = h.map(x => if (((x >>> b) & 1L) == 1L) 1 else -1).sum
      if (v > 0) acc | (1L << b) else acc
    }
    assert(sigs(1L) == expected)
  }

  test("decontamination: eval members fully hit; dropContaminated removes them") {
    val bench = docs.filter(col("doc_id") % 20 === 0).cache()
    val hits = Dedup.contaminationHits(docs, bench).cache()
    val hitIds = hits.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // every benchmark member hits (on itself, fully)
    val benchIds = bench.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(benchIds.subsetOf(hitIds))
    val full = hits.join(
        docs.select(col("doc_id"),
          size(graft.text.Text.wordShingles(col("text"), 5)).as("n_sh")),
        Seq("doc_id"))
      .filter(col("doc_id") % 20 === 0)
      .filter(col("n_hits") =!= col("n_sh"))
    assert(full.count() == 0, "an eval member must hit on ALL its shingles")
    // dropContaminated removes exactly the hit docs
    val clean = Dedup.dropContaminated(docs, bench)
    assert(clean.count() == docs.count() - hitIds.size)
    assert(clean.filter(col("doc_id").isin(benchIds.toSeq: _*)).count() == 0)
  }

  /** Embeddings + planted identical-vector clones of every 10th row
    * under vec_id+100000. The base table has NO organic pairs at
    * cosine ≥ 0.95 (checked against DuckDB at both sf0.001 and
    * sf0.01), so the planted pairs are exactly the duplicate set. */
  lazy val emb: DataFrame = Tables.embeddings(spark, TestSpark.sf0001)
    .select(col("vec_id"), col("embedding")).cache()
  lazy val embPlanted: DataFrame = emb.union(
    emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    .cache()
  lazy val nEmbClones = emb.filter(col("vec_id") % 10 === 0).count()

  test("semanticPairs finds every planted identical-vector pair in-cluster") {
    val pairs = Dedup.semanticPairs(embPlanted, nClusters = 8,
      minCosine = 0.95).cache()
    // identical vectors quantize to the same cell, so every planted
    // pair MUST survive SemDeDup's within-cluster restriction
    val plantedPairs = pairs
      .filter(col("id_b") === col("id_a") + 100000)
    assert(plantedPairs.count() == nEmbClones)
    assert(plantedPairs.filter(col("cos") < 0.9999999).count() == 0,
      "identical vectors must score cosine ≈ 1")
    // no organic pairs exist at this threshold (DuckDB ground truth)
    assert(pairs.count() == nEmbClones)
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
  }

  test("semanticDedup keeps exactly one representative per semantic group") {
    val marked = Dedup.semanticDedup(embPlanted, nClusters = 8,
      minCosine = 0.95).cache()
    assert(marked.count() == embPlanted.count())
    // exactly one keeper per component
    val bad = marked.groupBy(col("component"))
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("keepers"))
      .filter(col("keepers") =!= 1)
    assert(bad.count() == 0)
    // each planted clone shares a component with its original
    val clonesComp = marked.filter(col("vec_id") >= 100000)
      .select((col("vec_id") - 100000).as("vec_id"),
              col("component").as("clone_comp"))
    val joined = marked.join(clonesComp, Seq("vec_id"))
    assert(joined.count() == nEmbClones)
    assert(joined.filter(col("component") =!= col("clone_comp")).count() == 0)
    // total kept = inputs − one duplicate dropped per planted pair
    assert(marked.filter(col("kept")).count()
      == embPlanted.count() - nEmbClones)
    // keep rule: the kept member minimizes (centroid_cos, id) — for an
    // identical pair centroid_cos ties, so min id (the original) wins
    assert(marked.filter(col("vec_id") >= 100000 && col("kept")).count() == 0)
  }

  test("semanticDedup is deterministic for a fixed seed; cells in range") {
    val a = Dedup.semanticDedup(embPlanted, nClusters = 8, minCosine = 0.95,
      fitSample = 0.5)
    val b = Dedup.semanticDedup(embPlanted, nClusters = 8, minCosine = 0.95,
      fitSample = 0.5)
    val ca = a.orderBy(col("vec_id")).collect().map(_.toString).toSeq
    val cb = b.orderBy(col("vec_id")).collect().map(_.toString).toSeq
    assert(ca == cb)
    assert(a.filter(col("cell") < 0 || col("cell") >= 8).count() == 0)
  }

  // r7 regression for the LSH-family lifecycle fix: with the old
  // lazily-returned cache(), CacheManager matched the SECOND call's
  // canonicalized plan to the first call's cached blocks, so after an
  // in-place overwrite of the input files the second call silently
  // returned the PRE-overwrite pairs. localCheckpoint registers
  // nothing, so every call sees the files as they are.
  test("minhashNearDuplicates: in-place input overwrite is not served " +
       "stale results") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedup-stale").toString + "/docs.parquet"
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    // round 1: ids 1/2 are exact twins → at least one pair
    Seq((1L, base), (2L, base), (3L, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val r1 = Dedup.minhashNearDuplicates(spark.read.parquet(dir))
      .select("id_a", "id_b").collect().map(_.toString).toSet
    assert(r1.nonEmpty, "planted twins must pair in round 1")
    // round 2: same path, all-distinct texts → no pairs
    Seq((1L, "p q r s t u v w x y z aa"),
        (2L, "k2 l2 m2 n2 o2 p2 q2 r2 s2 t2 u2 v2"),
        (3L, "g3 h3 i3 j3 k3 l3 m3 n3 o3 p3 q3 r3"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val r2 = Dedup.minhashNearDuplicates(spark.read.parquet(dir))
      .select("id_a", "id_b").collect()
    assert(r2.isEmpty,
      s"post-overwrite call must see the new files, got stale pairs: " +
        r2.mkString(", "))
  }

  // --- corpus-level line dedup -------------------------------------------

  test("dedupLines: removes ≥minCount lines, preserves order, exempts " +
       "blanks") {
    import spark.implicits._
    val df = Seq(
      (1L, "keep me\nBOILER\nalso keep"),
      (2L, "BOILER\nunique two"),
      (3L, "BOILER\nsolo"),
      (4L, "BOILER"),
      (5L, "x\n\nx"),
      (6L, "x")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, minCount = 3L)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // BOILER occurs 4 times → removed everywhere, order preserved
    assert(byId(1L) == (("keep me\nalso keep", 3L, 2L)))
    assert(byId(2L) == (("unique two", 2L, 1L)))
    // doc whose every line is boilerplate → empty text, zero kept
    assert(byId(4L) == (("", 1L, 0L)))
    // "x" occurs 3 times (docs 5 twice + 6) → removed; the BLANK line
    // is exempt — doc 5 keeps its (empty) middle line only
    assert(byId(5L) == (("", 3L, 1L)))
    assert(byId(6L) == (("", 1L, 0L)))
  }

  test("dedupLines: byHash variant matches the exact-string variant") {
    val lined = docs.select(col("doc_id"),
      regexp_replace(col("text"), "((\\S+\\s+){5}\\S+)\\s+", "$1\n")
        .as("text"))
    val a = Dedup.dedupLines(lined, minCount = 3L)
    val b = Dedup.dedupLines(lined, minCount = 3L, byHash = true)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "hash-keyed line dedup must reproduce the exact-string result")
  }

  test("dedupLines: broadcast fast path and join fallback agree exactly") {
    val lined = docs.select(col("doc_id"),
      regexp_replace(col("text"), "((\\S+\\s+){5}\\S+)\\s+", "$1\n")
        .as("text"))
    val fast = Dedup.dedupLines(lined, minCount = 3L)
    val join = Dedup.dedupLines(lined, minCount = 3L,
      broadcastKeyLimit = 0L) // force the distributed fallback
    assert(fast.exceptAll(join).isEmpty && join.exceptAll(fast).isEmpty,
      "the two execution paths must be result-identical")
    // and the unit-case semantics hold on the fallback too
    import spark.implicits._
    val df = Seq(
      (1L, "keep me\nBOILER\nalso keep"),
      (4L, "BOILER"), (5L, "x\n\nx"), (6L, "x"),
      (7L, "BOILER\nz")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, minCount = 3L, broadcastKeyLimit = 0L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (("keep me\nalso keep", 3L, 2L)))
    assert(out(5L) == (("", 3L, 1L)), "blank lines stay exempt")
  }

  // --- incremental (cross-corpus) dedup ----------------------------------

  test("dropDuplicatesAgainst: exact copies and near-clones of the " +
       "existing corpus drop; novel and within-batch dups stay") {
    import spark.implicits._
    val existing = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")).toDF("doc_id", "text")
    val newBatch = Seq(
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),          // exact copy
      (12L, "zz1 zz2 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),  // near clone
      (13L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"),          // novel
      (14L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")           // within-batch dup
    ).toDF("doc_id", "text")
    val kept = Dedup.dropDuplicatesAgainst(newBatch, existing)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 11 exact-drops, 12 near-drops (J = 10/12 ≥ 0.5); 13 AND 14 stay —
    // within-batch dedup is the caller's composition, by contract
    assert(kept == Set(13L, 14L), s"got $kept")
    // the existing corpus is never touched: pairs report new-vs-old only
    val pairs = Dedup.crossNgramJaccardPairs(newBatch, existing)
    assert(pairs.filter(col("id_a") < 10).count() == 0)
  }

  test("dropDuplicatesAgainst: empty existing corpus drops nothing; " +
       "frequency cap excludes hot shingles from candidate generation") {
    import spark.implicits._
    val newBatch = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")).toDF("doc_id", "text")
    val none = newBatch.filter(col("doc_id") < 0)
    assert(Dedup.dropDuplicatesAgainst(newBatch, none).count() == 2)
    // a shingle present in MORE existing docs than the cap generates no
    // candidates: 3 existing copies, cap 2 → the (identical!) new doc
    // survives the near stage (and the exact stage, text differs)
    val existing = Seq(
      (11L, "h1 h2 h3 h4 h5 h6"), (12L, "h1 h2 h3 h4 h5 h6"),
      (13L, "h1 h2 h3 h4 h5 h6")).toDF("doc_id", "text")
    val probe = Seq((21L, "h1 h2 h3 h4 h5 h6 tail7")).toDF("doc_id", "text")
    val capped = Dedup.crossNgramJaccardPairs(probe, existing,
      maxShingleFreq = 2L)
    assert(capped.count() == 0, "cap must suppress hot-shingle candidates")
    val uncapped = Dedup.crossNgramJaccardPairs(probe, existing)
    assert(uncapped.count() == 3, "without the cap all three pairs appear")
  }

  // --- soft-dedup duplication weights ------------------------------------

  test("duplicationWeights: 1/cluster-size, singletons weigh 1.0, " +
       "weights sum to cluster count") {
    val w = Dedup.duplicationWeights(planted).cache()
    assert(w.count() == planted.count())
    // every row's weight is exactly 1/n_copies
    assert(w.filter(col("weight") =!=
      lit(1.0) / col("n_copies").cast("double")).count() == 0)
    // planted clones (exact and near) must share a component with their
    // original → n_copies ≥ 2 → weight ≤ 0.5 (organic near-dups may
    // enlarge clusters; planted ⊆ found, never found == planted)
    val clones = w.filter(col("doc_id") >= 10000)
    assert(clones.count() == nExact + nNear)
    assert(clones.filter(col("weight") > 0.5).count() == 0)
    // each cluster contributes exactly 1.0 total weight
    val sumW = w.agg(sum(col("weight"))).head().getDouble(0)
    val nComponents = w.select(col("component")).distinct().count()
    assert(math.abs(sumW - nComponents) < 1e-6,
      s"weight sum $sumW != component count $nComponents")
    w.unpersist()
  }

  // --- Bloom-prefiltered decontamination ---------------------------------

  test("dropContaminatedBloom equals the exact path (incl. high fpp)") {
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val exact = Dedup.dropContaminated(docs, bench)
      .select("doc_id")
    assert(exact.count() > 0, "some docs must survive decontamination")
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Dedup.dropContaminatedBloom(docs, bench, fpp = fpp)
        .select("doc_id")
      // fpp=0.5 floods the prefilter with false positives; the exact
      // verify stage must kill every one of them
      assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
        s"bloom path diverged from exact path at fpp=$fpp")
    }
  }

  test("dropRepeatedSpans: shared passage removed everywhere but the " +
       "lowest id; short/unrelated docs intact; fully-covered doc " +
       "stays as an empty row") {
    import spark.implicits._
    val P = (1 to 25).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $P a4 a5"),
      (2L, s"b1 b2 $P b3 b4 b5 b6"),
      (3L, s"$P c1 c2"),
      (4L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (5L, "s1 s2 s3"),
      (6L, P)
    ).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedSpans(docs, k = 20).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 == s"a1 a2 a3 $P a4 a5", "canonical keeps P")
    assert(out(1L)._3 == 30L)
    // overlapping shared windows union to EXACTLY the passage: the
    // clones lose P and nothing else, in original order
    assert(out(2L)._1 == "b1 b2 b3 b4 b5 b6")
    assert(out(2L)._2 == 31L && out(2L)._3 == 6L)
    assert(out(3L)._1 == "c1 c2")
    assert(out(4L)._1.startsWith("u1 ") && out(4L)._3 == 30L)
    assert(out(5L)._1 == "s1 s2 s3", "doc shorter than k untouched")
    assert(out(6L)._1 == "" && out(6L)._3 == 0L,
      "fully-covered doc remains as a row with empty text")
  }
}
