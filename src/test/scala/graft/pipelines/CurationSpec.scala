package graft.pipelines

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // raw corpus + planted exact clones and near-clones that curation
  // must remove (testdata also carries ORGANIC near-dups — assertions
  // are planted ⊆ removed, never removed == planted)
  lazy val docs = {
    val d = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val exactClones = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val nearClones = d.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 200000).as("doc_id"),
              concat(lit("zz1 zz2 zz3 "), col("text")).as("text"))
    d.union(exactClones).union(nearClones).cache()
  }

  test("curation removes planted clones, keeps allowed langs, is deterministic") {
    val out = Curation.curate(docs).cache()
    // every planted exact clone loses to its lower-id original
    assert(out.filter(col("doc_id") >= 100000 && col("doc_id") < 200000)
      .count() == 0, "exact clones must be deduplicated")
    // every planted near clone loses (same cluster, higher id) — unless
    // its ORIGINAL was already dropped by a filter, in which case the
    // clone survives alone; assert no pair survives together instead
    val survivors = out.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val bothSurvived = survivors
      .filter(id => id >= 200000 && survivors.contains(id - 200000))
    assert(bothSurvived.isEmpty,
      s"near-clone pairs surviving together: ${bothSurvived.take(5)}")
    // surviving languages are from the allow-list; quality above floor
    assert(out.filter(!col("detected").isin("en", "de", "es", "fr"))
      .count() == 0)
    assert(out.filter(col("quality") < 0.3).count() == 0)
    // deterministic end to end
    val again = Curation.curate(docs)
    assert(out.exceptAll(again).count() == 0)
    assert(again.exceptAll(out).count() == 0)
  }

  test("funnel counts are monotone decreasing") {
    val f = Curation.funnel(docs)
    assert(f.map(_._1) ==
      Seq("input", "lang", "quality", "exact_dedup", "near_dedup"))
    f.sliding(2).foreach { case Seq((sa, a), (sb, b)) =>
      assert(b <= a, s"$sb ($b) > $sa ($a)")
    }
    assert(f.last._2 > 0, "curation must not empty the corpus")
  }

  test("funnel single-pass counts equal stage-by-stage computation") {
    // the round-5 fold (conditional counts + countDistinct(hash) in ONE
    // aggregate) must report exactly what running the stages reports
    val cfg = Curation.Config()
    val f = Curation.funnel(docs, cfg).toMap
    val scored = docs
      .withColumn("toks", graft.text.Text.tokenize(col("text")))
      .withColumn("detected",
        graft.text.Text.langIdFromTokens(col("toks"), col("text")))
      .withColumn("quality",
        graft.text.Text.qualityScoreFromTokens(col("toks"), col("text")))
    val lang = scored.filter(col("detected").isin(cfg.langs.toSeq: _*))
    val qual = lang.filter(col("quality") >= cfg.minQuality)
      .filter(graft.text.Text.urlCount(col("text")) <= cfg.maxUrls)
      .drop("toks", "detected", "quality")
    val exact = graft.dedup.Dedup.dropExactDuplicates(qual)
    assert(f("input") == docs.count())
    assert(f("lang") == lang.count())
    assert(f("quality") == qual.count())
    assert(f("exact_dedup") == exact.count())
    assert(f("near_dedup") == graft.dedup.Dedup
      .markNearDuplicates(exact, minJaccard = cfg.nearDupJaccard)
      .filter(col("kept")).count())
  }

  test("mixture resampling keeps only requested strata") {
    val out = Curation.curate(docs,
      Curation.Config(mixture = Map("en" -> 0.5, "de" -> 1.0)))
    assert(out.filter(!col("detected").isin("en", "de")).count() == 0)
    assert(out.count() > 0)
  }

  test("opt-in PII redaction: survivors carry no raw emails or URLs") {
    // plant PII on docs the filters will keep
    val withPii = docs.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" mail bob@example.com see https://x.io/a")))
        .otherwise(col("text")))
    val out = Curation.curate(withPii,
      Curation.Config(redactPii = true)).cache()
    assert(out.count() > 0)
    assert(out.filter(col("text").rlike(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0)
    assert(out.filter(col("text").contains("https://")).count() == 0)
    assert(out.filter(col("text").contains("[EMAIL]")).count() > 0)
    // the redacted text is what dedup keyed on: planted exact clones
    // still dedup (redaction is applied before hashing)
    assert(out.filter(col("doc_id") >= 100000 && col("doc_id") < 200000)
      .count() == 0)
  }

  test("funnel honors redaction and the model gate, agreeing with curate") {
    val withPii = docs.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" mail bob@example.com now")))
        .otherwise(col("text")))
    val cfg = Curation.Config(redactPii = true)
    // the funnel's final stage must equal the curate survivor count
    // under the SAME config — the round-5 review caught funnel
    // hashing raw text while curate dedups redacted text
    val f = Curation.funnel(withPii, cfg).toMap
    assert(f("near_dedup") == Curation.curate(withPii, cfg).count())
    // with a model: ml_gate stage appears, monotone, and still agrees
    val trusted = docs.filter(col("doc_id") < 100000)
    val degraded = trusted.select(col("doc_id"),
      concat(concat_ws(" ",
        array_repeat(element_at(split(col("text"), " "), 1), 40)),
        lit(" !!! ??? ***")).as("text"))
    val model = graft.ml.QualityModel.fit(trusted, degraded)
    val mcfg = Curation.Config(minMlQuality = 0.5)
    val fm = Curation.funnel(docs, mcfg, Some(model)).toMap
    assert(fm.contains("ml_gate"))
    assert(fm("ml_gate") <= fm("quality"))
    assert(fm("exact_dedup") <= fm("ml_gate"))
    assert(fm("near_dedup")
      == Curation.curate(docs, mcfg, Some(model)).count())
  }

  test("opt-in repetition gate: looping docs dropped, funnel and " +
       "streaming ingest agree with curate") {
    import spark.implicits._
    // a looping doc: one stopword-rich English line repeated 8 times —
    // passes lang/quality/url filters, dup_line_frac = 7/8
    val loop = (1L to 8L).map(_ =>
      "the cat is in the house and it is not far from the barn")
      .mkString("\n")
    val planted = docs.union(Seq((900001L, loop)).toDF("doc_id", "text"))
    // default config: the gate is off, the looping doc survives
    val off = Curation.curate(planted)
    assert(off.filter(col("doc_id") === 900001L).count() == 1)
    // gated: dropped by the repetition signal, everything else equal
    val cfg = Curation.Config(maxDupLineFrac = 0.5)
    val on = Curation.curate(planted, cfg)
    assert(on.filter(col("doc_id") === 900001L).count() == 0)
    // the gate folds into the funnel's quality stage and the funnel
    // still agrees with curate under the same config
    val fOff = Curation.funnel(planted).toMap
    val fOn = Curation.funnel(planted, cfg).toMap
    assert(fOn("quality") < fOff("quality"))
    assert(fOn("near_dedup") == on.count())
    // streaming ingest (batch dual-mode) applies the same gate
    val ing = graft.streaming.CurationStream.ingest(planted, cfg)
    assert(ing.filter(col("doc_id") === 900001L).count() == 0)
  }

  test("opt-in C4 stage: pages drop on policy, scoring sees cleaned text") {
    import graft.text.C4
    // survivors' soup lines never end in terminal punct → C4's line
    // filter would empty them; give every line a period, then plant
    // one badword page and one all-short-line page
    val lined = docs.select(col("doc_id"),
      concat(regexp_replace(col("text"), lit(" "), lit(".\n"))
        , lit(".")).as("text"))
    val planted = lined.withColumn("text",
      when(col("doc_id") === 7L,
        concat(col("text"), lit("\nvisit the casino bonus page now.")))
        .otherwise(col("text")))
    val cfg = Curation.Config(c4 = Some(C4.Config(minWordsPerLine = 1)),
      minQuality = 0.0)
    val out = Curation.curate(planted, cfg)
    assert(out.filter(col("doc_id") === 7L).count() == 0,
      "the badword page must drop")
    // with the default five-word floor every one-word line dies and
    // every page fails the sentence floor → empty output
    val strict = Curation.curate(planted,
      Curation.Config(c4 = Some(C4.Config()), minQuality = 0.0))
    assert(strict.count() == 0)
  }

  test("opt-in Gopher stage: the word-count floor prunes short docs") {
    import graft.text.Gopher
    // neutralize the stop-word rule (soup lacks 2 stop words) and the
    // repetition gates irrelevant here; keep the 50-word floor
    val cfg = Curation.Config(gopher = Some(Gopher.Config(
      minStopHits = 0L)))
    val out = Curation.curate(docs, cfg)
    val base = Curation.curate(docs)
    // NOT a subset check: gopher prunes BEFORE near-dup dedup, so a
    // cluster whose canonical it removes elects a different keeper
    // than the base run — set membership legitimately shifts. The
    // stage's own contract: every survivor clears the 50-word floor,
    // and the floor prunes (short docs exist in this corpus).
    assert(out.filter(size(split(col("text"), " ")) < 50).count() == 0)
    assert(out.count() < base.count(), "the floor must prune something")
    assert(base.filter(size(split(col("text"), " ")) < 50).count() > 0,
      "vacuous fixture: base run must carry sub-50-word docs")
  }

  test("prepareTrainingData: curate → LM-select → pack composition") {
    val full = Curation.prepareTrainingData(docs).cache()
    val curated = Curation.curate(docs)
    // no selection: packing covers exactly the curated survivors
    assert(full.count() == curated.count())
    // offsets are a proper prefix structure: total tokens = last
    // doc's offset + its n_tokens (ordering by offset)
    val last = full.orderBy(col("offset").desc).head()
    val totalTokens = full.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(last.getAs[Long]("offset") + last.getAs[Long]("n_tokens")
      == totalTokens)
    // with LM selection at 50%: survivors are a subset of curate's,
    // and roughly half (ties at the threshold may keep a few more)
    val selected = Curation.prepareTrainingData(docs,
      lmTarget = Some(docs.filter(col("doc_id") % 4 === 0)),
      keepFrac = 0.5)
    assert(selected.count() <= curated.count())
    assert(selected.count() >= (curated.count() * 0.4).toLong &&
           selected.count() <= (curated.count() * 0.65).toLong,
      s"selected ${selected.count()} of ${curated.count()}")
    full.unpersist()
  }

  test("prepareTrainingDataBpe: packs the same survivors by learned " +
       "subword counts, never fewer tokens than words") {
    val bpe = Curation.prepareTrainingDataBpe(docs, numMerges = 100)
      .cache()
    val word = Curation.prepareTrainingData(docs).cache()
    // same survivor set, joined 1:1
    assert(bpe.count() == word.count())
    val joined = bpe.as("b").join(word.as("w"), Seq("doc_id")).cache()
    assert(joined.count() == bpe.count())
    // BPE can only split words further: per-doc subword count ≥ the
    // word count under the SAME tokenize semantics (the whitespace
    // proxy in `word` differs on punctuation-only splits, so compare
    // against Text.tokenCount, not w.n_tokens)
    val withWords = bpe.join(
      Curation.curate(docs).select(col("doc_id"),
        graft.text.Text.tokenCount(col("text")).cast("long").as("nw")),
      Seq("doc_id"))
    assert(withWords.filter(col("n_tokens") < col("nw")).count() == 0)
    // prefix structure holds for the BPE stream too
    val last = bpe.orderBy(col("offset").desc).head()
    val total = bpe.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(last.getAs[Long]("offset") + last.getAs[Long]("n_tokens")
      == total)
    bpe.unpersist(); word.unpersist(); joined.unpersist()
  }

  test("end to end: curate -> BPE-pack -> shard; each boundary agrees " +
       "with its individually-gated stage") {
    // the full training-data story as ONE run: survivors from the
    // curation funnel, sequence offsets from the learned-BPE packer,
    // shard files + manifest from the deterministic sharder — with
    // every hand-off pinned against the stage run on its own
    val packed = Curation.prepareTrainingDataBpe(docs, numMerges = 100)
      .cache()
    // boundary 1 (curate -> pack): the packed set IS the curated
    // survivor set — packing invents and loses nothing
    val survivors = Curation.curate(docs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val packedIds = packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(packedIds == survivors)

    // boundary 2 (pack -> shard): manifest totals equal the packed
    // frame's own aggregates, and the written shard files carry
    // exactly the packed rows
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curation-shards").toString + "/shards"
    val manifest = Sharding.writeShards(packed, "doc_id", "n_tokens",
      nShards = 8, path = dir, orderWithinShards = true).cache()
    val totalTokens = packed.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(manifest.agg(sum(col("n_rows"))).head().getLong(0)
      == packed.count())
    assert(manifest.agg(sum(col("sum_tokens"))).head().getLong(0)
      == totalTokens)

    val back = spark.read.parquet(dir).cache()
    assert(back.count() == packed.count())
    // per-shard file contents match the manifest row for row
    val fromFiles = back.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    manifest.collect().foreach { r =>
      val (n, t) = fromFiles.getOrElse(r.getLong(0), (0L, 0L))
      assert(n == r.getLong(1) && t == r.getLong(2),
        s"shard ${r.getLong(0)}: files ($n,$t) vs manifest " +
        s"(${r.getLong(1)},${r.getLong(2)})")
    }
    // the directory assignment is the portable md5 arithmetic, not an
    // accident of the write
    assert(back.filter(col("shard").cast("long")
      =!= Sharding.shardId(col("doc_id"), 8)).count() == 0)
    // pack offsets survive the shard round-trip untouched
    val offsetDrift = back.as("s")
      .join(packed.as("p"), Seq("doc_id"))
      .filter(col("s.offset") =!= col("p.offset") ||
              col("s.n_tokens") =!= col("p.n_tokens"))
    assert(offsetDrift.count() == 0)
    packed.unpersist(); manifest.unpersist(); back.unpersist()
  }

  test("opt-in model filter: thresholded subset, scores carried") {
    val trusted = docs.filter(col("doc_id") < 100000)
    val degraded = trusted.select(col("doc_id"),
      concat(concat_ws(" ",
        array_repeat(element_at(split(col("text"), " "), 1), 40)),
        lit(" !!! ??? *** !!! ??? ***")).as("text"))
    val model = graft.ml.QualityModel.fit(trusted, degraded)
    val base = Curation.curate(docs).cache()
    val gated = Curation.curate(docs,
      Curation.Config(minMlQuality = 0.5), Some(model)).cache()
    // survivors are a subset of the un-gated run and carry ml_quality
    assert(gated.columns.contains("ml_quality"))
    assert(gated.filter(col("ml_quality") < 0.5).count() == 0)
    assert(gated.count() <= base.count())
    // trusted-corpus docs overwhelmingly pass their own model's gate
    assert(gated.count() >= (base.count() * 0.8).toLong)
  }
}
