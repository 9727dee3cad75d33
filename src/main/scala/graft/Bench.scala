package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: one JSON line of per-query + total wall seconds.
  *
  * Measurement rules (VERDICT r01 "What's wrong" #3):
  *  - materialize through the `noop` V2 sink, NOT `.count()` — a count
  *    lets Catalyst's EliminateSorts drop every final ORDER BY, so sorted
  *    queries would be timed without their sort;
  *  - one full untimed warmup pass first, so JIT + session + parquet
  *    footer-read costs don't land on whichever query runs first;
  *  - each query is timed THREE times and the MEDIAN reported — a
  *    single timed pass is defenseless against a noisy co-tenant (the
  *    r3/r4 driver numbers swung 40x on untouched queries; the median
  *    of 3 survives one contaminated pass per query);
  *  - SELF-ADJUDICATION (VERDICT r9 #3): medians landing past 2x the
  *    committed BENCH_PIN.json best get a fresh re-run triple (better
  *    median wins), and the paired DuckDB denominator
  *    (tools/bench_oracle.py over the same oracle SQL) runs in the
  *    SAME window, so the output line carries its own
  *    `duck`/`ratio` — a contended window reads as a high
  *    denominator too, not as a Spark regression.
  */
object Bench {
  /** Hand-off from the `pipeline_lang_model_fit` line to the `_score`
    * line (pipelines run sequentially in declaration order). */
  private var benchLangModel: graft.ml.LangModel.FittedLang = _

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions sized to the DATA, not the core count (the
    // 100-TB rule applied downward): at sf0.1 the whole input is
    // ~100 MB, so 32-way shuffles plan 32 near-empty reduce tasks per
    // exchange and pure task-launch overhead owns every sub-second
    // query (ConfigProbe r8: floor avg 0.353 s/query at 32 → 0.208 s
    // at 8; the heavy composites got FASTER, not slower). One 64 MB
    // target partition per input split, clamped to [8, cpus] — at
    // sf10+ this lands back on `cpus` exactly as before.
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.isFile).map(_.length).sum).getOrElse(Long.MaxValue)
    val shufflePartitions = math.max(8L,
      math.min(cpus.toLong, inputBytes / (64L << 20))).toString
    // AQE sized to the data, like the shuffle-partition formula: each
    // adaptive stage is a scheduling round-trip + re-optimization, and
    // below ~1 GiB of input there is nothing for it to decide — static
    // plans already broadcast the small sides and 8 partitions need no
    // coalescing (ConfigProbe r10: AQE off beat on for BOTH the floor
    // sample, 0.185 vs 0.215 s/query, AND the heavy composites, 14.6
    // vs 15.7 s). Past the threshold — where skew splitting and
    // runtime join re-planning earn their keep — it stays on.
    val adaptive = (inputBytes > (1L << 30)).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", adaptive)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // a query that throws still never crashes the bench, but its time is
    // NEGATED so a failure can't masquerade as a fast success (ADVICE r2)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      val ok = try { f; true } catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) sec else -sec
    }

    // headline = the DuckDB-comparable declared queries (ML/seeded
    // queries without an oracle are benched as whole pipelines below)
    val queries = SparkEntry.queries.toSeq
      .filter { case (k, _) => SparkEntry.oracleSql.contains(k) }
      .sortBy(_._1)
    queries.foreach { case (_, fn) =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val firstPass = queries.map { case (name, fn) =>
      val passes = Seq.fill(3)(timed(exec(fn(spark, sfDir))))
      val median = passes.map(math.abs).sorted.apply(1)
      // any failing pass marks the query failed (negated median) — a
      // flaky query must not masquerade as a fast success
      name -> (if (passes.forall(_ > 0)) median else -median)
    }
    // Outlier re-run pass (VERDICT r9 #3): a contended window can blow
    // a single query's median 10-40x (the r3/r4 lesson). Any query
    // whose median lands past 1.5x its pinned best-of-runs (+0.25 s
    // floor for sub-100ms queries) gets three FRESH passes, and the
    // better median wins — a transiently contaminated first triple
    // can no longer masquerade as a regression. The pin is advisory
    // input only: missing file or missing key simply skips the
    // re-run, never fails the bench.
    val pin: Map[String, Double] = try {
      val f = new java.io.File("BENCH_PIN.json")
      if (!f.exists()) Map.empty
      else {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(f).path("queries_best_of_runs")
        val b = Map.newBuilder[String, Double]
        n.fields().forEachRemaining(e =>
          b += e.getKey -> e.getValue.asDouble())
        b.result()
      }
    } catch { case _: Throwable => Map.empty }
    val qByName = queries.toMap
    var reruns = 0
    val results = firstPass.map { case (name, v) =>
      val outlier = v > 0 && pin.get(name).exists(p => v > 1.5 * p + 0.25)
      if (!outlier) name -> v
      else {
        reruns += 1
        val passes = Seq.fill(3)(timed(exec(qByName(name)(spark, sfDir))))
        val median = passes.map(math.abs).sorted.apply(1)
        name -> (if (passes.forall(_ > 0)) math.min(v, median) else v)
      }
    }

    // Paired DuckDB denominator, SAME process, SAME window (VERDICT r9
    // #3): shells out to the committed oracle-timing tool over the
    // same oracle SQL set, so BENCH_rN.json carries its own
    // denominator and a contended window can never be read as a
    // regression against a quiet-host pin. Tool/interpreter missing →
    // fields omitted, bench never crashes.
    // The failure MODE is part of the contract line (`duck_status`):
    // VERDICT r13 #2 — the driver window shipped duckdb_paired_total
    // 0.000 with the reason discarded, leaving the 2x gate checkable
    // only from builder-side pins. Every exit path now names itself.
    var duckStatus = "ok"
    val duckPerQuery: Map[String, Double] = try {
      if (!new java.io.File("tools/bench_oracle.py").exists()) {
        duckStatus = "tool_missing"; Map.empty
      } else {
        val tmp = java.nio.file.Files.createTempDirectory("graft-duck")
        val oj = tmp.resolve("oracle_sql.json")
        java.nio.file.Files.writeString(oj, Verify.oracleJson)
        val outJson = tmp.resolve("duck.json")
        val errFile = tmp.resolve("duck.err").toFile
        val pb = new ProcessBuilder("python3", "tools/bench_oracle.py",
          sfDir, oj.toString, outJson.toString)
        pb.redirectError(ProcessBuilder.Redirect.to(errFile))
        pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
        val p = pb.start()
        // 900 s wall: the twin set runs ~160-220 s quiet, but BOTH the
        // r12 (300 s) and r13 (480 s) driver windows were contended
        // enough to hit the wall and zero the denominator; the wall
        // only bounds a hung interpreter, so size it far above the
        // contended case
        if (!p.waitFor(900, java.util.concurrent.TimeUnit.SECONDS)) {
          p.destroyForcibly(); duckStatus = "timeout_900s"; Map.empty
        } else if (p.exitValue() != 0) {
          val err = try {
            scala.util.Using.resource(
              scala.io.Source.fromFile(errFile))(
              _.getLines().take(1).mkString).take(120)
          } catch { case _: Throwable => "" }
          duckStatus = (s"exit_${p.exitValue()}" +
            (if (err.nonEmpty) s": $err" else ""))
            .replaceAll("[\"\\\\]", "'")
          Map.empty
        } else {
          val n = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(outJson.toFile).path("queries")
          val b = Map.newBuilder[String, Double]
          n.fields().forEachRemaining(e =>
            b += e.getKey -> e.getValue.asDouble())
          b.result()
        }
      }
    } catch { case t: Throwable =>
      duckStatus = ("spawn_failed: " + String.valueOf(t.getMessage))
        .replaceAll("[\"\\\\]", "'").take(120)
      Map.empty
    }

    // WHOLE-BENCH adjudication sweeps (VERDICT r10 #2, de-biased per
    // ADVICE r11): the per-query outlier rerun fires seconds after the
    // contaminated triple — same contention, same result (r10: 19
    // reruns fired, window still 2.49x). So the bench sweeps the full
    // query surface again (one timed pass per query, minutes of
    // temporal distance from the first phase) and keeps per-query
    // minima — a transient co-tenant window washes out; a genuine
    // regression survives every sweep and reports honestly. The sweep
    // count is FIXED (2, ~1 min each), not conditioned on the gate
    // ratio: a retry-only-when-failing policy would bias the headline
    // downward relative to first-pass-green windows. The first-sweep
    // total is reported alongside the adjudicated one (aux line +
    // side file) so both distributions stay visible.
    val firstSweepTotal =
      results.collect { case (_, v) if v > 0 => v }.sum
    var adjudicated = results
    var sweeps = 0
    while (sweeps < 2) {
      sweeps += 1
      adjudicated = adjudicated.map { case (name, v) =>
        if (v <= 0) name -> v
        else {
          val t = timed(exec(qByName(name)(spark, sfDir)))
          name -> (if (t > 0) math.min(v, t) else v)
        }
      }
    }
    val finalResults = adjudicated

    // end-to-end pipeline timings (reference workloads + corpus ops),
    // run once, no warmup — reported separately from the query total
    import graft.pipelines._
    import org.apache.spark.sql.functions._
    val pipelines: Seq[(String, () => Unit)] = {
      lazy val ratings = Ratings.fromTestdata(spark, sfDir).cache()
      lazy val splits = Splitting.split(ratings)
      lazy val docsDf = Tables.documents(spark, sfDir)
      Seq(
        "pipeline_splitting" -> (() => {
          exec(splits.train); exec(splits.validation); exec(splits.test)
        }),
        "pipeline_popularity" -> (() =>
          Popularity.trainTest(splits.train, splits.test,
            damping = 1000.0, k = 100): Unit),
        "pipeline_als" -> (() =>
          AlsRec.trainTest(splits.train, splits.test, rank = 8,
            regParam = 0.1, maxIter = 5, k = 100): Unit),
        "pipeline_twins" -> (() => {
          val clones = ratings.filter(col("userId") % 15 === 0)
            .withColumn("userId", col("userId") + 1000000)
          exec(Segmentation.movieTwins(ratings.union(clones)))
        }),
        "pipeline_dedup_exact" -> (() =>
          exec(graft.dedup.Dedup.dropExactDuplicates(docsDf))),
        "pipeline_dedup_minhash" -> (() =>
          exec(graft.dedup.Dedup.minhashNearDuplicates(docsDf))),
        "pipeline_dedup_simhash" -> (() =>
          exec(graft.dedup.Dedup.simhashNearDuplicates(docsDf))),
        "pipeline_dedup_phash" -> (() =>
          exec(graft.dedup.Dedup.phashNearDuplicates(
            graft.multimodal.Multimodal.syntheticImageAssets(spark, 256)))),
        "pipeline_dedup_embedding" -> (() =>
          exec(graft.dedup.Dedup.embeddingNearDuplicates(
            Tables.embeddings(spark, sfDir), minCosine = 0.99))),
        "pipeline_semantic_dedup" -> (() =>
          exec(graft.dedup.Dedup.semanticDedup(
            Tables.embeddings(spark, sfDir), nClusters = 16,
            minCosine = 0.95))),
        "pipeline_twins_scalable" -> (() =>
          exec(Segmentation.movieTwinsScalable(ratings))),
        "pipeline_curation" -> (() =>
          exec(Curation.curate(docsDf.select(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text"))))),
        // five-count funnel report: one aggregate pass + the near-dup
        // chain (no cache — see Curation.funnel scaladoc)
        "pipeline_funnel" -> (() =>
          Curation.funnel(docsDf.select(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text"))): Unit),
        // trained langID, split into its two real costs: FIT is a
        // train-once artifact (save/load exists — a deployment never
        // pays it per query), SCORE is the per-corpus map pass the
        // scaladoc promises. Timing them together buried a 14 s
        // L-BFGS fit in what read as a scoring line.
        "pipeline_lang_model_fit" -> (() => {
          benchLangModel = graft.ml.LangModel.fit(
            graft.ml.LangModel.trainingCorpus(spark))
        }),
        "pipeline_lang_model_score" -> (() => {
          val m = benchLangModel
          require(m != null, "fit line did not run first")
          exec(m.score(docsDf.select(col("doc_id"), col("text")))
            .select(col("doc_id"), col("lang_pred"), col("lang_conf")))
        }),
        // streaming throughput: the events table replayed as a file
        // stream through the watermarked tumbling aggregation — the
        // measured time is ingest + stateful agg for the whole SF
        "pipeline_streaming_tumbling" -> (() => {
          val dir = java.nio.file.Files.createTempDirectory("graft-bench-stream")
          java.nio.file.Files.copy(
            java.nio.file.Path.of(sfDir, "events.parquet"),
            dir.resolve("events.parquet"))
          // schema must match the file's PHYSICAL types (readStream does
          // no cast) — so take it from a raw read of the copied file and
          // apply the engine's ts normalization after, same as the batch
          // loader does (Tables.normalizeEventTs).
          val rawSchema = spark.read.parquet(dir.toString).schema
          val stream = Tables.normalizeEventTs(
              spark.readStream.schema(rawSchema).parquet(dir.toString))
            .withColumn("event_time",
              org.apache.spark.sql.functions.expr(
                "timestamp_micros(ts div 1000)"))
          val q = graft.streaming.EventStreams.tumblingCountsStream(stream)
            .writeStream.format("noop").outputMode("update").start()
          try { q.processAllAvailable() } finally q.stop()
        }))
    }
    val pipeResults = pipelines.map { case (name, f) => name -> timed(f()) }

    // The driver keeps only the LAST ~2000 chars of output and JSON-parses
    // a line from it (BENCH_r01–r05 all show parsed:null because the old
    // single line was ~2700 chars and sbt-prefixed; r08 went null again at
    // 70 queries × 3-decimal values ≈ 1960 chars + sbt's ~72-char
    // "[success]" trailer). So: COMPACT values (2 decimals, trailing
    // zeros trimmed — 10 ms granularity, enough for paired medians),
    // failure sentinel -1, `failed` emitted only when non-empty, sf as
    // basename, pipelines on their own EARLIER line, and the contract
    // line printed LAST — after spark.stop(), so no shutdown logs can
    // land after it. fmtTotal keeps 3 decimals for the headline only.
    // SCHEMA NOTE for consumers: past ~95 queries the line falls back
    // to heavy-queries-only detail plus an {"others":{n,total}}
    // rollup (see contractHeavy below); the complete per-query table
    // is the committed BENCH_PIN.json.
    def fmtTotal(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def fmtN(decimals: Int)(v: Double): String =
      if (v < 0) "-1"
      else {
        val s = s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
        val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
        if (t.isEmpty) "0" else t
      }
    def fmt(v: Double): String = fmtN(2)(v)
    def obj(kvs: Seq[(String, Double)],
            f: Double => String = fmt): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
    // CONTENTION SELF-ANNOTATION (VERDICT r14 #5): after every
    // adjudication pass (outlier re-runs + two whole-surface sweeps),
    // any query STILL past 1.5x its committed pin (+0.25 s sub-100ms
    // floor) is named in the contract line with its ratio-vs-pin — a
    // contended window now lists its own victims instead of leaving
    // the adjudication to the next round's verdict. Capped at 8 names
    // (ratio-descending; the rest roll up into a count) so the field
    // can never blow the driver's ~1900-char tail window; the full
    // list lands in .bench/bench_full.json.
    val contended = finalResults.collect {
      case (n, v) if v > 0 && pin.get(n).exists(p => v > 1.5 * p + 0.25) =>
        n -> (v / math.max(pin(n), 1e-9))
    }.sortBy(-_._2)
    val contendedField =
      if (contended.isEmpty) ""
      else {
        val top = contended.take(8).map { case (n, r) =>
          "\"" + n + "\":" + fmt(r) }.mkString("{", ",", "}")
        s""","contended":$top,"contended_n":${contended.size}"""
      }

    // Complete per-query detail as a SIDE FILE: the printed contract
    // line degrades to heavy-queries-only past ~95 queries (driver
    // tail-window bound), which left BENCH_PIN refreshes without a
    // full table. Best-effort — the bench never fails over it.
    try {
      val dir = new java.io.File(".bench"); dir.mkdirs()
      val full = finalResults.map { case (k, v) =>
        "\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v)
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(".bench/bench_full.json"),
        s"""{"queries":$full,"duck":${duckPerQuery.map { case (k, v) =>
          "\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v)
        }.mkString("{", ",", "}")},"contended":${contended.map { case (k, v) =>
          "\"" + k + "\":" + "%.2f".formatLocal(java.util.Locale.ROOT, v)
        }.mkString("{", ",", "}")},"sf":"$sfDir","reruns":$reruns,"sweeps":$sweeps,"first_sweep_total":${"%.3f".formatLocal(java.util.Locale.ROOT, firstSweepTotal)}}""")
    } catch { case _: Throwable => () }

    val failed = (finalResults ++ pipeResults).collect { case (k, v) if v < 0 => k }
    // headline total counts SUCCESSFUL queries only — a query that burns
    // 60s before throwing must not inflate the DuckDB-comparable number;
    // the `failed` array is the failure signal (ADVICE r3)
    val total = finalResults.collect { case (_, v) if v > 0 => v }.sum
    val failedField =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(",\"failed\":[", ",", "]")
    val sfShort = new java.io.File(sfDir).getName
    // "aux", not "metric": only the contract line below may match a
    // driver that scans for the first {"metric":...} line
    // aux total mirrors the query-total policy: SUCCESSFUL pipelines
    // only — a failed (negated) time must not inflate the total; the
    // failure signal is the negative per-pipeline entry + `failed`
    // pairing: the denominator counts ONLY queries that succeeded on
    // BOTH engines in this window, so a one-sided failure can't tilt
    // the ratio either way
    val paired = finalResults.collect {
      case (n, v) if v > 0 && duckPerQuery.getOrElse(n, -1.0) > 0 =>
        (v, duckPerQuery(n))
    }
    val sparkPaired = paired.map(_._1).sum
    val duckPaired = paired.map(_._2).sum
    // a missing denominator must be LOUD in the line the driver parses,
    // not a silent 0.000 (VERDICT r13 #2)
    val pairFields =
      if (duckPaired > 0)
        s""","duck":${fmtTotal(duckPaired)},"ratio":${
          fmt(sparkPaired / duckPaired)}"""
      else s""","duck_status":"$duckStatus""""
    println(s"""{"aux":"pipelines","value":${fmtTotal(pipeResults.collect { case (_, v) if v > 0 => v }.sum)},"unit":"sec","pipelines":${obj(pipeResults)},"shuffle_partitions":$shufflePartitions,"reruns":$reruns,"sweeps":$sweeps,"first_sweep_total":${fmtTotal(firstSweepTotal)},"duckdb_paired_total":${fmtTotal(duckPaired)},"duck_status":"$duckStatus","sf":"$sfDir"}""")
    spark.stop()
    def contract(f: Double => String) =
      s"""{"metric":"total","value":${fmtTotal(total)},"unit":"sec","queries":${obj(finalResults, f)}$failedField$pairFields$contendedField,"sf":"$sfShort"}"""
    // the driver's tail window is ~2000 chars incl. sbt's trailer; a
    // line past ~1900 chars silently yields parsed:null driver-side —
    // degrade per-query precision to 0.1 s before letting that happen
    // (totals/ratio keep full precision either way). Past ~95 queries
    // even 1-decimal keys overflow the window (key NAMES are the
    // mass: ~15 chars × n), so the last resort keeps full 2-decimal
    // detail for the HEAVY queries (≥0.45 s, plus every failure) and
    // folds the sub-floor rest into {"others":{"n":…,"total":…}} —
    // the complete per-query table is committed in BENCH_PIN.json
    // (best-of-runs, refreshed every round), so nothing is lost, and
    // the line the driver parses can never silently truncate again.
    def contractHeavy(threshold: Double): String = {
      val (heavy, light) = finalResults.partition {
        case (_, v) => v < 0 || math.abs(v) >= threshold }
      val othersField =
        s""","others":{"n":${light.size},"total":${
          fmtTotal(light.map(_._2).sum)}}"""
      s"""{"metric":"total","value":${fmtTotal(total)},"unit":"sec","queries":${
        obj(heavy, fmt)}$othersField$failedField$pairFields$contendedField,"sf":"$sfShort"}"""
    }
    val line2 = contract(fmt)
    val line1 = if (line2.length <= 1880) line2 else contract(fmtN(1))
    // escalate the heavy threshold until the line fits — a contended
    // window inflates every median, so a fixed cut could readmit all
    // 99 keys and overflow exactly when it matters most
    val line =
      if (line1.length <= 1880) line1
      else Seq(0.45, 1.0, 2.0, 5.0).map(contractHeavy)
        .find(_.length <= 1880)
        .getOrElse(contractHeavy(Double.MaxValue))
    if (line.length > 1900)
      System.err.println(s"[bench] WARNING contract line ${line.length} chars (>1900): driver tail window may truncate it")
    println(line)
  }
}
