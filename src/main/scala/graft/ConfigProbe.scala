package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc A/B probe of session configs against the per-query
  * scheduling floor (VERDICT r7 #6): most declared queries are
  * sub-second at sf0.1, so task count and AQE stage boundaries — not
  * data — own their wall time. This times a floor-bound sample and
  * the heavy composites under each candidate config, all in one
  * session (every knob probed is a runtime session conf). Diagnostic
  * tooling, not part of the driver contract. */
object ConfigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def median3(f: => Unit): Double = {
      f // warmup under THIS config (plans/codegen differ per config)
      Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }

    val floor = Seq("q_global_avg", "q_distinct_keys", "q_groupby_count",
      "q_dim_rollup", "q_lang_facets", "q_dedup_exact", "q_cosine_topk",
      "q_window_rank_topk", "q_union_splits", "q_semi_join_popular")
    val heavy = Seq("q_training_data", "q_curation", "q_funnel",
      "q_dedup_near", "q_line_dedup", "q_pack_chunks")

    val off8 = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    // Round-10 probe verdict: with the adopted base (AQE off + 8)
    // run cold FIRST and again warm LAST, shuffle=4 and
    // constraintPropagation=false both land within noise of the base
    // once JIT warmth is controlled for (forward order: 1.77/1.67 vs
    // 2.43 base; REVERSED order: 2.02/2.10 vs 1.97 base) — the
    // forward-order "win" was warm-up bias. Config stays AQE-off+8.
    val variants: Seq[(String, Map[String, String])] = Seq(
      // adopted-base-last ordering so later variants can't win on
      // JIT warmth alone (the r8 ordering bias)
      "off8 + ncp + shuffle=4" -> (off8 +
        ("spark.sql.constraintPropagation.enabled" -> "false") +
        ("spark.sql.shuffle.partitions" -> "4")),
      "off8 + no constraint prop" -> (off8 +
        ("spark.sql.constraintPropagation.enabled" -> "false")),
      "off8 + shuffle=4" -> (off8 +
        ("spark.sql.shuffle.partitions" -> "4")),
      "AQE off + shuffle=8" -> off8,
      "base (AQE on, shuffle=32)" -> Map(),
      "shuffle=8" -> Map("spark.sql.shuffle.partitions" -> "8"))

    val defaults = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
      "spark.sql.shuffle.partitions" -> cpus)

    for ((label, conf) <- variants) {
      (defaults ++ conf).foreach { case (k, v) => spark.conf.set(k, v) }
      val fs = floor.map(q =>
        median3(exec(SparkEntry.queries(q)(spark, sfDir))))
      val hs = heavy.map(q =>
        median3(exec(SparkEntry.queries(q)(spark, sfDir))))
      println(f"$label%-28s floor=${fs.sum}%6.2f s " +
        f"(avg ${fs.sum / fs.size}%5.3f)  heavy=${hs.sum}%6.2f s")
      println("  floor: " + floor.zip(fs).map { case (q, t) =>
        f"$q=${t}%.2f" }.mkString(" "))
      println("  heavy: " + heavy.zip(hs).map { case (q, t) =>
        f"$q=${t}%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
