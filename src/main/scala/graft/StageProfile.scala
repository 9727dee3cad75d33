package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.pipelines.Curation
import graft.text.Text

/** Ad-hoc stage-level wall profile of the curation composite — which
  * stage owns the time at a given SF. Diagnostic tooling, not part of
  * the driver contract. */
object StageProfile {
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
    def timed(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.sorted.apply(1)}%7.2f s (median of 3)")
    }

    val docs = Tables.documents(spark, sfDir)
    val cfg = Curation.Config()

    val scored = docs
      .withColumn("toks", Text.tokenize(col("text")))
      .withColumn("detected", Text.langIdFromTokens(col("toks"), col("text")))
      .withColumn("quality", Text.qualityScoreFromTokens(col("toks"), col("text")))
      .drop("toks")
    val filtered = scored
      .filter(col("detected").isin(cfg.langs.toSeq: _*))
      .filter(col("quality") >= lit(cfg.minQuality))
      .filter(Text.urlCount(col("text")) <= lit(cfg.maxUrls))
    val exact = Dedup.dropExactDuplicates(filtered)
    val pairs = Dedup.ngramJaccardPairs(exact, minJaccard = cfg.nearDupJaccard)
      .select(col("id_a"), col("id_b"))

    timed("scan only")(exec(docs))
    timed("kernels")(exec(scored))
    timed("..+filters")(exec(filtered))
    timed("..+exact dedup")(exec(exact))
    timed("..+ngram pairs")(exec(pairs))
    timed("..+CC")(exec(Dedup.connectedComponents(pairs)))
    timed("full curate")(exec(Curation.curate(docs, cfg)))
    timed("funnelFrame")(exec(Curation.funnelFrame(docs, cfg)))
    spark.stop()
  }
}
