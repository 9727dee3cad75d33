package graft

import org.apache.spark.sql.SparkSession

/** Targeted single-query timing: `runMain graft.QueryTime q_a q_b ...`
  * times just the named declared queries under graft.Bench's exact
  * session config and protocol (noop sink, one warmup, median of 3) —
  * for iterating on one operator without paying the full bench sweep.
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in Bench. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTime <query-name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.isFile).map(_.length).sum).getOrElse(Long.MaxValue)
    val shufflePartitions = math.max(8L,
      math.min(cpus.toLong, inputBytes / (64L << 20))).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // mirrors Bench's size-conditional AQE (see Bench.scala)
      .config("spark.sql.adaptive.enabled",
              (inputBytes > (1L << 30)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    args.foreach { name =>
      exec(name) // warmup
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        exec(name)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s median ${times.sorted.apply(1)}%.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
      // SPARK_GRAFT_EXPLAIN=1: dump the POST-EXECUTION adaptive plan
      // (the one with final stage decisions + ReusedExchange nodes) —
      // the plan-audit loop the brief asks for per operator
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        println(s"=== $name executed plan ===")
        println(df.queryExecution.executedPlan.toString)
      }
      // SPARK_GRAFT_EXPLAIN_FILE=<path-prefix>: write the FORMATTED
      // plan (`explain("formatted")` text) to <prefix><query>.txt —
      // the committed plan evidence the optimization rounds require
      sys.env.get("SPARK_GRAFT_EXPLAIN_FILE").foreach { prefix =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        java.nio.file.Files.writeString(
          java.nio.file.Path.of(s"$prefix$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
