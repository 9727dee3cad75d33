package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB trace of one declared query: prints every Spark job's call
  * site and wall duration, so a fixture-heavy query's job census
  * ([[JobProfile]]) can be broken down to the exact engine call that
  * launched each job. Tooling, not engine surface.
  *
  * `runMain graft.TraceJobs <queryName> [sfDir]`
  */
object TraceJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)

    val starts = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String)]()
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (trace) {
          val p = j.properties
          val site =
            if (p == null) "?"
            else Option(p.getProperty("callSite.short"))
              .orElse(Option(p.getProperty("spark.job.description")))
              .getOrElse(p.stringPropertyNames().toArray
                .mkString(",").take(120))
          starts.put(j.jobId, (System.nanoTime(), site))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (trace) {
          Option(starts.get(e.jobId)).foreach { case (t0, site) =>
            println(f"  job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
          }
        }
    })

    val fn = SparkEntry.queries(name)
    def exec(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    exec() // warmup
    trace = true
    val t0 = System.nanoTime()
    exec()
    Thread.sleep(300)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
