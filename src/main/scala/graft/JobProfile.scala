package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query JOB/STAGE/TASK census: runs each declared query once
  * (after one warmup of the whole surface) with a listener counting
  * Spark jobs, stages, tasks and summed task time — the diagnostic
  * that separates "this query's PLAN is slow" from "this query LAUNCHES
  * twenty fixture jobs and each pays the scheduler floor". Guide §1
  * (measure first): at sf0.1 most declared queries sit near the
  * per-job floor, so job COUNT, not plan shape, is the first thing to
  * read. Tooling, not engine surface — not part of the driver
  * contract.
  *
  * `runMain graft.JobProfile [sfDir] [namePrefix]`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val prefix = if (args.length > 1) args(1) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.isFile).map(_.length).sum).getOrElse(Long.MaxValue)
    val shufflePartitions = math.max(8L,
      math.min(cpus.toLong, inputBytes / (64L << 20))).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled",
        (inputBytes > (1L << 30)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })

    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val queries = SparkEntry.queries.toSeq
      .filter { case (k, _) =>
        SparkEntry.oracleSql.contains(k) && k.startsWith(prefix) }
      .sortBy(_._1)
    // warmup whole surface once (JIT + parquet footers)
    queries.foreach { case (_, fn) =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s")
    val rows = queries.map { case (name, fn) =>
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L
      val t0 = System.nanoTime()
      val ok = try { exec(fn(spark, sfDir)); true }
               catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give it a beat to drain per query
      Thread.sleep(150)
      val r = (name, if (ok) sec else -sec, jobs, stages, tasks,
        taskMs / 1000.0)
      println(f"${r._1}%-28s ${r._2}%7.2f ${r._3}%5d ${r._4}%6d ${r._5}%6d ${r._6}%8.2f")
      r
    }
    val tot = rows.map(r => math.abs(r._2)).sum
    val totJ = rows.map(_._3).sum
    println(f"TOTAL ${tot}%7.2f s  $totJ%5d jobs  (${rows.size} queries)")
    spark.stop()
  }
}
