package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level wall budget of the q_mv_refresh / q_snapshot_bloom
  * fixtures: times each engine call separately so the JobProfile
  * census can be split into per-call job time vs driver-side time.
  * Tooling, not engine surface. */
object TracePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[
      Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobStarts.remove(e.jobId)).foreach { t0 =>
            jobNanos.addAndGet(System.nanoTime() - t0)
            jobCount.incrementAndGet(): Unit
          }
      })
    def t[A](name: String)(f: => A): A = {
      Thread.sleep(120)
      val (j0, c0) = (jobNanos.get(), jobCount.get())
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(120)
      val wall = (System.nanoTime() - t0) / 1e9 - 0.12
      println(f"  $name%-28s $wall%7.3f s  jobs=${jobCount.get() - c0}%3d jobSec=${(jobNanos.get() - j0) / 1e9}%7.3f")
      r
    }
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup the session on the same table reads
    exec(Tables.events(spark, sfDir))

    import graft.sources.{Materialized, Snapshot}
    (1 to 2).foreach { pass =>
      println(s"== q_mv_refresh phases, pass $pass ==")
      val root = java.nio.file.Files
        .createTempDirectory("graft-mv-trace").toString
      val table = s"$root/t"
      val mv = s"$root/mv"
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("user_id"))
      val mx = t("max(event_id)") {
        e.agg(max(col("event_id"))).head().getLong(0) }
      val (lo, hi) = (mx / 4, mx / 2)
      t("append v1") {
        Snapshot.append(e.filter(col("event_id") % 2 === 0), table) }
      t("mv.create") {
        Materialized.create(spark, table, mv,
          keyCols = Seq("event_type"), sumCols = Seq("user_id"),
          minMaxCols = Seq("event_id")) }
      t("append v2") {
        Snapshot.append(e.filter(col("event_id") % 2 === 1), table) }
      t("deleteRangeMor") {
        Snapshot.deleteRangeMor(spark, table, "event_id", lo, hi) }
      t("refresh") { Materialized.refresh(spark, table, mv) }
      t("refresh noop") { Materialized.refresh(spark, table, mv) }
      t("versions") { Snapshot.versions(spark, s"$mv/state") }
      t("read+noop") {
        exec(Materialized.read(spark, mv).orderBy(col("event_type"))) }
    }
    spark.stop()
  }
}
