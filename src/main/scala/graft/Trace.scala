package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement harness (guide §1): run named queries with a listener that
  * counts jobs/stages/tasks and shuffle bytes, time each repetition, and
  * dump the formatted physical plan per query. NOT part of the bench
  * contract — a local iteration aid only.
  *
  * Usage: sbt "runMain graft.Trace [reps=N] q_name q_name ..."
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_TRACE_OUT (plan dir).
  */
object Trace {
  private class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    // opt-in per-job inventory (SPARK_GRAFT_TRACE_JOBS=1): job id, SQL
    // execution id and call site — the signal for WHICH statement owns a
    // suite's fixed-cost jobs when totals alone don't say
    private val perJob = sys.env.get("SPARK_GRAFT_TRACE_JOBS").contains("1")
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      if (perJob) {
        val p = j.properties
        val exec = Option(p).flatMap(pp => Option(pp.getProperty("spark.sql.execution.id"))).getOrElse("-")
        val site = Option(p).flatMap(pp => Option(pp.getProperty("callSite.short"))).getOrElse("?")
        println(s"JOB job=${j.jobId} exec=$exec stages=${j.stageIds.length} site=$site")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        val dur = m.executorRunTime
        cpuMs.addAndGet(dur)
        gcMs.addAndGet(m.jvmGCTime)
        var cur = maxTaskMs.get()
        while (dur > cur && !maxTaskMs.compareAndSet(cur, dur)) cur = maxTaskMs.get()
      }
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      shufRead.set(0); shufWrite.set(0); maxTaskMs.set(0); cpuMs.set(0); gcMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_TRACE_OUT", "/tmp/graft_trace")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(1)
    val names = args.filterNot(_.startsWith("reps=")).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    if (names.exists(graft.queries.StorageQueries.fixtureQueries))
      try graft.queries.StorageQueries.prebuildFixture(spark, sfDir)
      catch { case e: Throwable => println(s"fixture build failed: $e") }
    val listener = new Counter
    spark.sparkContext.addSparkListener(listener)
    val picked = SparkEntry.queries.filter(kv => names(kv._1)).toSeq.sortBy(_._1)
    picked.foreach { case (name, fn) =>
      (1 to reps).foreach { rep =>
        spark.sparkContext.setJobDescription(s"$name rep $rep")
        listener.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain before reading counters
        println(f"TRACE $name%-28s rep=$rep dt=$dt%7.3f rows=$n%7d " +
          f"jobs=${listener.jobs.get}%4d stages=${listener.stages.get}%4d " +
          f"tasks=${listener.tasks.get}%5d shufR=${listener.shufRead.get}%10d " +
          f"shufW=${listener.shufWrite.get}%10d maxTaskMs=${listener.maxTaskMs.get}%6d " +
          f"cpuMs=${listener.cpuMs.get}%7d gcMs=${listener.gcMs.get}%6d")
        if (rep == reps) {
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
