package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round dev utility (r15): probe MANY queries in one
  * warmed JVM — per-rep wall times, Spark job/stage counts per rep
  * (the fixed-overhead attribution the bench's per-query seconds
  * can't give), and the AQE-final formatted plan written to
  * plans/<tag>/<query>_<suffix>.txt for the judge's plan-diff
  * evidence.
  *
  * Usage: runMain graft.OptProbe <suffix> <q1,q2,...> [sfDir] [reps]
  * (suffix = "before" | "after"; plans land in plans/r15/).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" lets a
    // config hypothesis be measured without a code edit per trial.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stageDetail = sys.env.get("SPARK_GRAFT_STAGE_DETAIL").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        if (stageDetail)
          println(s"[opt-stage] id=${s.stageInfo.stageId} " +
            s"tasks=${s.stageInfo.numTasks} name=${s.stageInfo.name}")
      }
    })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try SparkEntry.queries("stream_stateful_totals")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => }
    val planDir = java.nio.file.Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "r16"))
    java.nio.file.Files.createDirectories(planDir)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        val j0 = jobs.get(); val s0 = stages.get(); val t0c = tasks.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        // drain the listener bus so job/stage counts align to this rep
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        println(f"[opt] $name rep $i: $t%.3f s  jobs=${jobs.get() - j0} stages=${stages.get() - s0} tasks=${tasks.get() - t0c}")
      }
      val df = fn(spark, sfDir)
      df.count() // force AQE-final plan
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(planDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[opt] $name plan -> plans/${planDir.getFileName}/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
