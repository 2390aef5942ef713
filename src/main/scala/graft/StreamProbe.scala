package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev utility: run one streaming twin with a listener that prints
  * each micro-batch's duration breakdown (triggerExecution,
  * queryPlanning, walCommit, stateStore commit times ride
  * durationMs) — the tool for attributing the per-query streaming
  * fixed cost before tuning it.
  * Usage: runMain graft.StreamProbe <query> [sfDir] [reps]. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    // A/B lever: route temp checkpoints (offset/commit logs + state
    // store deltas) to tmpfs instead of disk-backed /tmp
    if (sys.env.get("SPARK_GRAFT_SHM").contains("1")) {
      val d = "/dev/shm/graft-tmp"
      new java.io.File(d).mkdirs()
      sys.props("java.io.tmpdir") = d
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[streamprobe] batch ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$d")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    try SparkEntry.queries("stream_stateful_totals")(spark,
      "/root/testdata/sf0.001").count()
    catch { case _: Throwable => }
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[streamprobe] run $i total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
