package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time one registered query N times in a warmed JVM and
  * print the AQE-final physical plan — the tool for chasing
  * driver-tail timing anomalies (is it noise, or did a join strategy
  * flip?). Usage: runMain graft.QueryProbe <name> [sfDir] [repeats]. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    // SAME default parallelism as graft.Bench: a probe that re-checks
    // a bench anomaly under a different core/partition count measures
    // a different plan configuration, not the anomaly
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = fn(spark, sfDir)
    df.count() // force AQE so executedPlan shows the final strategies
    println("[probe] final plan:")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
