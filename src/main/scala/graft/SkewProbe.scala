package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: sweep AQE skew-join conf values over the skewed
  * orders⋈customer frame and report which arm the split — the tool
  * that sized `Relational.withSkewAqe`'s constants against the real
  * compressed shuffle sizes of the fixtures (estimating lz4'd
  * UnsafeRow bytes on paper was off by the better part of an order
  * of magnitude). Usage: runMain graft.SkewProbe [sfDir]. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger.getLogger(
      "org.apache.spark.sql.execution.adaptive").setLevel(
      org.apache.log4j.Level.DEBUG)
    var found = false
    for ((factor, thresh, advis, force) <- Seq(
        ("2.0", "16k", "16k", "false"), ("2.0", "8k", "8k", "false"),
        ("1.5", "4k", "4k", "false"), ("1.2", "1k", "1k", "false"),
        ("1.2", "1k", "1k", "true")) if !found) {
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force)
      val settings = Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> factor,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> thresh,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advis,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
      settings.foreach { case (k, v) => spark.conf.set(k, v) }
      val f = ops.Relational.skewAqeFrame(spark, sfDir)
      f.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          println(s"[skewprobe] shuffle stage ${s.id} partition bytes: " +
            s.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("?"))
          walk(s.plan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case other => other.children.foreach(walk)
      }
      f.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case other =>
          println("[skewprobe] not adaptive: " + other.getClass.getSimpleName)
      }
      val plan = f.queryExecution.executedPlan.toString
      val skew = plan.contains("skew=true")
      println(s"[skewprobe] factor=$factor thresh=$thresh advis=$advis " +
        s"force=$force -> skew=$skew")
      if (skew) {
        println(plan.linesIterator
          .filter(l => l.contains("skew") || l.contains("AQEShuffleRead"))
          .mkString("\n"))
        // flag, don't `return`: an early return would exit main
        // without reaching the spark.stop() below (ADVICE r9)
        found = true
      }
    }
    if (!found) println("[skewprobe] no configuration armed the split")
    spark.stop()
  }
}
