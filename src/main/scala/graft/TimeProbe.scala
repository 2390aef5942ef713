package graft
/** Multi-query repeat timer. Parallelism comes from SPARK_GRAFT_CPUS
  * exactly like Bench/QueryProbe — the same-parallelism invariant
  * QueryProbe documents: probing a bench anomaly under a different
  * core/partition count measures a different plan configuration, not
  * the anomaly (review finding; this main previously hardcoded 32).
  * Default stays 32 for standalone plan exploration at dev scale. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try SparkEntry.entry(spark).count() // warm (best-effort, like Bench)
    catch { case _: Throwable => }
    for (q <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      println(f"$q rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
