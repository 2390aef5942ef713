package graft
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).count() // warm
    for (q <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      println(f"$q rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
