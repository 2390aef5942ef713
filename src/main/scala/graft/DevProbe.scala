package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component-timing dev probe (OptProbe's sibling, not a declared
  * query): times sub-pipelines of composed operators and splits a
  * query's wall into DataFrame build / plan / execute — the split
  * that exposed the ~100 ms-per-read source-re-resolution cost the
  * r15 relation caches removed. Body is whatever the current
  * investigation needs; it is a scratchpad, not a contract. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def time(name: String)(body: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[dev] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/orders.parquet")
      val t1 = System.nanoTime()
      Tables.orders(spark, sfDir)
      val t2 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
      val t3 = System.nanoTime()
      println(f"[dev] raw read.parquet(orders)=${(t1 - t0) / 1e9}%.3f " +
        f"Tables.orders=${(t2 - t1) / 1e9}%.3f raw(lineitem)=${(t3 - t2) / 1e9}%.3f s")
    }
    // planning-vs-execution split for driver-bound queries
    for (q <- Seq("quality_pk_audit", "etl_load_report",
        "join_regional_revenue", "quality_fk_audit")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"[dev] $q rep $i: build=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f s")
      }
    }
    val docsRaw = Tables.documents(spark, sfDir)
    val withSh = docsRaw.select(col("doc_id"),
      ops.DedupOps.shingles(col("text")).as("sh"))
    time("truth: jaccardPrefixPairsOn(full corpus)") {
      ops.DedupOps.jaccardPrefixPairsOn(withSh).count()
    }
    // sub-stages of the truth pipeline
    import org.apache.spark.sql.expressions.Window
    val toks = withSh.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("tok"))
    time("truth.a: toks explode + freq + join + window filter") {
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      toks.join(freq, Seq("tok"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("tf"), col("tok"))))
        .filter(col("rk") <= col("sz") - ceil(col("sz") * 0.5) + 1)
        .count()
    }
    time("truth.b: pref self-join + distinct") {
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val pref = toks.join(freq, Seq("tok"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("tf"), col("tok"))))
        .filter(col("rk") <= col("sz") - ceil(col("sz") * 0.5) + 1)
        .select(col("doc_id"), col("sz"), col("tok"), col("rk"))
      val reqOverlap = (col("a.sz") + col("b.sz")) * lit(0.5 / 1.5)
      pref.as("a").join(pref.as("b"),
          col("a.tok") === col("b.tok") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("b.sz") >= ceil(col("a.sz") * 0.5) &&
            col("b.sz") * 0.5 <= col("a.sz") &&
            (lit(1) + least(col("a.sz") - col("a.rk"),
              col("b.sz") - col("b.rk"))) >= reqOverlap)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct().count()
    }
    time("cand: lshCandidatePairs(full corpus)") {
      ops.DedupOps.lshCandidatePairs(docsRaw).count()
    }
    time("sig only: bandBuckets") {
      ops.DedupOps.bandBuckets(ops.fanOut(docsRaw)).count()
    }
    time("full dedup_eval_pr") {
      ops.DedupOps.dedupEvalPr(spark, sfDir).count()
    }
    spark.stop()
  }
}
