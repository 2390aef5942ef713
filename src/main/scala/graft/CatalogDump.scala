package graft
/** Prints the query catalog as markdown (used to generate QUERIES.md). */
object CatalogDump {
  def main(args: Array[String]): Unit = {
    // the trainer-derived oracles are GENERATED from trained constants
    // (SimilarityOps.generatedOracles); run one training at the
    // smallest SF so the catalog reports them the way a Verify run
    // produces them, not as rows-only
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("sim_kmeans_sizes")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("sim_pca_project")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("sim_pq_topk")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("dedup_semantic_lsh")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("text_bpe_train")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("sim_ivf_append")(spark, "/root/testdata/sf0.001").count()
    val oracles = SparkEntry.oracleSql.keySet
    spark.stop()
    println("| query | oracle | module |")
    println("|---|---|---|")
    // module attribution comes from SparkEntry.moduleInventory — the
    // ONE registration point — not a hand-duplicated parallel list
    // that silently mislabeled queries of any newly added module
    // (review finding)
    val modules = SparkEntry.moduleInventory
    val generated =
      ops.SimilarityOps.generatedOracleKeys ++ ops.DedupOps.generatedOracleKeys ++
        ops.TextOps.generatedOracleKeys
    for (q <- SparkEntry.queries.keySet.toSeq.sorted) {
      val mod = modules.find(_._2.contains(q)).map(_._1).getOrElse("???")
      // the generated label must also CHECK the oracle exists: a
      // declined/ambiguous trainer splice would otherwise print
      // "DuckDB (generated)" for an oracle-less query and contradict
      // the total (review finding)
      val o =
        if (generated.contains(q) && oracles.contains(q)) "DuckDB (generated)"
        else if (oracles.contains(q)) "DuckDB"
        else "rows-only"
      println(s"| `$q` | $o | $mod |")
    }
  }
}
