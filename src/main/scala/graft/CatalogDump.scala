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
    SparkEntry.queries("sim_pq_topk")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("dedup_semantic_lsh")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("text_bpe_train")(spark, "/root/testdata/sf0.001").count()
    val oracles = SparkEntry.oracleSql.keySet
    spark.stop()
    println("| query | oracle | module |")
    println("|---|---|---|")
    val modules = Seq(
      "Relational" -> ops.Relational.queries.keySet,
      "EventOps" -> ops.EventOps.queries.keySet,
      "OlapOps" -> ops.OlapOps.queries.keySet,
      "TextOps" -> ops.TextOps.queries.keySet,
      "DedupOps" -> ops.DedupOps.queries.keySet,
      "SimilarityOps" -> ops.SimilarityOps.queries.keySet,
      "MultimodalOps" -> ops.MultimodalOps.queries.keySet,
      "EtlParity" -> ops.EtlParity.queries.keySet,
      "ScalarFuncs" -> ops.ScalarFuncs.queries.keySet,
      "Analytics" -> ops.Analytics.queries.keySet,
      "LayoutOps" -> ops.LayoutOps.queries.keySet,
      "CdcOps" -> ops.CdcOps.queries.keySet,
    )
    val inModules = modules.flatMap(_._2).toSet
    val generated =
      ops.SimilarityOps.generatedOracleKeys ++ ops.DedupOps.generatedOracleKeys ++
        ops.TextOps.generatedOracleKeys
    for (q <- SparkEntry.queries.keySet.toSeq.sorted) {
      val mod = modules.find(_._2.contains(q)).map(_._1).getOrElse("streaming")
      val o =
        if (generated.contains(q)) "DuckDB (generated)"
        else if (oracles.contains(q)) "DuckDB"
        else "rows-only"
      println(s"| `$q` | $o | $mod |")
    }
    println(s"Total: ${SparkEntry.queries.size} queries, " +
      s"${oracles.size} DuckDB-oracled " +
      s"(${generated.count(oracles.contains)} generated from trained " +
      s"constants, rest hand-written), " +
      s"${SparkEntry.queries.size - oracles.size} rows-only.")
  }
}
