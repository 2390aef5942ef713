package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-catalog audit (VERDICT r5 #9): the 117-query catalog's
  * verification story is only as strong as the query↔oracle mapping
  * staying total — an oracle keyed to a renamed query silently stops
  * grading anything, and a query added without an oracle silently
  * drops to rows-only. This spec makes both drifts loud, and pins the
  * generated-oracle protocol (trainer-derived SQL appears exactly
  * when its constants exist unambiguously).
  *
  * Provenance doc: SCALE.md §"Oracle provenance"; QUERIES.md marks
  * each generated oracle in its oracle column.
  */
class OracleCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val generatedKeys =
    ops.SimilarityOps.generatedOracleKeys ++ ops.DedupOps.generatedOracleKeys ++ ops.TextOps.generatedOracleKeys

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles keyed to no registered query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("no two modules register the same query name (silent overwrite)") {
    assert(SparkEntry.declaredQueryCount === SparkEntry.queries.size)
  }

  test("after one training run the catalog is fully oracled (bijection)") {
    // the generated oracles splice trained constants, so they exist
    // only once the trainers have run (the Verify protocol runs every
    // query before dumping oracleSql — replicate that for the three
    // trainer-derived queries). Clear the in-JVM trainer caches first:
    // another spec training at a different SF in this JVM would make
    // the exactly-one-entry protocol correctly DECLINE, which is not
    // what this test audits.
    ops.SimilarityOps.clearKmeansMemoryCache()
    ops.SimilarityOps.clearPqMemoryCache()
    ops.SimilarityOps.clearSrpParamsCache()
    ops.SimilarityOps.clearPcaMemoryCache()
    ops.SimilarityOps.clearAppendModelCache()
    for (q <- Seq("sim_kmeans_sizes", "sim_pq_topk", "dedup_semantic_lsh", "text_bpe_train",
        "sim_pca_project", "sim_ivf_append", "dedup_semantic_append_auto"))
      SparkEntry.queries(q)(spark, sf).count()
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries with no oracle after training: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("generated-oracle keys are registered queries with oracle SQL present") {
    val unknown = generatedKeys -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"generated keys name no query: $unknown")
    // runs after the bijection test in suite order, but do not depend
    // on ordering: re-trigger the trainers idempotently
    for (q <- Seq("sim_kmeans_sizes", "sim_pq_topk", "dedup_semantic_lsh", "text_bpe_train",
        "sim_pca_project", "sim_ivf_append", "dedup_semantic_append_auto"))
      SparkEntry.queries(q)(spark, sf).count()
    val absent = generatedKeys -- SparkEntry.oracleSql.keySet
    assert(absent.isEmpty,
      s"generated oracles missing after a training run: $absent")
  }
}
