package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("MinHash LSH finds exactly the exact-Jaccard pairs (clean-gap corpus)") {
    val lsh = ops.DedupOps.minhashLsh(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact all-pairs shingle Jaccard ≥ 0.5
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), ops.DedupOps.shingles(col("text")).as("sh"))
    val exact = docs.select(col("doc_id").as("a_id"), col("sh").as("sa"))
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("sb")),
        col("a_id") < col("b_id"))
      .withColumn("j", ops.DedupOps.jaccard(col("sa"), col("sb")))
      .filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact,
      s"missed=${exact -- lsh} spurious=${lsh -- exact}")
  }

  test("IVF probe achieves high recall vs exact top-k") {
    val exact = ops.SimilarityOps.cosineTopK(spark, sf)
      .filter(col("rank") <= 3).select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = ops.SimilarityOps.ivfProbe(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low (2/16 clusters probed)")
  }

  test("multimodal: mapPartitions decode equals expression decode") {
    val a = ops.MultimodalOps.decodeFeatures(spark, sf).collect().toSeq
    val b = ops.MultimodalOps.decodeMapPartitions(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("driver smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("no duplicate query names across modules (silent overwrite)") {
    assert(SparkEntry.queries.size === SparkEntry.declaredQueryCount)
  }
}
