package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (the QueryProbe class): measure the NSW family's
  * quality knobs — bucketed-build edge recall vs the exact all-pairs
  * control, and end-to-end search recall vs exact top-k under both
  * entry strategies (smallest-node-ids vs trained-centroid-seeded) —
  * so test floors and SCALE.md tables are pinned from measurements,
  * not guesses. Usage: runMain graft.NswRecallProbe [sfDir] [hops].
  */
object NswRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val hops = if (args.length > 1) args(1).toInt
    else ops.SimilarityOps.NswHops
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    println(s"[nswprobe] sfDir=$sfDir n=$n hops=$hops")

    // --- edge recall: bucketed vs exact build
    def pairs(df: DataFrame): Set[(Long, Long)] = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val bucketed = pairs(ops.SimilarityOps.nswBuild(emb))
    val tb = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val exactE = pairs(ops.SimilarityOps.nswBuildExact(emb))
    val te = (System.nanoTime() - t1) / 1e9
    val edgeRecall = (exactE & bucketed).size.toDouble / exactE.size
    println(f"[nswprobe] edge recall bucketed-vs-exact: $edgeRecall%.4f " +
      f"(|exact|=${exactE.size} |bucketed|=${bucketed.size} " +
      f"build: bucketed $tb%.1f s, exact $te%.1f s)")

    // --- exact search ground truth (top-NswK per query)
    val q = emb.filter(col("vec_id") < ops.SimilarityOps.NswQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node"))
    val truth = emb.select(col("vec_id").as("node"),
        col("embedding").as("ve"))
      .crossJoin(broadcast(q))
      .filter(col("node") =!= col("query_id"))
      .withColumn("score",
        functions.Vectors.cosine6(col("qe"), col("ve")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ops.SimilarityOps.NswK)
      .select(col("query_id"), col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def toEdges(s: Set[(Long, Long)]): DataFrame =
      spark.createDataFrame(s.toSeq.sorted).toDF("src", "dst")
    def searchRecall(edges: Set[(Long, Long)],
        entries: Option[DataFrame], tag: String): Unit = {
      val und = toEdges(edges).select(col("src"), col("dst"))
        .unionByName(toEdges(edges).select(col("dst").as("src"),
          col("src").as("dst"))).distinct().localCheckpoint(true)
      val v = emb.select(col("vec_id").as("node"),
          col("embedding").as("ve"),
          functions.Vectors.normCol(col("embedding")).as("vn"))
        .localCheckpoint(true)
      val qq = emb.filter(col("vec_id") < ops.SimilarityOps.NswQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          functions.Vectors.normCol(col("embedding")).as("qn"))
      val ts = System.nanoTime()
      val got = ops.SimilarityOps.nswSearchOn(v, und, qq, entries, hops)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val dt = (System.nanoTime() - ts) / 1e9
      val rec = (truth & got).size.toDouble / truth.size
      println(f"[nswprobe] search recall [$tag]: $rec%.4f ($dt%.1f s)")
    }

    // entry strategy A: smallest NswBeam node ids (current serve path)
    searchRecall(bucketed, None, "bucketed-graph, id-entries")
    searchRecall(exactE, None, "exact-graph, id-entries")

    // entry strategy B: trained-centroid-seeded — each of the 16
    // kmeans centroids' nearest real node (round-6 cosine, tie id)
    val cents = ops.SimilarityOps.kmeansFit(emb)._2
    val centEntries = {
      val scored = ops.SimilarityOps.centroidEntryCandidates(emb, cents)
      scored.localCheckpoint(true)
    }
    println("[nswprobe] centroid entries: " +
      centEntries.collect().map(_.getLong(0)).sorted.mkString(","))
    searchRecall(bucketed, Some(centEntries), "bucketed-graph, centroid-entries")
    searchRecall(exactE, Some(centEntries), "exact-graph, centroid-entries")
    spark.stop()
  }
}
