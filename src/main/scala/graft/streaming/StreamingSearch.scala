package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ANN SERVING (VERDICT r9 #6) — the online half of the
  * similarity story: query vectors arrive as micro-batches and are
  * answered against the ARTIFACT-SERVED IVF index
  * ([[graft.ops.SimilarityOps.servingLayout]] — the same stored
  * bytes, same content address, the offline path built). Per batch:
  * probe selection on the streamed vectors (the centroid-score
  * literal expression applies to a micro-batch exactly as to a batch
  * scan), a stream-static equi-join to the layout on cluster id,
  * fused integer-cosine scoring — all stateless, so arrival
  * batching cannot change results, and the drained union grades
  * against the BATCH query's own oracle (`sim_ivf_quantized`): the
  * serving side cannot tell who computed the answer, which is the
  * artifact-store promise applied to the read path.
  *
  * The per-query top-k tail runs on the drained sink through the
  * SAME [[graft.ops.SimilarityOps.servingRank]] the batch tails use
  * (window functions are unsupported inside an append stream; in
  * production this rank runs per-request in the serving layer over
  * the request's own candidates, which is exactly what draining the
  * request's rows and ranking them reproduces — the
  * stream_quantile_rollup shared-tail pattern).
  *
  * Scale: the fixture broadcast-joins the (tiny) static layout into
  * each micro-batch; at 100 TB the orientation flips — the
  * micro-batch of queries is the broadcast side and the layout read
  * stays partition-pruned to the batch's probed clusters (the
  * `sim_ivf_pruned_layout` scan), with per-request state bounded by
  * |queries|·nprobe candidates. */
object StreamingSearch {

  private val QuerySlice = 10L // the batch query set (vec_id < 10)
  private val ArrivalFiles = 3 // micro-batch arrival shape

  /** The query stream staged as [[ArrivalFiles]] parquet files (one
    * per micro-batch under maxFilesPerTrigger=1) — content-addressed
    * like every fixture artifact; mtimes pin arrival order. */
  private def stagedQueryDir(spark: SparkSession, sfDir: String): String =
    graft.ArtifactStore.directory(spark, "sim_query_stream",
      s"$sfDir/embeddings.parquet", version = 1) { tmp =>
      val q = graft.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < QuerySlice)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      (0 until ArrivalFiles).foreach { i =>
        val stage = java.nio.file.Files.createTempDirectory("simq-stage")
        q.filter(col("vec_id") % ArrivalFiles === i)
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val listing = java.nio.file.Files.list(stage)
        val part = try listing
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
        val dest = java.nio.file.Paths.get(tmp, f"q$i%02d.parquet")
        java.nio.file.Files.move(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
        val leftover = java.nio.file.Files.list(stage)
        try leftover.forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally leftover.close()
        java.nio.file.Files.deleteIfExists(stage)
      }
    }

  /** Graded entry: stream the query set, serve top-3 neighbors per
    * query from the stored IVF index — output identical to
    * `sim_ivf_quantized`. */
  def simTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val qdir = stagedQueryDir(spark, sfDir)
    // the staged files are written by THIS Spark from the embeddings
    // table, so the element type is the table's own (float); vec_id
    // long. No timestamp columns — no encoding dispatch needed.
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val qs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(qdir)
    val probes = graft.ops.SimilarityOps.probesFor(qs,
      graft.ops.SimilarityOps.servingCentroidScores(spark, sfDir))
    val layout = graft.ops.SimilarityOps.servingLayout(spark, sfDir)
    // stream-static join: the static index side broadcasts into each
    // micro-batch (stateless — no watermark, no join state)
    val scored = graft.ops.SimilarityOps.servingScore(
      probes.join(broadcast(layout), Seq("centroid_id")))
      .select(col("query_id"), col("vec_id"), col("qcos"))
    // stateless append: rows emit eagerly, nothing is
    // watermark-held — the trailing no-data batch buys nothing
    val sink = StreamingSessions.runToCompletion(spark, scored,
      "stream_sim_topk_sink", mode = "append", partitions = 4,
      noDataBatch = false)
    graft.ops.SimilarityOps.servingRank(sink)
  }
}
