package graft.streaming

import graft.etl.{Dedup, Geo, Ingest, Normalize, Publish}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Continuous voter-file ingest: the batch `LoadPipeline` re-expressed
  * as a file-source stream — new `NN--ST--*.tab` files landing in the
  * watched directory are normalized, deduped, and published
  * incrementally via `foreachBatch`. This is the always-on version of
  * the reference's cron-style loader: same projection/coercion/
  * geohash/dedup semantics, with cross-batch PK dedup done against the
  * already-published sink (ON CONFLICT DO NOTHING across time).
  *
  * Scale notes: the file source tracks processed files in the
  * checkpoint (exactly-once per file); each micro-batch is the same
  * narrow pipeline as the batch load, so ingest throughput scales with
  * executors exactly like the batch path. State outside the
  * checkpoint is the published table itself.
  */
object StreamingLoad {

  /** Start ingesting `inputDir` into `outPath`. The returned query is
    * running; callers drive it (`processAllAvailable`) or let it run.
    * `header` must list the TSV's columns (streams can't peek at a
    * first file that may not exist yet). */
  def start(spark: SparkSession, inputDir: String, outPath: String,
      checkpoint: String, header: Seq[String]) = {
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val raw = spark.readStream
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "")
      .option("pathGlobFilter", "*.tab")
      .schema(schema)
      .csv(inputDir)

    val meta = Seq("source_file", "file_number", "state")
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val projected = Normalize.project(
            Ingest.withFileMeta(batch), passthrough = meta)
            .withColumn("City", Normalize.stripEstMarker(col("City")))
            .withColumn("Residence_Addresses_GeoHash",
              Geo.geohash8(col("Residence_Addresses_Latitude"),
                col("Residence_Addresses_Longitude")))
          val deduped = Dedup.firstWins(
            projected.withColumn("__seq", monotonically_increasing_id()),
            Seq("LALVOTERID"), Seq(col("file_number"), col("__seq")))
            .drop("__seq")
          // cross-batch dedup against everything already published
          val fresh =
            if (new java.io.File(outPath).exists()) {
              val existing = batch.sparkSession.read.parquet(outPath)
                .select(col("LALVOTERID")).localCheckpoint(true)
              Dedup.againstExisting(deduped, existing, "LALVOTERID")
            } else deduped
          // append, not partition-overwrite: a later batch's file for
          // an already-published state must add to it
          Publish.appendPartitioned(
            Normalize.widen(fresh, passthrough = meta), outPath)
        }
        ()
      }
      .start()
  }
}
