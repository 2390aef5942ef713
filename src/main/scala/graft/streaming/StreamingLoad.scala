package graft.streaming

import graft.etl.{Dedup, Ingest, LoadPipeline, Normalize, Publish}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Continuous voter-file ingest: the batch `LoadPipeline` re-expressed
  * as a file-source stream — new `NN--ST--*.tab` files landing in the
  * watched directory are normalized, deduped, and published
  * incrementally via `foreachBatch`. The per-batch transform is
  * literally `LoadPipeline.derive`/`dedupeFirstWins` (shared
  * definitions — batch and streaming cannot drift), and the strict
  * contract matches the batch reader: FAILFAST + full-row parse, so a
  * ragged/partially-written file aborts the batch instead of
  * publishing padded rows. Producers must land files atomically
  * (write-to-tmp + rename), the standard file-source contract.
  *
  * Scale notes: exactly-once per file via the checkpoint; each
  * micro-batch is the same narrow pipeline as the batch load. The
  * cross-batch dedup scans the published table's key column each
  * trigger — O(sink) per batch; at large scale replace with a compact
  * key sidecar or stateful stream (documented trade-off), and run
  * `Publish.compact` periodically since append mode adds files every
  * batch.
  */
object StreamingLoad {

  /** Start ingesting `inputDir` into `outPath`. The returned query is
    * running; callers drive it (`processAllAvailable`) or let it run.
    * `header` must list the TSV's columns (streams can't peek at a
    * first file that may not exist yet); `enforceSchema=false` makes a
    * header/schema mismatch in a landed file FAIL the batch instead of
    * silently binding columns by position. */
  def start(spark: SparkSession, inputDir: String, outPath: String,
      checkpoint: String, header: Seq[String]) = {
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val raw = spark.readStream
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "")
      .option("mode", "FAILFAST")          // strict, like batch S6
      .option("columnPruning", "false")    // detect ragged rows always
      .option("enforceSchema", "false")    // verify file header names
      .option("pathGlobFilter", "*.tab")
      .option("maxFileAge", "36500d")      // never age out a backfill
      .schema(schema)
      .csv(inputDir)
      // P5: the reference skips DEMOGRAPHIC files (load.ts:94-96)
      .filter(Ingest.isDataFile(input_file_name()))

    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val deduped = LoadPipeline.dedupeFirstWins(
            LoadPipeline.derive(Ingest.withFileMeta(batch)))
          // cross-batch dedup against everything already published
          val fresh =
            if (Publish.pathExists(batch.sparkSession, outPath)) {
              val existing = batch.sparkSession.read.parquet(outPath)
                .select(col("LALVOTERID")).localCheckpoint(true)
              Dedup.againstExisting(deduped, existing, "LALVOTERID")
            } else deduped
          // append, not partition-overwrite: a later batch's file for
          // an already-published state must add to it
          Publish.appendPartitioned(
            Normalize.widen(fresh, passthrough = LoadPipeline.meta), outPath)
        }
        ()
      }
      .start()
  }
}
