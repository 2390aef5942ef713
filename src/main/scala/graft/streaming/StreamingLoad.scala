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
  * contract matches the batch reader: FAILFAST whole-row parse, so a
  * ragged/partially-written file aborts the batch instead of
  * publishing padded rows. Producers must land files atomically
  * (write-to-tmp + rename), the standard file-source contract.
  *
  * The source is the TEXT reader, not the CSV reader. The csv file
  * source binds EVERY matched file to the voter schema BEFORE any row
  * filter can run, so a landed DEMOGRAPHIC file (different header, as
  * in the reference) would fail the batch at parse time — and, being
  * checkpointed, refail on every restart, permanently wedging the
  * stream. Text lines always read; DEMOGRAPHIC files are dropped by
  * NAME before any schema is applied (exactly the reference's
  * pre-parse skip, load.ts:94-96), data files are header-verified per
  * file, and rows then parse through `from_csv` with the batch S6
  * strictness (FAILFAST ⇒ ragged row aborts the batch).
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
    * first file that may not exist yet); each data file's actual
    * header line is verified against it per batch — the streaming
    * analog of the batch reader's `enforceSchema=false`. */
  def start(spark: SparkSession, inputDir: String, outPath: String,
      checkpoint: String, header: Seq[String]) = {
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val headerLine = header.mkString("\t")
    val lines = spark.readStream
      .option("pathGlobFilter", "*.tab")
      .option("maxFileAge", "36500d") // never age out a backfill
      .text(inputDir)
      .select(col("value"), input_file_name().as("__file"))
      // P5: drop DEMOGRAPHIC files BEFORE any parsing can fail on them
      .filter(Ingest.isDataFile(col("__file")))

    lines.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, schema, headerLine, outPath)
        ()
      }
      .start()
  }

  /** One micro-batch: verify headers, parse strictly, run the shared
    * batch transform, dedup across batches, append-publish. */
  private[streaming] def ingestBatch(batch: DataFrame, schema: StructType,
      headerLine: String, outPath: String): Unit = {
    if (batch.isEmpty) return
    // enforceSchema=false analog: every file must contain exactly one
    // line equal to the expected header (its first). 0 ⇒ wrong header
    // (column names/order mismatch would silently misassign columns);
    // >1 ⇒ a data row collides with the header text — refuse both.
    val badFiles = batch
      .groupBy(col("__file"))
      .agg(sum(when(col("value") === headerLine, 1).otherwise(0)).as("n_header"))
      .filter(col("n_header") =!= 1)
      .select(col("__file")).collect().map(_.getString(0))
    if (badFiles.nonEmpty)
      throw new IllegalStateException(
        s"header mismatch in data file(s): ${badFiles.mkString(", ")}")

    val parsed = batch
      .filter(col("value") =!= headerLine)
      .withColumn("__p", from_csv(col("value"), schema,
        Map("sep" -> "\t", "mode" -> "FAILFAST", "nullValue" -> "")))
      .select(col("__file") +: schema.fieldNames.map(f => col(s"__p.$f")): _*)
    val withMeta = Ingest.withFileMetaFrom(parsed, col("__file")).drop("__file")

    val deduped = LoadPipeline.dedupeFirstWins(LoadPipeline.derive(withMeta))
    // cross-batch dedup against everything already published
    val fresh =
      if (Publish.pathExists(batch.sparkSession, outPath)) {
        val existing = batch.sparkSession.read.parquet(outPath)
          .select(col("LALVOTERID")).localCheckpoint(true)
        Dedup.againstExisting(deduped, existing, "LALVOTERID")
      } else deduped
    // append, not partition-overwrite: a later batch's file for an
    // already-published state must add to it
    Publish.appendPartitioned(
      Normalize.widen(fresh, passthrough = LoadPipeline.meta), outPath)
  }
}
