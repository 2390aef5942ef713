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
        ingestBatch(batch, schema, outPath)
        ()
      }
      .start()
  }

  /** One micro-batch: verify headers, parse strictly, run the shared
    * batch transform, dedup across batches, append-publish. The batch
    * lines are persisted for the duration — foreachBatch frames
    * re-read their source files on EVERY action, and this method runs
    * three (file list, header-collision check, publish). */
  private[graft] def ingestBatch(batch0: DataFrame, schema: StructType,
      outPath: String): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val batch = batch0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val files = batch.select(col("__file")).distinct()
        .collect().map(_.getString(0)).sorted
      if (files.isEmpty) return
      // enforceSchema=false analog, per file: the FIRST line must carry
      // exactly the expected (trimmed, F3) column names — counting
      // header-shaped lines anywhere in the file would let a headerless
      // file with one header-identical data row slip through.
      // ONE distributed pass for ALL files' header lines (ADVICE r2 —
      // the per-file `textFile(f).first()` serialized O(files)
      // sequential driver jobs into every micro-batch, and leaned on
      // partition-0 ordering): a file's first line is the first row of
      // the split that starts at byte 0, and splits preserve
      // intra-file line order within their partition, so keeping each
      // partition's first block-0 row per file yields exactly one
      // header per file in a single job.
      val headerRows = spark.read.text(files.toIndexedSeq: _*)
        .select(col("value"),
          col("_metadata.file_path").as("f"),
          col("_metadata.file_block_start").as("bs"))
        .where(col("bs") === 0L)
        .as[(String, String, Long)]
        .mapPartitions { it =>
          val seen = scala.collection.mutable.HashSet[String]()
          it.collect { case (value, f, _) if seen.add(f) => (f, value) }
        }
        .collect()
      // join back on the decoded path — input_file_name() and
      // _metadata.file_path may differ in URI encoding
      def uriPath(s: String): String =
        try new java.net.URI(s).getPath catch { case _: Exception => s }
      val byPath = headerRows.map { case (f, v) => uriPath(f) -> v }.toMap
      val rawHeaders = files.toSeq.flatMap(f =>
        byPath.get(uriPath(f)).map(f -> _))
      val expected = schema.fieldNames.toSeq
      // a file with no readable first line (empty) is refused like a
      // header mismatch — it cannot prove its schema
      val headerless = files.filterNot(f => byPath.contains(uriPath(f)))
      val bad = headerless ++ rawHeaders.collect {
        case (f, line) if !line.split('\t').map(_.trim).toSeq.equals(expected) => f
      }
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"header mismatch in data file(s): ${bad.mkString(", ")}")
      // the parse below drops each file's raw header line by equality;
      // a DATA row equal to it would be silently swallowed — refuse
      // the file instead (exactly one header-shaped line allowed)
      val hdrDf = broadcast(rawHeaders.toSeq.toDF("__file", "__hdr"))
      val collided = batch.join(hdrDf, Seq("__file"))
        .filter(col("value") === col("__hdr"))
        .groupBy(col("__file")).agg(count(lit(1)).as("n"))
        .filter(col("n") =!= 1)
        .select(col("__file")).collect().map(_.getString(0))
      if (collided.nonEmpty)
        throw new IllegalStateException(
          s"data row collides with header text in: ${collided.mkString(", ")}")

      val parsed = batch.join(hdrDf, Seq("__file"))
        .filter(col("value") =!= col("__hdr"))
        .withColumn("__p", from_csv(col("value"), schema,
          Map("sep" -> "\t", "mode" -> "FAILFAST", "nullValue" -> "")))
        .select((col("__file") +: schema.fieldNames.map(f => col(s"__p.$f"))).toIndexedSeq: _*)
      val withMeta = Ingest.withFileMetaFrom(parsed, col("__file")).drop("__file")

      val deduped = LoadPipeline.dedupeFirstWins(LoadPipeline.derive(withMeta))
      // cross-batch dedup against everything already published
      val fresh =
        if (Publish.pathExists(spark, outPath)) {
          val existing = spark.read.parquet(outPath)
            .select(col("LALVOTERID")).localCheckpoint(true)
          Dedup.againstExisting(deduped, existing, "LALVOTERID")
        } else deduped
      // append, not partition-overwrite: a later batch's file for an
      // already-published state must add to it
      Publish.appendPartitioned(
        Normalize.widen(fresh, passthrough = LoadPipeline.meta), outPath)
    } finally batch.unpersist()
  }
}
