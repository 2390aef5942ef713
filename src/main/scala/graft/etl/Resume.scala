package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** P9: true mid-file row-offset resume (load.ts:172-180 — on restart
  * the reference skips the rows of a file it already inserted and
  * streams from row N). Rounds 1-2 substituted idempotent re-run +
  * keyset pagination; this closes the gap with the real thing, done
  * Spark-first: the primitive is DISTRIBUTED per-file line numbering,
  * after which "resume from row N" is an ordinary sargable filter.
  *
  * A naive global `row_number()` window would shuffle the whole corpus
  * through one task per file. Instead line numbers are assembled from
  * split-local order in two passes, shuffling only split-count-sized
  * metadata — the same two-phase shape as [[graft.ops.PrefixSum]]:
  *
  *  1. count lines per (file, split): `_metadata.file_block_start`
  *     identifies each row's split, and the text format assigns every
  *     line to exactly one split (a line straddling a split boundary
  *     belongs to the split containing its first byte);
  *  2. exclusive prefix-sum those counts per file in block-start
  *     order (driver-side — the frame is #splits rows) and broadcast;
  *  3. a narrow `mapPartitions` adds each row's within-split ordinal
  *     to its split's offset. Rows of one split are contiguous and
  *     in file order inside their partition (a partition reads its
  *     assigned splits sequentially), so a per-key counter suffices.
  *
  * No assumption that one file = one split/partition — numbering is
  * exact for files spanning many splits and for partitions packing
  * many small files (both asserted in ResumeSpec with a shrunken
  * `spark.sql.files.maxPartitionBytes`).
  */
object Resume {

  /** Every line of `paths` with its 1-based per-file line number:
    * (file_path, line_no, value). */
  def numberedLines(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val raw = spark.read.text(paths: _*)
      .select(col("value"),
        col("_metadata.file_path").as("f"),
        col("_metadata.file_block_start").as("bs"))
    // pass 1: split-count-sized aggregate — the ONLY shuffle, of
    // (file, split, n) rows, never line data
    val counts = raw.groupBy(col("f"), col("bs"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // pass 2: exclusive prefix per file over block-start order
    val offsets: Map[(String, Long), Long] = counts
      .groupBy(_._1)
      .flatMap { case (f, splits) =>
        val sorted = splits.sortBy(_._2)
        sorted.map(_._2).zip(
          sorted.map(_._3).scanLeft(0L)(_ + _)).map {
          case (bs, off) => (f, bs) -> off
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 3: narrow — within-split ordinal + broadcast offset
    raw.as[(String, String, Long)]
      .mapPartitions { it =>
        var key: (String, Long) = null
        var ordinal = 0L
        it.map { case (value, f, bs) =>
          val k = (f, bs)
          if (k != key) { key = k; ordinal = 0L }
          ordinal += 1L
          (f, bc.value(k) + ordinal, value)
        }
      }
      .toDF("file_path", "line_no", "value")
  }

  /** Resume a strict TSV load from a row offset: parse only the data
    * rows AFTER the first `skipRows` (header excluded), with the same
    * semantics as the full reader ([[Ingest.readTsv]]): all-string
    * columns named by the file's trimmed header, empty → NULL,
    * FAILFAST on ragged rows (`from_csv` PERMISSIVE would silently
    * null-pad — the reference aborts, load.ts:152-165). The skip is a
    * sargable `line_no` filter over [[numberedLines]] — no driver
    * iteration, no per-row state. */
  def resumeTsv(spark: SparkSession, path: String, skipRows: Long): DataFrame = {
    val names = Ingest.headerOf(spark, path)
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val opts = Map("sep" -> "\t", "nullValue" -> "", "mode" -> "FAILFAST")
    numberedLines(spark, Seq(path))
      .filter(col("line_no") > skipRows + 1L) // +1: the header line
      .withColumn("r", from_csv(col("value"), schema, opts))
      .select(col("r.*"))
  }
}
