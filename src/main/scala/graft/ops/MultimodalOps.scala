package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star spec): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batch. The container has no image/audio codecs, so the decode step
  * is a clearly-marked deterministic STUB (`FakeDecoder`) — the
  * Spark-side plumbing (binary columns, typed output schema,
  * partition-parallel batch decode via `mapPartitions`, no
  * driver-side collection) is real and is what the tests exercise.
  *
  * Scale notes: decode is a narrow map — no shuffle; at 100 TB the
  * only knobs are input split size and executor memory for batch
  * buffers. Feature aggregation afterwards is one partial-agg shuffle.
  */
object MultimodalOps {

  /** Deterministic stand-in for a media decoder. A real deployment
    * swaps `decode` for an actual codec call (??? in spirit); shape
    * and determinism make the plumbing testable without codecs. */
  object FakeDecoder {
    case class Media(blob_len: Long, width: Int, height: Int, n_frames: Int)
    def decode(blob: Array[Byte]): Media = {
      val n = blob.length.toLong
      Media(n, (n % 640).toInt, (n * 7 % 480).toInt, (n % 30 + 1).toInt)
    }
  }

  /** Documents re-imaged as a media table: text bytes as the blob. */
  private def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), col("source"),
        encode(col("text"), "utf-8").as("blob"))

  /** Stub-decoder geometry as shared column expressions — ONE
    * definition of the width/height formulas for `decodeFeatures`,
    * `resizePlan`, and the tests (the Scala twin is
    * [[FakeDecoder.decode]]; keep the arithmetic in sync). */
  def decodedWidth(blobLen: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (blobLen % 640).cast("int")
  def decodedHeight(blobLen: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (blobLen * 7 % 480).cast("int")

  /** Blob statistics per source — binary columns flowing through
    * scan → project → aggregate with exact byte lengths. */
  def blobStats(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(length(col("blob")).cast("long")).as("total_bytes"),
        min(length(col("blob"))).as("min_bytes"),
        max(length(col("blob"))).as("max_bytes"))
      .orderBy(col("source"))

  /** Stub decode + feature extraction, all in builtin expressions so
    * the DuckDB oracle can replicate the arithmetic: the "decoder"
    * derives metadata from blob length exactly like FakeDecoder. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .withColumn("blob_len", length(col("blob")).cast("long"))
      .select(col("media_id"), col("blob_len"),
        decodedWidth(col("blob_len")).as("width"),
        decodedHeight(col("blob_len")).as("height"),
        (col("blob_len") % 30 + 1).cast("int").as("n_frames"))
      .orderBy(col("media_id"))

  /** The mapPartitions decode path (the shape a real codec uses):
    * batch iterator over binary rows → typed Media rows. Rows-only
    * query; equivalence with `decodeFeatures` is unit-tested. */
  def decodeMapPartitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val m = FakeDecoder.decode(blob)
        (id, m.blob_len, m.width, m.height, m.n_frames)
      })
      .toDF("media_id", "blob_len", "width", "height", "n_frames")
      .orderBy(col("media_id"))
  }

  /** Chunk-level blob dedup — the content-addressable-storage scan a
    * media lake runs: split each blob into fixed 64-byte chunks, hash
    * each chunk, report per-source total vs distinct chunk counts and
    * the implied storage dedup ratio. Chunks travel as md5 hashes;
    * the only wide op is the distinct-count aggregate on the hash.
    * Chunking is done on the hex encoding (2 chars/byte) because that
    * is the widest portable substring surface — the arithmetic is
    * byte-identical to slicing the blob. */
  def chunkDedup(s: SparkSession, d: String): DataFrame =
    chunkDedupOn(mediaTable(s, d))

  /** Core of [[chunkDedup]] over any (source, blob) frame. */
  def chunkDedupOn(media: DataFrame): DataFrame =
    media
      .withColumn("hb", hex(col("blob")))
      .withColumn("n", ceil(length(col("blob")).cast("double") / 64.0)
        .cast("long"))
      // empty blob → no chunks; Spark's sequence(0, -1) would REVERSE
      // (emit [0, -1]) instead of returning empty, unlike the
      // oracle's range(0, 0)
      .withColumn("i", explode(when(col("n") > 0L,
        sequence(lit(0L), col("n") - 1))
        .otherwise(array().cast("array<long>"))))
      .withColumn("h",
        md5(col("hb").substr(col("i") * 128L + 1L, lit(128L))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct_chunks"))
      .withColumn("dedup_ratio", lit(1.0) -
        col("n_distinct_chunks").cast("double") /
          col("n_chunks").cast("double"))
      .orderBy(col("source"))

  /** Resize planning: aspect-preserving fit of each media item into a
    * 224×224 target box — the geometry a real resize kernel runs per
    * image; the pixel op itself lives behind the stub decoder, but
    * the scale/output-dimension arithmetic (and its zero-dimension
    * guard) is the engine's contract with it. Reported width/height
    * are the RAW decoded dims (identical to `mm_decode_features` for
    * the same media_id — the clamp applies only to the scale
    * denominator and the output box, so a degenerate 0-dim item still
    * reads consistently across the catalog). Narrow projection, no
    * UDF; dims are int-derived doubles with one `least`/`floor` per
    * row so the oracle replicates bit-for-bit. */
  def resizePlan(s: SparkSession, d: String): DataFrame = {
    val target = 224.0
    mediaTable(s, d)
      .withColumn("blob_len", length(col("blob")).cast("long"))
      .withColumn("width", decodedWidth(col("blob_len")).cast("long"))
      .withColumn("height", decodedHeight(col("blob_len")).cast("long"))
      .withColumn("scale",
        least(lit(target) / greatest(col("width"), lit(1L)).cast("double"),
          lit(target) / greatest(col("height"), lit(1L)).cast("double")))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width").cast("double") * col("scale"))
          .cast("long"), lit(1L)).as("out_w"),
        greatest(floor(col("height").cast("double") * col("scale"))
          .cast("long"), lit(1L)).as("out_h"),
        round(col("scale"), 6).as("scale"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_blob_stats" -> blobStats,
    "mm_chunk_dedup" -> chunkDedup,
    "mm_resize" -> resizePlan,
    "mm_decode_features" -> decodeFeatures,
    "mm_decode_mappartitions" -> decodeMapPartitions,
  )

  val oracles: Map[String, String] = Map(
    "mm_blob_stats" ->
      """SELECT source, COUNT(*) AS n_blobs,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(MIN(octet_length(encode(text))) AS INT) AS min_bytes,
        |  CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "mm_chunk_dedup" ->
      """WITH chunks AS (
        |  SELECT source, md5(substring(hb, CAST(i*128+1 AS BIGINT), 128))
        |    AS h
        |  FROM (
        |    SELECT source, hex(encode(text)) AS hb,
        |      unnest(range(0, CAST(ceil(octet_length(encode(text))/64.0)
        |        AS BIGINT))) AS i
        |    FROM documents))
        |SELECT source, COUNT(*) AS n_chunks,
        |  COUNT(DISTINCT h) AS n_distinct_chunks,
        |  1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS dedup_ratio
        |FROM chunks GROUP BY source ORDER BY source""".stripMargin,
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |    CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height
        |  FROM documents),
        |sc AS (
        |  SELECT media_id, width, height,
        |    LEAST(224.0 / CAST(GREATEST(width, 1) AS DOUBLE),
        |          224.0 / CAST(GREATEST(height, 1) AS DOUBLE)) AS scale
        |  FROM m)
        |SELECT media_id, width, height,
        |  GREATEST(CAST(floor(CAST(width AS DOUBLE) * scale) AS BIGINT),
        |    1) AS out_w,
        |  GREATEST(CAST(floor(CAST(height AS DOUBLE) * scale) AS BIGINT),
        |    1) AS out_h,
        |  round(scale, 6) AS scale
        |FROM sc ORDER BY media_id""".stripMargin,
    "mm_decode_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS blob_len,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
    // the typed mapPartitions twin computes the SAME decode contract,
    // so it answers to the same oracle — and a divergence between the
    // JVM codec path and the expression path now fails the hash gate,
    // not just the in-repo differential test
    "mm_decode_mappartitions" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS blob_len,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
