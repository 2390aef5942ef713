package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count reconciliation (SURVEY.md §2.4 A1/A2/A4) — the reference's
  * only "golden output": after a load, `count(*)` must be within
  * `tolerance` (1000, load.ts:240) of the manifest's expected line
  * count, else alert. Here it is a per-state report DataFrame joining
  * loaded counts against expectations.
  */
object Quality {

  val defaultTolerance = 1000L

  /** Per-state load report: rows in, rows after dedup, dups dropped,
    * expected lines (from the manifest, summed per state), reconciled
    * flag. `raw` must carry `state`; `deduped` is `raw` after PK
    * dedup. */
  def loadReport(raw: DataFrame, deduped: DataFrame, manifest: DataFrame,
      tolerance: Long = defaultTolerance): DataFrame = {
    val in = raw.groupBy(col("state")).agg(count(lit(1)).as("rows_in"))
    val out = deduped.groupBy(col("state")).agg(count(lit(1)).as("rows_loaded"))
    val expected = manifest.groupBy(col("State").as("state"))
      .agg(sum(col("Lines")).cast("long").as("expected_lines"))
    in.join(out, Seq("state"), "left")
      .join(expected, Seq("state"), "left")
      .withColumn("rows_loaded", coalesce(col("rows_loaded"), lit(0L)))
      .withColumn("dups_dropped", col("rows_in") - col("rows_loaded"))
      .withColumn("reconciled",
        col("expected_lines").isNull ||
          col("rows_loaded") >= col("expected_lines") - tolerance)
      .orderBy(col("state"))
  }

  /** S8 analog: raw line count of a text file (minus header). */
  def lineCount(spark: SparkSession, path: String): Long =
    spark.read.text(path).count() - 1

  /** Per-file line counts (minus headers) in ONE distributed job —
    * N sequential `lineCount` calls re-scan the input N times and pay
    * N job round-trips. */
  def lineCounts(spark: SparkSession, paths: Seq[String]): Map[String, Long] = {
    import org.apache.spark.sql.functions.{count => cnt, _}
    spark.read.text(paths: _*)
      .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
      .agg((cnt(lit(1)) - 1).as("lines"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** S12 analog: the alert messages the reference posts to Slack on a
    * failed reconciliation (utils.ts:99-133, load.ts:244-254). The
    * transport is an ops concern; the message contract is engine
    * logic and is what gets tested. */
  def alerts(report: DataFrame): Seq[String] =
    report.filter(!col("reconciled"))
      .orderBy(col("state"))
      .collect()
      .map { r =>
        val st = r.getAs[String]("state")
        val loaded = r.getAs[Long]("rows_loaded")
        val expected = r.getAs[Long]("expected_lines")
        s"Error: state $st loaded $loaded rows, expected $expected"
      }.toSeq
}
