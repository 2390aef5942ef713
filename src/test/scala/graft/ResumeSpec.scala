package graft

import graft.etl.{Ingest, LoadPipeline, Resume}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P9: distributed per-file line numbering + mid-file row-offset
  * resume (load.ts:172-180). The multi-split test shrinks
  * `spark.sql.files.maxPartitionBytes` so one file spans MANY splits
  * and one partition packs many splits — the regimes where a naive
  * "partition 0 = file start" shortcut breaks. */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withTinySplits[A](f: => A): A = {
    val conf = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "2048") // ~2 KB splits
    try f finally spark.conf.set(conf, prev)
  }

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("resume")
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("numberedLines: exact numbering across many splits per file") {
    val lines = (1 to 3000).map(i => f"row-$i%05d-${"x" * 20}")
    val path = writeLines("big.txt", lines)
    val got = withTinySplits {
      Resume.numberedLines(spark, Seq(path))
        .select(col("line_no"), col("value")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(got.size === 3000)
    lines.zipWithIndex.foreach { case (l, i) =>
      assert(got(i + 1L) === l, s"line ${i + 1} misnumbered")
    }
  }

  test("numberedLines: many small files packed into shared partitions") {
    val paths = (1 to 6).map { f =>
      writeLines(s"small$f.txt", (1 to 50).map(i => s"f$f-line$i"))
    }
    val got = Resume.numberedLines(spark, paths)
      .select(col("file_path"), col("line_no"), col("value")).collect()
    assert(got.length === 300)
    got.foreach { r =>
      val expected = s"f${r.getString(0).replaceAll(".*small|\\.txt", "")}" +
        s"-line${r.getLong(1)}"
      assert(r.getString(2) === expected)
    }
  }

  test("resumeTsv: skips exactly N data rows, parses like the full reader") {
    val votersDir = TestSpark.resource("/voters")
    val file = LoadPipeline.listDataFiles(spark, votersDir).head
    val full = Ingest.readTsv(spark, Seq(file)).collect()
    val resumed = Resume.resumeTsv(spark, file, skipRows = 2)
    assert(resumed.columns.toSeq === Ingest.headerOf(spark, file).toSeq)
    val tail = resumed.collect()
    assert(tail.length === full.length - 2)
    // same rows, same values, same null normalization (empty → NULL)
    val key = full.head.schema.fieldNames.head // LALVOTERID
    assert(tail.map(_.toSeq).toSet === full.drop(2).map(_.toSeq).toSet)
    assert(tail.map(_.getAs[String](key)).toSet ===
      full.drop(2).map(_.getAs[String](key)).toSet)
  }

  test("resumeTsv: skipRows = 0 equals the full reader; ragged row fails") {
    val votersDir = TestSpark.resource("/voters")
    val file = LoadPipeline.listDataFiles(spark, votersDir).head
    val full = Ingest.readTsv(spark, Seq(file)).collect().map(_.toSeq).toSet
    val all = Resume.resumeTsv(spark, file, skipRows = 0).collect()
      .map(_.toSeq).toSet
    assert(all === full)
    val ragged = LoadPipeline.listDataFiles(spark,
      TestSpark.resource("/ragged")).head
    val e = intercept[org.apache.spark.SparkException] {
      Resume.resumeTsv(spark, ragged, skipRows = 0).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("resume composes with the load derive: tail rows geohash like full") {
    val votersDir = TestSpark.resource("/voters")
    val file = LoadPipeline.listDataFiles(spark, votersDir).head
    val derived = LoadPipeline.derive(
      Ingest.withFileMetaFrom(Resume.resumeTsv(spark, file, skipRows = 0),
        lit(file)))
    val gh = derived.select(col("LALVOTERID"), col("Residence_Addresses_GeoHash"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gh("LALAK0002") === "u4pruydq")
  }
}
