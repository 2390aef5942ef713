package graft

import graft.etl.{Ingest, LoadPipeline, Manifest, Quality}
import org.scalatest.funsuite.AnyFunSuite

class IngestUtilSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("S3: unzip extracts archive members to the staging dir") {
    val tmp = java.nio.file.Files.createTempDirectory("zips")
    val zipPath = tmp.resolve("05--WA--VM2Uniform--2024-01-15.zip").toString
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("05--WA--VM2Uniform--2024-01-15.tab"))
    zos.write("LALVOTERID\tCity\nLALWA0001\tSEATTLE\n".getBytes)
    zos.closeEntry(); zos.close()
    val out = tmp.resolve("staged").toString
    val extracted = Ingest.unzip(zipPath, out)
    assert(extracted.map(p => new java.io.File(p).getName) ===
      Seq("05--WA--VM2Uniform--2024-01-15.tab"))
    // extracted TSV is loadable by the strict reader
    val df = Ingest.readTsv(spark, extracted)
    assert(df.count() === 1)
    assert(Quality.lineCount(spark, extracted.head) === 1) // S8
  }

  test("P11/W1: stale same-state versions are split out, newest kept") {
    val names = Seq(
      "01--AK--VM2Uniform--2024-01-15.tab",
      "03--CA--VM2Uniform--2024-02-01.tab",
      "03--CA--VM2Uniform--2023-11-01.tab", // stale CA
      "10--WY--VM2Uniform--2024-01-15.tab")
    val (keep, stale) = Ingest.splitStaleVersions(names)
    assert(stale === Seq("03--CA--VM2Uniform--2023-11-01.tab"))
    assert(keep.toSet === names.toSet -- stale.toSet)
  }

  test("S12: alert messages for unreconciled states") {
    var m = Manifest.empty(spark)
    m = Manifest.register(m, "02--CA--VM2Uniform--2024-02-01.tab", "CA", 2000)
    val result = LoadPipeline.run(spark, TestSpark.resource("/voters"),
      manifest = Some(m))
    val msgs = Quality.alerts(
      Quality.loadReport(result.loaded, result.loaded, m, tolerance = 10))
    assert(msgs === Seq("Error: state CA loaded 3 rows, expected 2000"))
  }
}
