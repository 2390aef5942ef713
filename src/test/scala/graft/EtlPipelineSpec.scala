package graft

import graft.etl._
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EtlPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val votersDir = TestSpark.resource("/voters")
  lazy val result = LoadPipeline.run(spark, votersDir)
  lazy val loaded = result.loaded.cache()

  test("S4/P5/O1: discovery skips DEMOGRAPHIC files, numeric order") {
    val files = LoadPipeline.listDataFiles(spark, votersDir).map(_.split("/").last)
    assert(files === Seq("01--AK--VM2Uniform--2024-01-15.tab",
      "02--CA--VM2Uniform--2024-02-01.tab"))
  }

  test("A3: first-wins PK dedup across batches AND files") {
    assert(loaded.count() === 7) // 9 rows, LALAK0001 ×3 → 7 distinct
    val anna = loaded.filter($"LALVOTERID" === "LALAK0001").collect()
    assert(anna.length === 1)
    // first file, first occurrence wins — not the in-file dup (ANNA-DUP)
    // nor the cross-file one (ANNA-CROSSFILE)
    assert(anna.head.getAs[String]("Voters_FirstName") === "ANNA")
  }

  test("P3/P4: coercions applied schema-driven") {
    val bob = loaded.filter($"LALVOTERID" === "LALAK0002").head()
    assert(bob.isNullAt(bob.fieldIndex("VoterTelephones_CellConfidenceCode"))) // "abc"
    assert(bob.isNullAt(bob.fieldIndex("Voters_CalculatedRegDate"))) // 02/30/2011
    val anna = loaded.filter($"LALVOTERID" === "LALAK0001").head()
    assert(anna.getAs[Int]("VoterTelephones_CellConfidenceCode") === 3)
    assert(anna.getAs[java.sql.Date]("Voters_CalculatedRegDate").toString === "2010-01-15")
    // Voters_Age stays TEXT even when numeric-looking (schema fidelity)
    assert(anna.getAs[String]("Voters_Age") === "34")
  }

  test("P2: all-empty optional fields become NULL") {
    val cara = loaded.filter($"LALVOTERID" === "LALAK0003").head()
    assert(cara.isNullAt(cara.fieldIndex("Voters_Gender")))
    assert(cara.isNullAt(cara.fieldIndex("Voters_Age")))
  }

  test("F5: city marker stripped (first occurrence only)") {
    val cities = loaded.select($"LALVOTERID", $"City").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cities("LALAK0002") === "JUNEAU")
    assert(cities("LALAK0003") === "FAIRBANKS x (EST.)")
    assert(cities("LALAK0001") === "ANCHORAGE")
  }

  test("F6: geohash derived only when both coordinates present") {
    val gh = loaded.select($"LALVOTERID", $"Residence_Addresses_GeoHash")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gh("LALAK0002") === "u4pruydq") // known vector
    assert(gh("LALCA0001") === "ww8p1r4t")
    assert(gh("LALAK0004") === null) // lon missing
    assert(gh("LALAK0003") === null) // both missing
  }

  test("P1: extraneous TSV column dropped") {
    assert(!loaded.columns.contains("ExtraneousColumn"))
  }

  test("S6 strict: ragged row fails the scan (reference strict:true)") {
    val e = intercept[SparkException] {
      LoadPipeline.run(spark, TestSpark.resource("/ragged")).loaded.count()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("D2: partitioned publish + per-state dynamic overwrite") {
    val out = java.nio.file.Files.createTempDirectory("publish").toString
    Publish.publishPartitioned(loaded, out)
    val states = new java.io.File(out).list().filter(_.startsWith("state="))
    assert(states.toSet === Set("state=AK", "state=CA"))
    // re-publish only CA rows: AK partition must survive (dynamic mode)
    Publish.publishPartitioned(loaded.filter($"state" === "CA"), out)
    val back = spark.read.parquet(out)
    assert(back.filter($"state" === "AK").count() === 4)
    assert(back.count() === 7)
  }

  test("D4-analog: partition pruning on the published state column") {
    val out = java.nio.file.Files.createTempDirectory("prune").toString
    Publish.publishPartitioned(loaded, out)
    val plan = spark.read.parquet(out).filter($"state" === "AK")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(state"), plan.take(600))
    // pruned scan reads only the AK partition
    assert(spark.read.parquet(out).filter($"state" === "AK").count() === 4)
  }

  test("A1/A4: reconciliation report with tolerance") {
    var m = Manifest.empty(spark)
    m = Manifest.register(m, "01--AK--VM2Uniform--2024-01-15.tab", "AK", 5)
    m = Manifest.register(m, "02--CA--VM2Uniform--2024-02-01.tab", "CA", 2000)
    val report = Quality.loadReport(result.loaded.filter(lit(false)).unionByName(result.loaded), // raw stand-in
      loaded, m, tolerance = 10)
    val rows = report.collect().map(r => r.getAs[String]("state") ->
      (r.getAs[Long]("rows_loaded"), r.getAs[Boolean]("reconciled"))).toMap
    assert(rows("AK")._2) // 4 loaded vs 5 expected, within 10
    assert(!rows("CA")._2) // 3 loaded vs 2000 expected → alert
  }

  test("P6: manifest anti-join skips loaded files") {
    var m = Manifest.empty(spark)
    m = Manifest.register(m, "f1.tab", "AK", 10)
    m = Manifest.markLoaded(m, "f1.tab")
    m = Manifest.register(m, "f2.tab", "CA", 10)
    val files = Seq("f1.tab", "f2.tab", "f3.tab").toDF("name")
    val todo = Manifest.pending(files, m).collect().map(_.getString(0)).toSet
    assert(todo === Set("f2.tab", "f3.tab"))
  }

  test("etl_load_report: synthesized flagship run — first-wins keeps originals, AK alerts") {
    val sf = "/root/testdata/sf0.001"
    val report = etl.SynthVoters.loadReport(spark, sf).cache()
    try {
      // exactly the deliberately-inflated state fails reconciliation,
      // and its alert message follows the reference contract
      val alerts = Quality.alerts(report)
      assert(alerts.length === 1 && alerts.head.startsWith("Error: state AK"))
      // first-wins kept the ORIGINAL row (not the "-DUP" twin) for a
      // known duplicated key: custkey 7 belongs to whatever state
      // nationkey%5 mapped it to, so check via the loaded frame
      val loaded = LoadPipeline.run(spark, etl.SynthVoters.dir(spark, sf)).loaded
      val dupNames = loaded.filter(col("LALVOTERID").rlike("0000007$"))
        .select(col("Voters_FirstName")).collect().map(_.getString(0))
      assert(dupNames.nonEmpty && dupNames.forall(!_.endsWith("-DUP")))
    } finally report.unpersist()
  }

  test("idempotence: dedup(dedup(x)) == dedup(x)") {
    val again = Dedup.firstWins(loaded.withColumn("__seq", lit(0L)),
      Seq("LALVOTERID"), Seq(col("__seq"))).drop("__seq")
    assert(again.count() === loaded.count())
  }
}
