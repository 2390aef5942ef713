package graft

import graft.etl._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the round-7 fresh-eyes review of the etl/
  * plans/ functions/ streaming/ modules — each test encodes a finding
  * that was FIXED, so the failure mode cannot quietly return.
  */
class ReviewRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tempDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  test("an unreconciled state's partition keeps its OLD published data") {
    val in = tempDir("graft-rr-in")
    val out = tempDir("graft-rr-out").resolve("pub").toString
    val man = tempDir("graft-rr-man").resolve("manifest").toString
    val src = new java.io.File(TestSpark.resource("/voters"))
    src.listFiles().filter(_.getName.endsWith(".tab")).foreach { f =>
      java.nio.file.Files.copy(f.toPath, in.resolve(f.getName))
    }
    // first load: everything reconciles, both states publish
    val first = LoadPipeline.runCatalog(spark, in.toString, man, out,
      alertSink = new AlertSink.Collecting)
    assert(first.nonEmpty)
    val akBefore = spark.read.parquet(out).filter(col("state") === "AK")
      .select(col("LALVOTERID")).collect().map(_.getString(0)).sorted
    assert(akBefore.nonEmpty)
    // second load: a NEW AK file arrives but reconciliation is forced
    // to fail (tolerance = -1 makes rows_loaded >= expected + 1
    // impossible). The fix under test: the publish must SKIP the bad
    // state, keeping the old partition — previously the bad data was
    // published first and only markLoaded was skipped.
    val ak1 = src.listFiles().find(_.getName.startsWith("01--AK")).get
    java.nio.file.Files.copy(ak1.toPath,
      in.resolve("03--AK--VM2Uniform--2024-03-01.tab"))
    val second = LoadPipeline.runCatalog(spark, in.toString, man, out,
      tolerance = -1L, alertSink = new AlertSink.Collecting)
    assert(second == Seq("03--AK--VM2Uniform--2024-03-01.tab"))
    val akAfter = spark.read.parquet(out).filter(col("state") === "AK")
      .select(col("LALVOTERID")).collect().map(_.getString(0)).sorted
    assert(akAfter.toSeq == akBefore.toSeq,
      "unreconciled AK partition was replaced")
    // and the file is NOT marked loaded, so a later (fixed) run retries
    val m = Manifest.load(spark, man)
    val row = m.filter(col("Filename") === "03--AK--VM2Uniform--2024-03-01.tab")
      .select(col("Loaded")).head()
    assert(!row.getBoolean(0))
  }

  test("readTsv refuses a batch whose files disagree on header order") {
    val dir = tempDir("graft-rr-hdr")
    java.nio.file.Files.writeString(dir.resolve("a.tab"),
      "id\tname\tcity\n1\tann\tjuneau\n")
    java.nio.file.Files.writeString(dir.resolve("b.tab"),
      "id\tcity\tname\n2\tnome\tbob\n")
    val e = intercept[IllegalArgumentException] {
      Ingest.readTsv(spark,
        Seq(dir.resolve("a.tab").toString, dir.resolve("b.tab").toString))
    }
    assert(e.getMessage.contains("refusing positional bind"))
    // same header in the same order is fine
    java.nio.file.Files.writeString(dir.resolve("c.tab"),
      "id\tname\tcity\n3\tcara\tsitka\n")
    val ok = Ingest.readTsv(spark,
      Seq(dir.resolve("a.tab").toString, dir.resolve("c.tab").toString))
    assert(ok.count() == 2)
  }

  test("lineCounts keys survive URI-encoded filenames (space in name)") {
    val dir = tempDir("graft-rr-lines")
    val name = "03--WY--VM2 final.tab"
    java.nio.file.Files.writeString(dir.resolve(name),
      "id\tname\n1\ta\n2\tb\n")
    val counts = Quality.lineCounts(spark, Seq(dir.resolve(name).toString))
    assert(counts.get(name).contains(2L),
      s"expected raw-name key, got keys: ${counts.keys.mkString(", ")}")
  }

  test("reconciliation flags over-loads, not just under-loads") {
    val report = Quality.loadReport(
      raw = Seq(("AK", "k1"), ("AK", "k2"), ("AK", "k3"))
        .toDF("state", "LALVOTERID")
        .withColumn("source_file", lit("01--AK--x.tab")),
      deduped = Seq(("AK", "k1"), ("AK", "k2"), ("AK", "k3"))
        .toDF("state", "LALVOTERID"),
      manifest = Seq(("01--AK--x.tab", "AK", 1, false))
        .toDF("Filename", "State", "Lines", "Loaded"),
      tolerance = 1L)
    val r = report.head()
    assert(!r.getAs[Boolean]("reconciled"),
      "3 rows loaded against 1 expected (tolerance 1) must NOT reconcile")
  }

  test("TopKAggregator rejects NaN scores instead of seating them") {
    val agg = new graft.functions.TopKAggregator(2)
    val in = Seq(
      graft.functions.Scored(1.0, 10L),
      graft.functions.Scored(Double.NaN, 11L),
      graft.functions.Scored(2.0, 12L),
      graft.functions.Scored(Double.NaN, 13L))
    val out = in.foldLeft(agg.zero)(agg.reduce)
    assert(out.map(_.id) == List(12L, 10L))
    assert(out.forall(s => !s.score.isNaN))
  }

  test("graft_minhash of an empty array is NULL, not a shared signature") {
    val r = spark.sql(
      "SELECT graft_minhash(array_remove(array('x'), 'x'), 8) AS sig")
      .head()
    assert(r.isNullAt(0))
  }

  test("graft_srp_bands null-poisons on a null element") {
    val r = spark.sql(
      """SELECT graft_srp_bands(array(1.0D, CAST(NULL AS DOUBLE), 2.0D),
        |  8, 4, 42L) AS bands""".stripMargin).head()
    assert(r.isNullAt(0))
  }

  // --- round-9 review pins ------------------------------------------

  test("dhash refuses a raster with more than 64 bit pairs") {
    // (10−1)·8 = 72 pairs: bit k would wrap mod 64 under Scala's
    // shift while the oracle's shift yields 0 — must fail loudly
    val img = new java.awt.image.BufferedImage(10, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val e = intercept[IllegalArgumentException] {
      graft.functions.ImageCodec.dhashBoxed(bos.toByteArray)
    }
    assert(e.getMessage.contains("resize to 9x8"))
    // and the largest LEGAL raster still hashes: 9×8 = exactly 64 pairs
    val ok = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ok, "png", bos2)
    assert(graft.functions.ImageCodec.dhashBoxed(bos2.toByteArray) != null)
  }

  test("pcaFit fails loudly when stage-1 long arithmetic could overflow") {
    // absurd quantScale pushes dim·2n·maxQ·quantScale past
    // Long.MaxValue: the trainer must refuse rather than train a
    // silently wrong component the spliced oracle would still replay
    val e = intercept[IllegalArgumentException] {
      ops.SimilarityOps.pcaFit(
        Tables.embeddings(spark, "/root/testdata/sf0.001"),
        iters = 1, quantScale = 1000000000000L)
    }
    assert(e.getMessage.contains("DECIMAL"))
  }

  test("streaming LSH overflow arrivals are counted, not silent") {
    // maxBucket=1: the second doc into any shared band bucket hits a
    // full bucket — the batch-equivalence contract is broken and the
    // side metric must say so (the batch pass's observed-metric twin)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .localCheckpoint(true)
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    streaming.StreamingDedup.nearDupPairsOver(spark, stream, docs,
      "test_neardup_overflow", maxBucket = 1).collect()
    assert(streaming.StreamingDedup.lastOverflowArrivals > 0L,
      "full-bucket arrivals must register on the overflow metric")
    // and a non-overflowing run resets the alarm to zero
    val stream2 = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    streaming.StreamingDedup.nearDupPairsOver(spark, stream2, docs,
      "test_neardup_no_overflow").collect()
    assert(streaming.StreamingDedup.lastOverflowArrivals === 0L)
  }

  test("registerAll equals the per-file register fold") {
    val files = Seq(("01--AK--x.tab", "AK", 10), ("02--CA--y.tab", "CA", 20),
      ("03--NY--z.tab", "NY", 30))
    val batch = Manifest.registerAll(Manifest.empty(spark), files)
      .select(col("Filename"), col("State"), col("Lines"), col("Loaded"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getBoolean(3))).toSet
    val folded = files.foldLeft(Manifest.empty(spark)) {
      case (m, (f, s, l)) => Manifest.register(m, f, s, l)
    }.select(col("Filename"), col("State"), col("Lines"), col("Loaded"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getBoolean(3))).toSet
    assert(batch == folded && batch.size == 3)
  }
}
