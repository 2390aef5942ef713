package graft

import graft.etl.{Dedup, LoadPipeline, Manifest}
import graft.functions.{Scored, TopKAggregator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CatalogLoadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("catalog-driven load is idempotent across runs (P6/S10/S11)") {
    val tmp = java.nio.file.Files.createTempDirectory("catalog")
    val mPath = tmp.resolve("manifest.parquet").toString
    val outPath = tmp.resolve("voters").toString
    val first = LoadPipeline.runCatalog(spark, TestSpark.resource("/voters"),
      mPath, outPath)
    assert(first === Seq("01--AK--VM2Uniform--2024-01-15.tab",
      "02--CA--VM2Uniform--2024-02-01.tab"))
    // manifest persisted with Loaded=true and real line counts
    val m = Manifest.load(spark, mPath)
    assert(m.count() === 2)
    assert(m.filter($"Loaded").count() === 2)
    assert(Manifest.expectedLines(m, first.head) === Some(5))
    // second run: nothing pending
    val second = LoadPipeline.runCatalog(spark, TestSpark.resource("/voters"),
      mPath, outPath)
    assert(second === Seq.empty)
    // published data intact
    assert(spark.read.parquet(outPath).count() === 7)
  }

  test("Dedup.againstExisting drops only already-present keys") {
    val existing = Seq("a", "b").toDF("k")
    val incoming = Seq(("a", 1), ("c", 2), ("c", 3)).toDF("k", "v")
    val out = Dedup.againstExisting(incoming, existing, "k")
      .orderBy($"v").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq === Seq(("c", 2), ("c", 3)))
  }

  test("TopKAggregator: arbitrary partition splits give sorted take-k") {
    val rnd = new scala.util.Random(7)
    val agg = new TopKAggregator(5)
    val data = Seq.fill(200)(Scored(rnd.nextInt(40).toDouble / 4.0, rnd.nextInt(1000).toLong))
      .distinctBy(_.id)
    val expected = data.sortBy(s => (-s.score, s.id)).take(5)
    // single-pass reduce
    val direct = data.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(direct) === expected)
    // random split points, merged partials in shuffled merge order
    (1 to 20).foreach { _ =>
      val parts = data.grouped(1 + rnd.nextInt(40)).toSeq
      val partials = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === expected)
    }
  }
}
