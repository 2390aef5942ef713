package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond the parquet testdata and the TSV
  * load path: JSON, CSV, and ORC round-trips preserve both schema and
  * values (the format surface a reference user would expect from a
  * general engine). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def roundTrip(fmt: String): Unit = {
    val out = java.nio.file.Files.createTempDirectory(s"rt-$fmt").toString
    val src = Tables.orders(spark, sf)
      .withColumn("o_orderdate", col("o_orderdate").cast("string"))
    src.write.mode("overwrite").format(fmt).save(out)
    val back = fmt match {
      case "csv" => spark.read.format(fmt).option("header", "true")
        .schema(src.schema).load(out)
      case _ => spark.read.format(fmt).load(out)
    }
    assert(back.count() === src.count())
    // JSON infers columns alphabetically: reselect in source order
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.select(src.columns.map(col): _*)
      .orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq, s"$fmt round-trip mismatch")
  }

  test("JSON round-trip") { roundTrip("json") }

  test("JSONL corpus ingest: corrupt lines captured, never silently dropped") {
    // raw LLM corpora arrive as JSONL with occasional malformed
    // lines; the ingest contract is PERMISSIVE + a corrupt-record
    // column — good lines parse typed, bad lines are CAPTURED for
    // quarantine (not dropped, not batch-failing)
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f, Seq(
      """{"doc_id": 1, "source": "web", "text": "alpha beta"}""",
      """{"doc_id": 2, "source": "web", "text": "gamma"}""",
      """{"doc_id": 3, "source": "books", "text": "delta", BROKEN""",
      """{"doc_id": 4, "source": "books", "text": "epsilon"}"""
    ).mkString("", "\n", "\n"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType),
      StructField("_corrupt", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(f.toString)
      .cache() // corrupt-column-only filters require materialization
    assert(df.count() === 4, "no line may be silently dropped")
    val good = df.filter(col("_corrupt").isNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(good === Map(1L -> "alpha beta", 2L -> "gamma", 4L -> "epsilon"))
    val bad = df.filter(col("_corrupt").isNotNull).collect()
    assert(bad.length === 1 && bad.head.getString(3).contains("BROKEN"))
    assert(bad.head.isNullAt(0), "corrupt rows must not half-parse")
    // and the strict twin: FAILFAST refuses the file outright
    val ex = intercept[Exception] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(f.toString).collect()
    }
    assert(Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(m =>
        m.contains("Malformed") || m.contains("FAILFAST"))))
    df.unpersist()
  }
  test("ORC round-trip") { roundTrip("orc") }
  test("CSV round-trip") {
    val out = java.nio.file.Files.createTempDirectory("rt-csv").toString
    val src = Tables.orders(spark, sf)
      .withColumn("o_orderdate", col("o_orderdate").cast("string"))
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(back.orderBy(col("o_orderkey")).collect().map(_.toSeq).toSeq ===
      src.orderBy(col("o_orderkey")).collect().map(_.toSeq).toSeq)
  }
}
