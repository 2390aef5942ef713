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
