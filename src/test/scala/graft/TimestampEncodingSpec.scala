package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The mixed-writer-version contract behind `Tables.table`'s
  * timestamp normalization: the live fixtures only ever carry ONE
  * encoding at a time (NANOS through round 5, MICROS-NTZ since), so
  * the dispatch paths the fixtures are NOT currently exercising would
  * otherwise rot untested until the next re-encode breaks a round.
  * This spec writes its own parquet files in each physical encoding —
  * via the parquet-java example writer, below Spark, exactly like a
  * foreign writer would — and asserts every path normalizes to the
  * engine-wide TIMESTAMP_NTZ convention with bit-identical values:
  *
  *  - TIMESTAMP(NANOS, utc=false): Spark can't read it natively;
  *    `nanosAsLong` + integer ns→µs truncation.
  *  - TIMESTAMP(MICROS, utc=true): resolves LTZ; cast to NTZ is
  *    value-identity under the UTC session.
  *  - TIMESTAMP(MICROS, utc=false): the current fixture encoding;
  *    must stay a NO-OP (no projection over the scan).
  *  - genuine BIGINT columns must NOT be touched by the nanos rule.
  */
class TimestampEncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One row: ts = 2024-03-01T12:34:56.789012 (micros precision so
    * every encoding represents it exactly), id = 7, n = raw long. */
  private val microsValue = 1709296496789012L
  private val rawLong = 1709296496789012L // same magnitude, NOT a timestamp

  private def schemaWith(tsType: PrimitiveType): MessageType =
    Types.buildMessage()
      .addField(tsType)
      .addField(Types.required(INT64).named("id"))
      .addField(Types.required(INT64).named("n"))
      .named("row")

  private def write(dir: String, tsType: PrimitiveType, tsRaw: Long): String = {
    val schema = schemaWith(tsType)
    val path = s"$dir/t.parquet"
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new Path(path)).withConf(conf).build()
    val g = new SimpleGroupFactory(schema).newGroup()
    g.add("ts", tsRaw); g.add("id", 7L); g.add("n", rawLong)
    try w.write(g) finally w.close()
    dir
  }

  private def tsAnnotated(utc: Boolean, unit: LogicalTypeAnnotation.TimeUnit) =
    Types.required(INT64)
      .as(LogicalTypeAnnotation.timestampType(utc, unit))
      .named("ts")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-tsenc").toString

  private def readNormalized(dir: String) = Tables.table(spark, dir, "t")

  private def expectNtzMicros(dir: String): Unit = {
    val df = readNormalized(dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.schema("n").dataType == LongType, "genuine long was rewritten")
    val row = df.selectExpr(
      "unix_micros(cast(ts as timestamp)) AS us", "id", "n").head()
    assert(row.getLong(0) == microsValue)
    assert(row.getLong(1) == 7L && row.getLong(2) == rawLong)
  }

  test("TIMESTAMP(NANOS, utc=false): nanosAsLong + integer truncation to NTZ micros") {
    val dir = write(tmp(),
      tsAnnotated(false, LogicalTypeAnnotation.TimeUnit.NANOS),
      microsValue * 1000L + 777L) // sub-µs noise must truncate away
    expectNtzMicros(dir)
  }

  test("TIMESTAMP(MICROS, utc=true): LTZ cast to NTZ is value-identity under UTC") {
    val dir = write(tmp(),
      tsAnnotated(true, LogicalTypeAnnotation.TimeUnit.MICROS), microsValue)
    expectNtzMicros(dir)
  }

  test("TIMESTAMP(MICROS, utc=false): read is a NO-OP — no projection over the scan") {
    val dir = write(tmp(),
      tsAnnotated(false, LogicalTypeAnnotation.TimeUnit.MICROS), microsValue)
    expectNtzMicros(dir)
    // the normalized frame IS the raw scan: no Project node at all,
    // so pushdown/pruning see the same plan as a direct read
    val plan = readNormalized(dir).queryExecution.optimizedPlan
    assert(!plan.toString.contains("Project"),
      s"no-op path inserted a projection:\n$plan")
  }

  test("TIMESTAMP(MILLIS, utc=true): also normalized to NTZ") {
    val dir = write(tmp(),
      tsAnnotated(true, LogicalTypeAnnotation.TimeUnit.MILLIS),
      microsValue / 1000L)
    val df = readNormalized(dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    val us = df.selectExpr("unix_micros(cast(ts as timestamp))").head().getLong(0)
    assert(us == (microsValue / 1000L) * 1000L)
  }

  test("filter pushdown reaches the scan on the current fixture encoding") {
    // regression guard on the real events table: the micros no-op path
    // must keep ts filters sargable (PushedFilters non-empty)
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit("2024-01-02").cast("timestamp_ntz"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts filter not pushed:\n$scan")
  }
}
