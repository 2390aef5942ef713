package graft

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pre-flight contract check on the driver-generated testdata
  * (VERDICT r6 #2). The fixtures are regenerated between rounds and
  * their PHYSICAL encodings are not stable — round 6 lost 18 graded
  * queries because `events.ts` silently moved from TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS) and nothing in the repo noticed before the
  * driver did. This spec is that detector: it asserts every table's
  * parquet footer (column names, physical/logical types, row-count
  * floors) against FIXTURES.md §A, and on mismatch fails with the
  * OBSERVED physical type in the message — one red test with an
  * actionable diagnosis instead of 18 red correctness rows.
  *
  * Footer-only reads (no Spark jobs, no scans) so the whole spec runs
  * in milliseconds and can sit at the front of every test run.
  */
class FixtureContractSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  /** expected column name → acceptable parquet (primitive, logical) renderings */
  private val expectedCols: Map[String, Map[String, Set[String]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set("INT32"), "r_name" -> Set("BINARY:STRING")),
    "nation" -> Map(
      "n_nationkey" -> Set("INT32"), "n_name" -> Set("BINARY:STRING"),
      "n_regionkey" -> Set("INT32")),
    "customer" -> Map(
      "c_custkey" -> Set("INT64"), "c_name" -> Set("BINARY:STRING"),
      "c_nationkey" -> Set("INT32"), "c_acctbal" -> Set("DOUBLE"),
      "c_mktsegment" -> Set("BINARY:STRING")),
    "supplier" -> Map(
      "s_suppkey" -> Set("INT64"), "s_name" -> Set("BINARY:STRING"),
      "s_nationkey" -> Set("INT32"), "s_acctbal" -> Set("DOUBLE")),
    "part" -> Map(
      "p_partkey" -> Set("INT64"), "p_name" -> Set("BINARY:STRING"),
      "p_brand" -> Set("BINARY:STRING"), "p_type" -> Set("BINARY:STRING"),
      "p_size" -> Set("INT32"), "p_retailprice" -> Set("DOUBLE")),
    "orders" -> Map(
      "o_orderkey" -> Set("INT64"), "o_custkey" -> Set("INT64"),
      "o_orderstatus" -> Set("BINARY:STRING"),
      "o_totalprice" -> Set("DOUBLE"), "o_orderdate" -> tsEncodings,
      "o_orderpriority" -> Set("BINARY:STRING")),
    "lineitem" -> Map(
      "l_orderkey" -> Set("INT64"), "l_partkey" -> Set("INT64"),
      "l_suppkey" -> Set("INT64"), "l_linenumber" -> Set("INT32"),
      "l_quantity" -> Set("DOUBLE"), "l_extendedprice" -> Set("DOUBLE"),
      "l_discount" -> Set("DOUBLE"), "l_tax" -> Set("DOUBLE"),
      "l_returnflag" -> Set("BINARY:STRING"),
      "l_linestatus" -> Set("BINARY:STRING"), "l_shipdate" -> tsEncodings),
    "events" -> Map(
      "event_id" -> Set("INT64"), "ts" -> tsEncodings,
      "user_id" -> Set("INT64"), "event_type" -> Set("BINARY:STRING"),
      "value" -> Set("DOUBLE"), "props" -> Set("BINARY:STRING")),
    "documents" -> Map(
      "doc_id" -> Set("INT64"), "text" -> Set("BINARY:STRING"),
      "lang" -> Set("BINARY:STRING"), "source" -> Set("BINARY:STRING"),
      "n_chars" -> Set("INT64")),
    "embeddings" -> Map(
      "vec_id" -> Set("INT64"), "embedding" -> Set("LIST<FLOAT>"),
      "label" -> Set("INT32")))

  /** Every timestamp encoding the ENGINE's readers can dispatch on
    * ([[Tables.events]]): the fixtures have shipped NANOS and MICROS
    * already; MILLIS would also read fine. A physical encoding outside
    * this set is exactly the "testdata changed shape" event this spec
    * exists to catch early. */
  private def tsEncodings: Set[String] = Set(
    "INT64:TIMESTAMP(NANOS,false)", "INT64:TIMESTAMP(NANOS,true)",
    "INT64:TIMESTAMP(MICROS,false)", "INT64:TIMESTAMP(MICROS,true)",
    "INT64:TIMESTAMP(MILLIS,false)", "INT64:TIMESTAMP(MILLIS,true)")

  /** sf0.001 row counts per FIXTURES.md §A — asserted as exact values:
    * the generator is seeded (seed=42), so a count drift means a new
    * generator, which is worth one loud red test. */
  private val expectedRows = Map(
    "region" -> 5L, "nation" -> 25L, "customer" -> 150L, "supplier" -> 10L,
    "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L,
    "events" -> 1000L, "documents" -> 500L, "embeddings" -> 500L)

  /** Render one parquet field as "PRIMITIVE[:LOGICAL]" (lists as
    * LIST<element>), compact enough to diff in an assertion message. */
  private def render(t: org.apache.parquet.schema.Type): String =
    if (t.isPrimitive) {
      val p = t.asPrimitiveType().getPrimitiveTypeName.toString
      val ann = Option(t.getLogicalTypeAnnotation)
        .map {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            s"TIMESTAMP(${ts.getUnit},${ts.isAdjustedToUTC})"
          case other => other.toString
        }
      ann.fold(p)(a => s"$p:$a")
    } else {
      val g = t.asGroupType()
      Option(g.getLogicalTypeAnnotation) match {
        case Some(_: LogicalTypeAnnotation.ListLogicalTypeAnnotation) =>
          // list<element> — unwrap the repeated/element nesting
          val elem = g.getType(0).asGroupType().getType(0)
          s"LIST<${render(elem)}>"
        case _ => s"GROUP(${g.getFields.size} fields)"
      }
    }

  private def footer(name: String) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try (r.getFooter.getFileMetaData.getSchema, r.getRecordCount)
    finally r.close()
  }

  for (tbl <- Tables.all) {
    test(s"$tbl: parquet footer matches the FIXTURES.md contract") {
      val (schema, rows) = footer(tbl)
      val observed = schema.getFields.asScala
        .map(f => f.getName -> render(f)).toMap
      val expected = expectedCols(tbl)
      assert(observed.keySet == expected.keySet,
        s"$tbl column set changed — observed ${observed.keySet.toSeq.sorted}" +
          s" expected ${expected.keySet.toSeq.sorted}")
      for ((col, allowed) <- expected) {
        assert(allowed.contains(observed(col)),
          s"$tbl.$col PHYSICAL ENCODING CHANGED: observed '${observed(col)}'" +
            s", engine handles $allowed — update Tables/readers before " +
            "trusting any correctness run")
      }
      assert(rows == expectedRows(tbl),
        s"$tbl row count ${rows} != FIXTURES.md ${expectedRows(tbl)} — " +
          "fixture generator changed")
    }
  }

  test("events reads as TIMESTAMP_NTZ through Tables.events regardless of encoding") {
    val df = Tables.events(TestSpark.spark, sfDir)
    assert(df.schema("ts").dataType == TimestampNTZType,
      s"post-dispatch ts type is ${df.schema("ts").dataType}")
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]; l.forEach(a => b += a); b.result()
    }
  }
}
