package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bench self-attribution surface (VERDICT r13 #1) must actually
  * attribute: a window around real work shows that work's bytes and
  * runtime; a window around nothing shows zero deltas (no leakage
  * from the previous query's async listener tail — the drain barrier
  * is load-bearing). */
class BenchMetricsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("metrics window attributes work to the query that ran it") {
    val m = new BenchMetrics(spark.sparkContext)
    val before = m.begin()
    // a scan + shuffle: input bytes and shuffle write must both move
    Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(count(lit(1))).collect()
    val delta = m.end(before).toMap
    assert(delta("input_bytes") > 0L,
      s"parquet scan bytes not attributed: $delta")
    assert(delta("shuffle_write_bytes") > 0L,
      s"groupBy shuffle bytes not attributed: $delta")
    assert(delta("run_ms") >= 0L && delta("gc_ms") >= 0L)
    assert(delta("peak_exec_mem_bytes") >= 0L)

    // an idle window must read all-zero sums — the drain barrier
    // keeps the previous window's stragglers out
    val quiet = m.end(m.begin()).toMap
    val moving = quiet.filter { case (k, v) => k != "peak_exec_mem_bytes" && v != 0L }
    assert(moving.isEmpty, s"idle window shows leaked metrics: $quiet")
    assert(quiet("peak_exec_mem_bytes") == 0L,
      "peak must reset at window start")
  }
}
