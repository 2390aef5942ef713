package graft

import graft.etl.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(o, c, "o_custkey", 8)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salt assignment is deterministic across re-reads and repartitioning") {
    // a retried/speculative map task re-reading the same rows must
    // re-derive the same salt, so the salt may depend only on row
    // CONTENT — never on partition layout or scan order. Re-derive
    // the salt under a different partitioning and an independent
    // re-read: every order's salt must match.
    val buckets = 8
    def salts(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__salt",
        pmod(xxhash64(df.columns.filterNot(_ == "__salt").map(col).toSeq: _*),
          lit(buckets)).cast("int"))
      .select(col("o_orderkey"), col("__salt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = salts(Tables.orders(spark, sf))
    val reread = salts(Tables.orders(spark, sf).repartition(13))
    assert(base === reread)
    // and the salt actually spreads rows: a single hot key's rows
    // must occupy more than one bucket (the monotonic-id property we
    // keep, now retry-stable)
    val o = Tables.orders(spark, sf)
    val hot = o.groupBy(col("o_custkey")).count()
      .orderBy(col("count").desc).head().getLong(0)
    val hotBuckets = o.filter(col("o_custkey") === hot)
      .withColumn("__salt",
        pmod(xxhash64(o.columns.map(col).toSeq: _*), lit(buckets)).cast("int"))
      .select(col("__salt")).distinct().count()
    assert(hotBuckets > 1, s"hot key stayed in $hotBuckets bucket(s)")
  }

  test("bucketed tables join without a shuffle exchange") {
    Skew.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
    Skew.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    // force the merge join path (tiny tables would broadcast otherwise,
    // which bypasses bucketing entirely)
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem").hint("merge"), Seq("o_orderkey"))
    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.contains("SortMergeJoin"), planned.take(400))
    assert(!planned.contains("Exchange hashpartitioning"), planned.take(800))
    // and it still returns the right row count
    assert(joined.count() ===
      Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count())
  }

  test("stateful streaming user totals equal batch aggregation") {
    val stream = streaming.StatefulOps.userTotals(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stream === batch)
  }
}
