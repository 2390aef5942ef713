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
