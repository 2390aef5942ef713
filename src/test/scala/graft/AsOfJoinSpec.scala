package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native as-of equals the composed union+window form") {
    val sf = "/root/testdata/sf0.001"
    val native = ops.EventOps.asofJoinNative(spark, sf)
      .select($"event_id", $"asof_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val composed = ops.EventOps.asofJoin(spark, sf)
      .select($"event_id", $"asof_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(native.toSeq === composed.toSeq)
  }

  test("tolerance nulls exactly the matches older than the bound") {
    val sf = "/root/testdata/sf0.001"
    val tolMicros = 8400L * 86400L * 1000000L
    val bounded = ops.EventOps.asofJoinTolerance(spark, sf)
      .select($"event_id", $"asof_orderkey_bounded").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // reference: unbounded native join, matches beyond the bound nulled
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val ord = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey")
    val ref = AsOf.join(ev, ord, "user_id", "ts",
        "o_custkey", "o_orderdate", "o_orderkey")
      .select($"event_id",
        when(unix_micros($"ts".cast("timestamp")) -
          unix_micros($"o_orderdate".cast("timestamp")) <= tolMicros,
          $"o_orderkey").as("k"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(bounded === ref)
    // the bound must actually bite on this data AND leave matches
    assert(bounded.values.exists(_ == -1L), "no stale match nulled")
    assert(bounded.values.exists(_ != -1L), "all matches nulled")
  }

  test("a null left time matches nothing (no held-row inheritance)") {
    val ev = Seq((1L, 5L, Some(1000000L)), (2L, 5L, None))
      .toDF("event_id", "user_id", "raw")
      .select($"event_id", $"user_id",
        timestamp_micros(coalesce($"raw", lit(null))).as("ts"))
    val ord = Seq((5L, 500000L, 77L))
      .toDF("o_custkey", "raw", "o_orderkey")
      .select($"o_custkey", timestamp_micros($"raw").as("o_orderdate"),
        $"o_orderkey")
    val got = AsOf.join(ev, ord, "user_id", "ts",
        "o_custkey", "o_orderdate", "o_orderkey")
      .select($"event_id", $"o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got(1L) === 77L, "real timestamp matches")
    assert(got(2L) === -1L,
      "null-ts row must NOT inherit the previous row's match")
  }

  test("plan contains the custom exec with one exchange+sort per side") {
    val df = ops.EventOps.asofJoinNative(spark, "/root/testdata/sf0.001")
    // SparkPlan.nodeName strips the "Exec" suffix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500))
  }

  test("optimizer rule pushes left-only filters below the as-of join") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val ord = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey")
    val joined = AsOf.join(ev, ord, "user_id", "ts",
      "o_custkey", "o_orderdate", "o_orderkey")
      .filter($"user_id" < 5) // left-only predicate
    val optimized = joined.queryExecution.optimizedPlan.toString
    // after the rule, no Filter remains ABOVE the AsOfJoin node
    assert(optimized.linesIterator.next().startsWith("AsOfJoin") ||
      !optimized.split("AsOfJoin")(0).contains("Filter"), optimized)
    // and results match applying the filter before the join
    val a = joined.select($"event_id", $"o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val b = AsOf.join(ev.filter($"user_id" < 5), ord, "user_id", "ts",
      "o_custkey", "o_orderdate", "o_orderkey")
      .select($"event_id", $"o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(a === b)
  }

  test("null keys and times never match; ties break by largest tiebreak") {
    val left = Seq(
      (1L, Some(10L), Some("2024-01-01 10:00:00")),
      (2L, None, Some("2024-01-01 10:00:00")),      // null key
      (3L, Some(10L), None),                        // null time
      (4L, Some(10L), Some("2024-01-01 09:00:00")), // before any right
      (5L, Some(99L), Some("2024-01-01 10:00:00"))  // key with no right rows
    ).toDF("id", "k", "t_raw")
      .withColumn("t", $"t_raw".cast("timestamp_ntz")).drop("t_raw")
    val right = Seq(
      (10L, "2024-01-01 09:30:00", 100L),
      (10L, "2024-01-01 09:30:00", 101L), // same ts: 101 wins (tiebreak)
      (10L, "2024-01-01 11:00:00", 102L)  // after left times: never matches
    ).toDF("rk", "rt_raw", "ord")
      .withColumn("rt", $"rt_raw".cast("timestamp_ntz")).drop("rt_raw")
    val out = AsOf.join(left, right, "k", "t", "rk", "rt", "ord")
      .select($"id", $"ord").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(1L) === 101L) // 09:30 pair, larger ord wins
    assert(out(2L) === -1L)
    assert(out(3L) === -1L)
    assert(out(4L) === -1L)
    assert(out(5L) === -1L)
  }
}
