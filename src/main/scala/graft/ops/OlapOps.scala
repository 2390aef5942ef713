package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP aggregation surface (SURVEY.md §2.7 X7/X8): rollup, cube,
  * grouping sets, exact + approximate distinct counting, exact
  * percentiles.
  *
  * All of these are single-shuffle partial-aggregation plans in Spark
  * (map-side combine, then one exchange on the grouping keys), so they
  * scale linearly with data size; `grouping sets` expands to a union
  * of aggregates over one scan.
  */
object OlapOps {

  /** ROLLUP over lineitem with explicit grouping-id so subtotal rows
    * are distinguishable (NULL key vs subtotal). */
  def rollupLineitem(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  /** CUBE over orders: all 4 grouping combinations in one pass. */
  def cubeOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("sum_price"))
      .orderBy(col("gid"), col("status"), col("priority"))

  /** GROUPING SETS — the general form; declared in SQL (the DataFrame
    * API has no direct grouping-sets method pre-4.0 groupingSets). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("gs_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(1) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Exact distinct counting (the oracle-able side of X8). */
  def distinctExact(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** X8: HyperLogLog approximate distinct, graded against the exact
    * count with a tolerance bit — HLL values themselves are
    * implementation-specific, the tolerance contract is not. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("approx_raw"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_raw") - col("exact_orders")) <=
          col("exact_orders") * 0.15).as("within_tol"))
      .orderBy(col("l_returnflag"))

  /** Mergeable-sketch RE-AGGREGATION: per-month HLL sketches of the
    * customer set, unioned up to quarters — the pattern that makes
    * distinct counting cheap at 100 TB (store the sketch per
    * partition once; answer any coarser rollup by unioning sketches,
    * never rescanning raw data — the same algebraic-partials
    * discipline as [[incrementalRollup]], applied to a non-additive
    * measure). `hll_sketch_agg`/`hll_union_agg` are Spark's Apache
    * DataSketches bindings. The estimate is implementation-defined,
    * so the GRADED columns are the exact count and a tolerance
    * boolean (the [[approxDistinct]] pattern); the estimate's
    * accuracy is what `within_tol` asserts. */
  def hllUnionRollup(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val quarterly = monthly
      .groupBy(date_trunc("quarter", col("month")).cast("timestamp_ntz").as("quarter"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_raw"))
    val exact = Tables.orders(s, d)
      .groupBy(date_trunc("quarter", col("o_orderdate")).cast("timestamp_ntz").as("quarter"))
      .agg(countDistinct(col("o_custkey")).as("exact_custkeys"))
    exact.join(quarterly, Seq("quarter"))
      .select(col("quarter"), col("exact_custkeys"),
        (abs(col("approx_raw") - col("exact_custkeys")) <=
          col("exact_custkeys") * 0.05 + 10).as("within_tol"))
      .orderBy(col("quarter"))
  }

  /** Mergeable QUANTILE-sketch re-aggregation (VERDICT r7 #4) — the
    * [[hllUnionRollup]] stored-sketch pattern for a second
    * non-additive measure family: per-month deterministic compactor
    * sketches ([[graft.functions.QSketch]], MRL/KLL lineage) of
    * o_totalprice, unioned up to quarters, answering p50/p95 without
    * rescanning raw data. At 100 TB the monthly `sk` column is what
    * gets STORED next to each partition; any coarser rollup (quarter,
    * year, all-time) is a merge of sketch bytes.
    *
    * Grading (the `approxDistinct` discipline): sketch estimates are
    * merge-order-dependent (equally valid sketches differ run to
    * run), so the graded columns are the EXACT interpolated
    * percentiles (engine-independent, rounded 6) plus rank-tolerance
    * booleans — each approx quantile's TRUE rank fraction in the
    * quarter, computed by a broadcast join of the (|quarters|-row)
    * estimates back onto orders, must sit within 2% (+2/n for
    * integer-rank granularity at small n) of its target. */
  def quantileUnionRollup(s: SparkSession, d: String): DataFrame = {
    val skAgg = udaf(new graft.functions.QuantileSketchAgg(512))
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(skAgg(col("o_totalprice")).as("sk"))
    quantileGradeFromMonthly(monthly, Tables.orders(s, d))
  }

  /** The quarter-merge + grading tail of [[quantileUnionRollup]],
    * shared with the streaming twin (`stream_quantile_rollup`):
    * `monthly` is any (month, sk) frame of serialized [[graft.functions.QSketch]]
    * bytes — built by a batch groupBy or drained from streaming state —
    * and the grade is identical either way, which is exactly the
    * stored-sketch promise (the serving side cannot tell who built
    * the sketch).
    *
    * The rank check uses count(≤ approx)/n, which assumes low tie
    * mass per value (true of o_totalprice: ~unique 2-decimal prices).
    * Under HEAVY ties a returned value occupies a rank INTERVAL
    * [count(<v), count(≤v)] and the correct acceptance test is that
    * the interval intersects the band — the form the seeded-random
    * sweep in RandomDifferentialSpec uses over 25%-duplicated data. */
  private[graft] def quantileGradeFromMonthly(monthly: DataFrame,
      orders: DataFrame): DataFrame = {
    val skMerge = udaf(new graft.functions.QuantileMergeAgg(512, Seq(0.5, 0.95)))
    val quarterOf = (c: Column) =>
      date_trunc("quarter", c).cast("timestamp_ntz").as("quarter")
    val quarterly = monthly
      .groupBy(quarterOf(col("month")))
      .agg(skMerge(col("sk")).as("est"))
      .select(col("quarter"),
        element_at(col("est"), 1).as("approx_p50"),
        element_at(col("est"), 2).as("approx_p95"))
    // ONE scan for exact percentiles AND the rank checks (r9 — was
    // two full orders scans joined at the end): the |quarters|-row
    // estimate frame broadcasts onto the scan, and both the exact
    // order statistics and the approx-rank counts ride the same
    // per-quarter aggregate. Identical output values.
    orders
      .select(quarterOf(col("o_orderdate")), col("o_totalprice"))
      .join(broadcast(quarterly), Seq("quarter"))
      .groupBy(col("quarter"))
      .agg(count(lit(1)).as("n_orders"),
        round(percentile(col("o_totalprice"), lit(0.5)), 6).as("exact_p50"),
        round(percentile(col("o_totalprice"), lit(0.95)), 6).as("exact_p95"),
        (sum(when(col("o_totalprice") <= col("approx_p50"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1))).as("r50"),
        (sum(when(col("o_totalprice") <= col("approx_p95"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1))).as("r95"))
      .select(col("quarter"), col("n_orders"),
        col("exact_p50"), col("exact_p95"),
        (abs(col("r50") - 0.5) <=
          lit(0.02) + lit(2.0) / col("n_orders").cast("double"))
          .as("p50_within_tol"),
        (abs(col("r95") - 0.95) <=
          lit(0.02) + lit(2.0) / col("n_orders").cast("double"))
          .as("p95_within_tol"))
      .orderBy(col("quarter"))
  }

  /** Mergeable set-INTERSECTION rollup (VERDICT r8 #3) — the overlap
    * face of the stored-sketch family: quarter-over-quarter
    * active-customer overlap ("customers active in BOTH quarters")
    * answered from the SAME stored per-month HLL sketches as
    * [[hllUnionRollup]], by inclusion–exclusion:
    * |A∩B| = est(A) + est(B) − est(A∪B), with est(A∪B) one more
    * sketch union (`hll_union`) over the |quarters|-row frame. Two
    * levels of re-aggregation — months → quarters → quarter pairs —
    * with raw data rescanned ZERO times on the sketch path; at
    * 100 TB this answers any audience-overlap question from KB-sized
    * sketch bytes stored next to the partitions.
    *
    * Grading (the [[quantileUnionRollup]] discipline): sketch
    * estimates are merge-order-dependent, so graded columns are the
    * EXACT per-quarter distincts, union, and overlap (one
    * distinct + one self-join at the (quarter, custkey) grain —
    * union derived by exact arithmetic nq_a + nq_b − overlap, no
    * third aggregate), plus the tolerance boolean on the
    * inclusion–exclusion estimate. The I-E error compounds THREE
    * sketch errors and scales with |A∪B| (not the overlap), so the
    * band is 10 % of the union + 50 — generous by design: the alarm
    * must hold under any distributed merge order at every SF.
    * Consecutive quarters pair on an integer quarter index
    * (year·4 + quarter − 1) — no interval arithmetic to diverge
    * between engines. */
  def sketchOverlap(s: SparkSession, d: String): DataFrame = {
    val qi = (c: Column) => (year(c) * 4 + quarter(c) - 1).cast("long")
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val quarterly = monthly
      .groupBy(date_trunc("quarter", col("month"))
        .cast("timestamp_ntz").as("quarter"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .withColumn("qi", qi(col("quarter")))
      .localCheckpoint(true) // |quarters| rows; read 2× below
    val est = quarterly.alias("a")
      .join(quarterly.select((col("qi") - 1).as("qi"), col("sk").as("sk_b")),
        Seq("qi"))
      .select(col("quarter"),
        (hll_sketch_estimate(col("sk")) +
          hll_sketch_estimate(col("sk_b")) -
          hll_sketch_estimate(hll_union(col("sk"), col("sk_b"))))
          .as("est_overlap"))
    val qc = Tables.orders(s, d)
      .select(date_trunc("quarter", col("o_orderdate"))
        .cast("timestamp_ntz").as("quarter"), col("o_custkey"))
      .distinct()
      .withColumn("qi", qi(col("quarter")))
    val cnt = qc.groupBy(col("quarter"), col("qi"))
      .agg(count(lit(1)).as("nq"))
    val overlap = qc.alias("a")
      .join(qc.select((col("qi") - 1).as("qi"),
          col("o_custkey").as("b_custkey")).alias("b"),
        col("a.qi") === col("b.qi") &&
          col("a.o_custkey") === col("b_custkey"))
      .groupBy(col("a.quarter").as("quarter"))
      .agg(count(lit(1)).as("n_overlap"))
    cnt.alias("c1")
      .join(cnt.select((col("qi") - 1).as("qi"), col("nq").as("nq_next")),
        Seq("qi"))
      .join(overlap, Seq("quarter"), "left")
      .join(broadcast(est), Seq("quarter"))
      .select(col("quarter"), col("nq").as("n_q"), col("nq_next").as("n_next"),
        (col("nq") + col("nq_next") -
          coalesce(col("n_overlap"), lit(0L))).as("n_union"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (abs(col("est_overlap") -
          coalesce(col("n_overlap"), lit(0L)).cast("double")) <=
          (col("nq") + col("nq_next") -
            coalesce(col("n_overlap"), lit(0L))).cast("double") * 0.1 + 50.0)
          .as("within_tol"))
      .orderBy(col("quarter"))
  }

  /** Mergeable HEAVY-HITTERS re-aggregation — the third member of the
    * stored-sketch rollup family ([[hllUnionRollup]] distinct counts,
    * [[quantileUnionRollup]] percentiles): per-month Misra–Gries
    * summaries ([[graft.functions.MGSketch]], m=8) of the order
    * priority, unioned to quarters, answering per-quarter top-3
    * frequent items from sketch bytes without rescanning raw data.
    *
    * Grading: the priority domain (5 values) is below the summary
    * capacity, so by the MG degenerate-exact property no decrement
    * ever fires and every merged estimate EQUALS the true count —
    * the rollup hash-matches a plain GROUP BY + row_number oracle
    * (stronger than a tolerance bet). The eviction regime (planted
    * heavy hitter above n/(m+1) among hundreds of distinct keys,
    * sharded merges, never-overcount + bounded-undercount) is pinned
    * in FunctionsSpec where exactness is impossible. */
  def topkUnionRollup(s: SparkSession, d: String): DataFrame = {
    val build = udaf(new graft.functions.MGSketchAgg(8))
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(build(col("o_orderpriority")).as("sk"))
    topkGradeFromMonthly(monthly)
  }

  /** The quarter-merge + top-3 presentation tail of
    * [[topkUnionRollup]], shared with the streaming twin
    * (`stream_topk_rollup`) exactly like [[quantileGradeFromMonthly]]:
    * `monthly` is any (month, sk) frame of serialized
    * [[graft.functions.MGSketch]] bytes — batch groupBy or drained
    * streaming state — and both graded forms run THIS one tail
    * against the same oracle, so a drift in the presentation can
    * never split them silently. */
  private[graft] def topkGradeFromMonthly(monthly: DataFrame): DataFrame = {
    val merge = udaf(new graft.functions.MGMergeAgg(8, 3))
    monthly
      .groupBy(date_trunc("quarter", col("month"))
        .cast("timestamp_ntz").as("quarter"))
      .agg(merge(col("sk")).as("top"))
      .select(col("quarter"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("quarter"), (col("pos") + 1).cast("long").as("rank"),
        col("kv._1").as("priority"), col("kv._2").as("n_orders"))
      .orderBy(col("quarter"), col("rank"))
  }

  /** EQUI-DEPTH histogram (per-priority price deciles) from exact
    * distributed ORDER STATISTICS — the complement of the equi-width
    * [[histogram]]: bucket boundaries adapt to the distribution so
    * every bucket holds ~n/10 rows. No percentile interpolation
    * anywhere: each row's exact rank within its priority comes from
    * the two-phase [[PrefixSum]] (never a corpus-wide single-task
    * window — the text_pack_sequences machinery), the order key is
    * the integer composite cents·2²⁴ + orderkey (unique, order-
    * preserving; widen the shift when keys outgrow 2²⁴ — the z-order
    * rank-reduction note applies), and decile assignment is the pure
    * integer ⌊(rank−1)·10/n⌋. Bucket row counts, min and max are then
    * exact values both engines agree on byte-for-byte. */
  def equidepthHistogram(s: SparkSession, d: String): DataFrame = {
    // uniqueness precondition CHECKED, not commented (review finding):
    // the composite key cents·2²⁴ + o_orderkey is injective only while
    // o_orderkey < 2²⁴ (~TPC-H SF 3); past that, colliding keys make
    // row_number engine-dependent and buckets silently diverge from
    // the oracle. One single-column max over the scan the query reads
    // anyway — fail loud, widen the shift to grow.
    val maxKey = Tables.orders(s, d).agg(max(col("o_orderkey")))
      .head().getLong(0)
    require(maxKey < 16777216L,
      s"equidepthHistogram composite order key needs o_orderkey < 2^24" +
        s", got max $maxKey: widen the 2^24 shift")
    val rows = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("k",
        round(col("o_totalprice") * 100).cast("long") * lit(16777216L) +
          col("o_orderkey"))
      .withColumn("one", lit(1L))
    val ranked = PrefixSum.runningSum(rows, Seq("o_orderpriority"),
      "k", "one", "rk", bucketWidth = 1L << 40)
    val totals = ranked.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    ranked.join(broadcast(totals), Seq("o_orderpriority"))
      .withColumn("bucket", expr("((rk - 1) * 10) div n"))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"), col("bucket"))
  }

  /** Approximate query processing by DETERMINISTIC sampling: estimate
    * the corpus-wide discounted revenue from a 10% md5-prefix sample
    * in the SAME single scan that computes the exact answer (one
    * conditional aggregation — sampled mass rides a `when` branch).
    * The sample is the `sample_stratified`/`corpus_shuffle` systematic
    * scheme: a row is in iff the first 8 hex chars of
    * md5(composite key) sort below the rate threshold — engine-
    * independent (md5 is identical in Spark and DuckDB), replayable
    * (the training-set-reproducibility property), and unbiased in
    * expectation over the hash.
    *
    * Graded columns are all deterministic: exact decimal sums, the
    * scaled estimate (one double division + round(2)), and the
    * ±5% verdict — the AQP contract that a 10% systematic sample of a
    * near-uniform measure lands inside. At 100 TB this is the
    * "answer in seconds from 1/10th the bytes" dial: the sample
    * predicate pushes to the scan of a sample-clustered layout, and
    * the same estimate shape serves any additive measure. */
  def sampleEstimate(s: SparkSession, d: String): DataFrame = {
    val rateHex = "19999999" // floor(0.1 · 2³²) in hex — 10%
    val key = concat(lit("aqp:"),
      col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"), lit(":"),
      col("l_partkey").cast("string"), lit(":"),
      col("l_suppkey").cast("string"))
    val inSample = substring(md5(key), 1, 8) < lit(rateHex)
    val rev = discounted(col("l_extendedprice"), col("l_discount"))
    Tables.lineitem(s, d)
      .select(rev.as("rev"), inSample.as("in_sample"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"),
        sum(col("rev")).cast("double").as("revenue_true"),
        // no otherwise: unsampled rows contribute SQL NULL, which SUM
        // skips — the same CASE-without-ELSE shape the oracle uses
        round(sum(when(col("in_sample"), col("rev")))
          .cast("double") / 0.1, 2).as("revenue_est"))
      .withColumn("within_5pct",
        abs(col("revenue_est") - col("revenue_true")) <=
          col("revenue_true") * 0.05)
  }

  /** Single-pass table profiler — the data-quality summary every
    * ingest pipeline publishes next to a table: per column, null
    * count, exact distinct count, numeric min/max (timestamps as
    * epoch micros, strings profile nulls/distincts only — numeric
    * min/max stay typed DOUBLE so the oracle compare never depends
    * on engine string formatting). ONE aggregate over one scan (the
    * distinct counts share the Expand), melted to long form with
    * `stack`. At 100 TB the exact `countDistinct`s downgrade to the
    * HLL sketches above; the shape is unchanged. */
  def profileTable(s: SparkSession, d: String): DataFrame = {
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
    val a = Tables.orders(s, d).agg(
      nulls("o_orderkey").as("nn_key"),
      countDistinct(col("o_orderkey")).as("nd_key"),
      min(col("o_orderkey")).cast("double").as("mn_key"),
      max(col("o_orderkey")).cast("double").as("mx_key"),
      nulls("o_custkey").as("nn_cust"),
      countDistinct(col("o_custkey")).as("nd_cust"),
      min(col("o_custkey")).cast("double").as("mn_cust"),
      max(col("o_custkey")).cast("double").as("mx_cust"),
      nulls("o_totalprice").as("nn_price"),
      countDistinct(col("o_totalprice")).as("nd_price"),
      min(col("o_totalprice")).as("mn_price"),
      max(col("o_totalprice")).as("mx_price"),
      nulls("o_orderdate").as("nn_date"),
      countDistinct(col("o_orderdate")).as("nd_date"),
      unix_micros(min(col("o_orderdate")).cast("timestamp")).cast("double").as("mn_date"),
      unix_micros(max(col("o_orderdate")).cast("timestamp")).cast("double").as("mx_date"),
      nulls("o_orderstatus").as("nn_status"),
      countDistinct(col("o_orderstatus")).as("nd_status"))
    a.select(expr(
      """stack(5,
        |  'o_orderkey',    nn_key,    nd_key,    mn_key,  mx_key,
        |  'o_custkey',     nn_cust,   nd_cust,   mn_cust, mx_cust,
        |  'o_totalprice',  nn_price,  nd_price,  mn_price, mx_price,
        |  'o_orderdate',   nn_date,   nd_date,   mn_date, mx_date,
        |  'o_orderstatus', nn_status, nd_status, CAST(NULL AS DOUBLE),
        |    CAST(NULL AS DOUBLE))
        |  AS (col_name, n_null, n_distinct, min_num, max_num)""".stripMargin))
      .orderBy(col("col_name"))
  }

  /** Exact percentiles (quartiles) — `percentile`, not
    * `percentile_approx`, so the linear-interpolation result is
    * engine-independent on these integral quantities. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.25)).as("q25"),
        percentile(col("l_quantity"), lit(0.5)).as("median"),
        percentile(col("l_quantity"), lit(0.75)).as("q75"))
      .orderBy(col("l_returnflag"))

  /** Pivot: order counts per priority pivoted by status (fixed pivot
    * values so the output schema is static and oracle-able as
    * conditional aggregation). */
  def pivotOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))

  /** UNPIVOT (melt): the wide pivot folded back to long form with the
    * native `unpivot` operator — round-tripping [[pivotOrders]]'s
    * matrix. Zero cells (a status absent for a priority) are dropped
    * to match relational GROUP BY semantics, which is also what makes
    * the plain-SQL oracle exact. Narrow transform: no extra shuffle
    * beyond the pivot's own aggregate. */
  def unpivotOrders(s: SparkSession, d: String): DataFrame =
    pivotOrders(s, d)
      .unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "status", "n")
      .filter(col("n") > 0)
      .orderBy(col("o_orderpriority"), col("status"))

  /** Equi-width histogram of order value: bucket = ⌊price/25 000⌋ —
    * the data-profiling primitive. One partial-aggregating shuffle on
    * the bucket id; bucket boundaries are an exact double division of
    * 2-decimal inputs, identical in both engines. */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 25000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  /** Outer join: every customer with their order stats, including
    * order-less customers (LEFT OUTER semantics + null handling). */
  def leftOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
      .orderBy(col("c_custkey"))

  /** Count-Min Sketch heavy-hitter estimates (TypedImperativeAggregate
    * custom aggregate) graded like the HLL query: the sketch is
    * implementation-specific, the overestimate contract
    * (exact ≤ est ≤ exact + ε·N) is not. */
  def countMinFreq(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // ONE action builds both the sketch and the row count (VERDICT r2
    // #5): the count rides the same aggregate the sketch comes from,
    // so events is scanned once, and only KB-sized aggregates cross
    // the driver.
    val row = ev.agg(
      graft.functions.CountMinAgg.sketch(col("event_type")).as("sk"),
      count(lit(1)).as("n")).head()
    val bytes = row.getAs[Array[Byte]](0)
    val total = row.getLong(1)
    // broadcast the deserialized sketch once and probe via the native
    // expression — the old closure UDF re-deserialized the sketch on
    // every row, which dominates when the probe side is |distinct
    // keys| at heavy-hitter scale
    val cmB = s.sparkContext.broadcast(
      graft.functions.CountMinAgg.readSketch(bytes))
    // materialize the (|event types|-sized) probe result eagerly so
    // the broadcast can be destroyed HERE rather than leaking one
    // sketch per invocation for the session lifetime (ADVICE r4 —
    // the per-shard Bloom path already follows this discipline)
    val probed = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("est_n",
        graft.functions.GraftFunctions.countMinEstimate(cmB, col("event_type")))
      .select(col("event_type"), col("exact_n"),
        (col("est_n") >= col("exact_n") &&
          col("est_n") <= col("exact_n") + lit(total) * 0.01 + 10)
          .as("within_tol"))
      .localCheckpoint(true)
    cmB.destroy()
    probed.orderBy(col("event_type"))
  }

  /** Incremental materialized-aggregate maintenance: the monthly
    * revenue rollup served from PRE-AGGREGATED state plus a delta —
    * the batch form of what `stream_stateful_totals` does with
    * streaming state, and the pattern that makes a 100 TB rollup
    * cheap to keep fresh: history is never rescanned, only its
    * partial aggregates (|months| rows of exact-decimal sums — the
    * algebraic merge-able form) are combined with the new
    * partition's partials under one tiny re-aggregation.
    *
    * The fixture split is deterministic (`o_orderkey % 10`): 90 % of
    * orders play "already-ingested history" — their partials are a
    * content-addressed [[graft.ArtifactStore]] artifact, built once
    * per corpus snapshot — and 10 % play the newly-arrived delta,
    * aggregated fresh each run. The oracle is the FULL-table rollup:
    * state + delta must be indistinguishable from a from-scratch
    * recompute, which is the correctness bar incremental view
    * maintenance carries. Sums stay DECIMAL end-to-end through
    * storage and merge (ops/package.scala discipline); one final
    * cast to double. */
  def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    def partials(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D18_2)).as("sum_price_part"))
    val state = graft.ArtifactStore.parquet(s, "rollup_state_monthly",
        s"$d/orders.parquet", version = 1) {
      partials(Tables.orders(s, d).filter(col("o_orderkey") % 10 =!= 0))
    }
    val delta = partials(
      Tables.orders(s, d).filter(col("o_orderkey") % 10 === 0))
    state.unionByName(delta)
      .groupBy(col("month"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("sum_price_part")).cast("double").as("sum_price"))
      .orderBy(col("month"))
  }

  /** Incremental maintenance of a JOIN view: revenue per nation
    * (orders ⋈ customer ⋈ nation) kept fresh the same way
    * [[incrementalRollup]] keeps its aggregate fresh — stored partials
    * plus a freshly-computed delta, merged under one |nations|-sized
    * re-aggregation. The join makes this the DELTA-JOIN case of
    * incremental view maintenance: with static dimensions the view
    * delta is exactly ΔF ⋈ D (new fact rows joined to the dims), so a
    * refresh joins and aggregates ONLY the delta — history contributes
    * its stored partials and is never rejoined or rescanned. (The
    * fully general two-sided form adds ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB; the
    * same partials-artifact machinery carries it, with one stored
    * partial per term.) Scale shape: both dim joins broadcast
    * (customer is key+nationkey-projected; nation is 25 rows), so the
    * delta path is scan → broadcast-join ×2 → partial agg → one tiny
    * exchange; the oracle is the full-table recompute, the IVM
    * correctness bar. */
  def incrementalJoinView(s: SparkSession, d: String): DataFrame = {
    def partials(orders: DataFrame): DataFrame =
      orders
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d).select(col("n_nationkey"), col("n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D18_2)).as("sum_price_part"))
    val state = graft.ArtifactStore.parquet(s, "joinview_state_nation",
        d, version = 1) {
      partials(Tables.orders(s, d).filter(col("o_orderkey") % 10 =!= 0))
    }
    val delta = partials(
      Tables.orders(s, d).filter(col("o_orderkey") % 10 === 0))
    state.unionByName(delta)
      .groupBy(col("n_name"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("sum_price_part")).cast("double").as("sum_revenue"))
      .orderBy(col("n_name"))
  }

  /** Bitwise-aggregate rollup — the BITMAP-index aggregation class
    * (bit_or/bit_and/bit_xor are the only standard aggregates the
    * catalog didn't exercise): each customer contributes a one-hot
    * long mask for its nation bucket; per market segment, bit_or is
    * the exact presence BITMAP (which buckets appear at all), bit_and
    * the common-to-all test, bit_xor the parity fingerprint, and
    * bit_count(or) the distinct-bucket count read straight off the
    * bitmap — the roaring-bitmap mechanic in its 64-bit degenerate
    * form. All exact integers; bitwise ops are associative and
    * commutative, so partial aggregation (map-side combine) is
    * lossless and partition-order-free by construction. */
  def bitmaskRollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("mask",
        expr("shiftleft(cast(1 as bigint), cast(c_nationkey % 16 as int))"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        expr("bit_or(mask)").as("buckets_present"),
        expr("bit_and(mask)").as("buckets_common"),
        expr("bit_xor(mask)").as("buckets_parity"),
        expr("cast(bit_count(bit_or(mask)) as bigint)").as("n_buckets"))
      .orderBy(col("c_mktsegment"))

  /** Exact MODE per group with a PINNED tie-break (most frequent
    * quantity per return flag; equal frequencies → smallest value) —
    * built-in `mode()` aggregates leave ties implementation-defined
    * in both engines, so the catalog form makes the argmax explicit:
    * value-level partial-agg counts, then a row_number over the
    * AGGREGATED (group, value) grain. Deterministic by construction,
    * shuffle bounded by |groups|·|distinct values|. */
  def modeExact(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_quantity"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_quantity"),
        col("n").as("mode_count"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mode_exact" -> modeExact,
    "agg_bitmask_rollup" -> bitmaskRollup,
    "agg_incremental_rollup" -> incrementalRollup,
    "view_incremental_join" -> incrementalJoinView,
    "view_matview_rewrite" -> ((s, d) => graft.plans.Matview.viewRewrite(s, d)),
    "agg_countmin_freq" -> countMinFreq,
    "olap_pivot" -> pivotOrders,
    "olap_unpivot" -> unpivotOrders,
    "agg_histogram" -> histogram,
    "agg_hll_union" -> hllUnionRollup,
    "agg_quantile_union" -> quantileUnionRollup,
    "agg_topk_union" -> topkUnionRollup,
    "agg_sketch_overlap" -> sketchOverlap,
    "agg_sample_estimate" -> sampleEstimate,
    "agg_equidepth_histogram" -> equidepthHistogram,
    "profile_table" -> profileTable,
    "join_left_outer" -> leftOuter,
    "olap_rollup" -> rollupLineitem,
    "olap_cube" -> cubeOrders,
    "olap_grouping_sets" -> groupingSets,
    "agg_distinct_exact" -> distinctExact,
    "agg_approx_distinct" -> approxDistinct,
    "agg_percentiles" -> percentiles,
  )

  val oracles: Map[String, String] = Map(
    // the same explicit argmax with the same (count desc, value)
    // tie-break — never the built-in mode(), whose ties are
    // implementation-defined
    "agg_mode_exact" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY n DESC, l_quantity) AS rn FROM c)
        |SELECT l_returnflag, l_quantity AS mode_quantity,
        |  n AS mode_count
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    // identical one-hot masks through the same bitwise aggregates
    "agg_bitmask_rollup" ->
      """WITH m AS (SELECT c_mktsegment,
        |    (CAST(1 AS BIGINT) << CAST(c_nationkey % 16 AS INT)) AS mask
        |  FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(bit_or(mask) AS BIGINT) AS buckets_present,
        |  CAST(bit_and(mask) AS BIGINT) AS buckets_common,
        |  CAST(bit_xor(mask) AS BIGINT) AS buckets_parity,
        |  CAST(bit_count(bit_or(mask)) AS BIGINT) AS n_buckets
        |FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // full-table recompute: the incremental state+delta serve must be
    // indistinguishable from aggregating everything from scratch
    "agg_incremental_rollup" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |    AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // the plain rollup over the RAW table: the optimizer's swap onto
    // the materialized summary must be invisible in results
    "view_matview_rewrite" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // full recompute of the joined view: state+delta must be
    // indistinguishable from joining and aggregating everything
    "view_incremental_join" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_countmin_freq" ->
      """SELECT event_type, COUNT(*) AS exact_n, TRUE AS within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the unpivot drops zero cells, so the long form IS the group-by
    "olap_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus AS status,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderpriority, status""".stripMargin,
    "agg_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n, ${sql.dsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // estimates are implementation-defined; the graded row is the
    // exact count + the tolerance verdict (approxDistinct pattern)
    "agg_hll_union" ->
      """SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
        |    AS quarter,
        |  COUNT(DISTINCT o_custkey) AS exact_custkeys,
        |  TRUE AS within_tol
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact percentiles are engine-independent after round(6); the
    // sketch estimates are graded as rank-tolerance booleans (the
    // agg_hll_union pattern — TRUE is the asserted contract)
    "agg_quantile_union" ->
      """SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
        |    AS quarter,
        |  COUNT(*) AS n_orders,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
        |  ROUND(quantile_cont(o_totalprice, 0.95), 6) AS exact_p95,
        |  TRUE AS p50_within_tol,
        |  TRUE AS p95_within_tol
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact oracle (not a tolerance bet): the 5-value priority domain
    // is under the MG capacity, so the merged sketch counts equal the
    // true counts by the degenerate-exact property
    "agg_topk_union" ->
      """WITH counted AS (
        |  SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
        |      AS quarter,
        |    o_orderpriority AS priority, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT quarter, rank, priority, n_orders FROM (
        |  SELECT quarter, priority, n_orders,
        |    CAST(row_number() OVER (PARTITION BY quarter
        |      ORDER BY n_orders DESC, priority) AS BIGINT) AS rank
        |  FROM counted) t
        |WHERE rank <= 3 ORDER BY quarter, rank""".stripMargin,
    // exact per-quarter distincts / overlap / derived union; the
    // inclusion-exclusion estimate is graded as the tolerance boolean
    // (agg_hll_union pattern — TRUE is the asserted contract)
    "agg_sketch_overlap" ->
      """WITH qc AS (
        |  SELECT DISTINCT
        |    CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
        |      AS quarter,
        |    o_custkey,
        |    year(date_trunc('quarter', o_orderdate)) * 4 +
        |      quarter(date_trunc('quarter', o_orderdate)) - 1 AS qi
        |  FROM orders),
        |cnt AS (SELECT quarter, qi, COUNT(*) AS nq FROM qc GROUP BY 1, 2),
        |ov AS (SELECT a.quarter AS quarter, COUNT(*) AS n_overlap
        |       FROM qc a JOIN qc b ON a.o_custkey = b.o_custkey
        |         AND b.qi = a.qi + 1
        |       GROUP BY 1)
        |SELECT c1.quarter AS quarter, c1.nq AS n_q, c2.nq AS n_next,
        |  c1.nq + c2.nq - COALESCE(ov.n_overlap, 0) AS n_union,
        |  COALESCE(ov.n_overlap, 0) AS n_overlap,
        |  TRUE AS within_tol
        |FROM cnt c1 JOIN cnt c2 ON c2.qi = c1.qi + 1
        |LEFT JOIN ov ON ov.quarter = c1.quarter
        |ORDER BY quarter""".stripMargin,
    // exact order statistics: ranks over the same unique composite
    // integer key, pure-integer decile assignment — both engines
    // agree byte-for-byte, no interpolation involved
    "agg_equidepth_histogram" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
        |        * 16777216 + o_orderkey) AS rk,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, CAST((rk - 1) * 10 // n AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS n_rows, MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the sample selection is the md5-prefix scheme — engine-identical
    // hex strings, so the oracle replays selection AND estimate exactly
    "agg_sample_estimate" ->
      """WITH t AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |      AS rev,
        |    substr(md5('aqp:' || CAST(l_orderkey AS VARCHAR) || ':' ||
        |      CAST(l_linenumber AS VARCHAR) || ':' ||
        |      CAST(l_partkey AS VARCHAR) || ':' ||
        |      CAST(l_suppkey AS VARCHAR)), 1, 8) < '19999999' AS in_sample
        |  FROM lineitem)
        |SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sampled,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue_true,
        |  round(CAST(SUM(CASE WHEN in_sample THEN rev END) AS DOUBLE)
        |    / 0.1, 2) AS revenue_est,
        |  abs(round(CAST(SUM(CASE WHEN in_sample THEN rev END) AS DOUBLE)
        |      / 0.1, 2) - CAST(SUM(rev) AS DOUBLE))
        |    <= CAST(SUM(rev) AS DOUBLE) * 0.05 AS within_5pct
        |FROM t""".stripMargin,
    "profile_table" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name,
        |    COUNT(*) - COUNT(o_orderkey) AS n_null,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
        |    CAST(MAX(o_orderkey) AS DOUBLE) AS max_num FROM orders
        |  UNION ALL SELECT 'o_custkey',
        |    COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
        |  FROM orders
        |  UNION ALL SELECT 'o_totalprice',
        |    COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
        |    MIN(o_totalprice), MAX(o_totalprice) FROM orders
        |  UNION ALL SELECT 'o_orderdate',
        |    COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
        |    CAST(epoch_us(MIN(o_orderdate)) AS DOUBLE),
        |    CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE) FROM orders
        |  UNION ALL SELECT 'o_orderstatus',
        |    COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders)
        |ORDER BY col_name""".stripMargin,
    "olap_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_left_outer" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         |  coalesce(${sql.dsum("o_totalprice")}, 0.0) AS total_spend
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "olap_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n, ${sql.dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "olap_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |  COUNT(*) AS n, ${sql.dsum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY gid, status, priority""".stripMargin,
    "olap_grouping_sets" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  COUNT(*) AS n, ${sql.dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY returnflag, linestatus""".stripMargin,
    "agg_distinct_exact" ->
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS median,
        |  quantile_cont(l_quantity, 0.75) AS q75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
