package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface: scan + filter + projection,
  * hash/broadcast/sort-merge joins, anti/semi joins, window dedup,
  * deterministic sort + limit.
  *
  * Reference parity (SURVEY.md §2): the reference performs these
  * degenerately over file lists and Postgres tables — anti-join of
  * candidate files vs manifest (`load.ts:98-108`), latest-per-group
  * file versioning (`download.ts:48-57`), ordered slices
  * (`utils.ts:19-23`, `load.ts:80-87`). Here they are first-class
  * distributed operators over the testdata star schema.
  *
  * Scale notes (100 TB): only genuinely bounded dimensions (`nation`
  * 25 rows, `region` 5) carry explicit `broadcast()` hints; anything
  * that grows with the corpus (`customer`, `orders`, `lineitem`) is
  * left to the planner/AQE size check so it broadcasts at small SF and
  * shuffles at 100×. Fact-fact joins shuffle on their keys and rely on
  * AQE for skew.
  * Filters and projections are plain Catalyst expressions so pushdown
  * and column pruning reach the parquet scan.
  */
object Relational {

  /** TPC-H Q1 shape: wide aggregate over the largest fact table.
    * Map-side partial aggregation makes this shuffle only |groups| rows
    * per partition — scales linearly at 100 TB. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + narrow projection: both must reach the parquet
    * scan (PushedFilters / ReadSchema in explain). */
  def selectiveFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("2001-09-01").cast("timestamp_ntz") &&
        col("l_returnflag") === "R" && col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** TPC-H Q3 shape: dim ⋈ fact ⋈ fact, grouped revenue, top-k.
    * `customer` carries NO broadcast hint: it grows linearly with the
    * corpus (1.5 M rows/SF; billions at the 100 TB design point), so a
    * forced broadcast would bypass the planner's size guard and OOM at
    * scale. The planner/AQE picks broadcast-hash when the filtered side
    * fits `autoBroadcastJoinThreshold` and shuffle otherwise — exactly
    * the behavior we want at both test SF and 100×. orders⋈lineitem is
    * a shuffle join on orderkey. Tie-break on l_orderkey keeps the
    * limit deterministic. */
  def topRevenue(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp_ntz"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  }

  /** TPC-H Q5 shape: snowflake join, revenue by nation.
    * region→nation→customer→orders→lineitem. The only selective
    * predicate (`r_name = 'ASIA'`) is applied FIRST (VERDICT r7 #1):
    * the ASIA nation-key set is derived by a broadcast join of the two
    * bounded dims (nation 25 rows, region 5 — bounded by construction)
    * and restricts `customer` BEFORE any corpus-sized shuffle, so ~80%
    * of customers never enter the custkey exchange; the restricted
    * orders then meet lineitem on orderkey at ~20% cardinality.
    * Without CBO statistics Catalyst will not reorder this itself —
    * the late-restriction form shuffled all three fact-side tables at
    * full cardinality and dropped 80% two joins later. `customer`
    * itself carries no hint: its join stays under the planner/AQE
    * size check. */
  def regionalRevenue(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(s, d)
      .join(broadcast(asiaNations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = Tables.lineitem(s, d)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  // --- CBO twin of regionalRevenue (VERDICT r7 #5) ---------------

  /** Tables already registered + ANALYZEd per (sfDir): the one-time
    * catalog setup is idempotent and cached per JVM, like the
    * artifact-store fingerprint caches. */
  private val cboReady =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  /** Register the Q5 tables as CATALOG tables over the testdata
    * parquet and compute column statistics — the prerequisite CBO
    * needs (statistics live in the session catalog; a path-based
    * `spark.read.parquet` relation has sizeInBytes only, so the
    * cost-based reorderer can do nothing with it). Guarded loudly
    * against a NANOS-encoded fixture generation: raw catalog tables
    * bypass `Tables`' footer dispatch, and the one thing this repo
    * never does is silently misread a timestamp column. */
  private[graft] def cboTables(s: SparkSession, d: String): Map[String, String] =
    // keyed on the CONTENT fingerprint, not the path: republished
    // fixture data at the same path must re-ANALYZE, or CBO plans
    // against stale statistics (review finding — the same staleness
    // rule every artifact-store consumer follows)
    cboReady.getOrElseUpdate(graft.ArtifactStore.fingerprint(s, d), {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val specs = Seq(
        "region" -> Seq("r_regionkey", "r_name"),
        "nation" -> Seq("n_nationkey", "n_regionkey", "n_name"),
        "customer" -> Seq("c_custkey", "c_nationkey"),
        // NO o_orderdate stats: Spark 4.1's FilterEstimation has no
        // TimestampNTZType case and throws MatchError when a range
        // filter meets column stats on an NTZ column — without them
        // the date filter takes default selectivity, which is enough
        // for the reorder (the decisive stats are the ASIA chain's)
        "orders" -> Seq("o_orderkey", "o_custkey"),
        "lineitem" -> Seq("l_orderkey", "l_extendedprice", "l_discount"))
      specs.map { case (t, cols) =>
        require(graft.Tables.rawNanosCols(s, s"$d/$t.parquet").isEmpty,
          s"CBO catalog table over $t needs MICROS timestamps; the footer " +
            "shows NANOS — route through Tables' dispatch before ANALYZE")
        val name = s"graft_cbo_${t}_$digest"
        s.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet " +
          s"LOCATION '$d/$t.parquet'")
        s.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS " +
          s"FOR COLUMNS ${cols.mkString(", ")}")
        t -> name
      }.toMap
    })

  /** Run `body` with the cost-based optimizer + its join reorderer
    * enabled, restoring the session's previous values after. Scoped —
    * CBO must not silently re-plan the rest of the catalog. */
  private[graft] def withCbo[T](s: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> s.conf.get(k))
    keys.foreach(s.conf.set(_, "true"))
    try body finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }

  /** The Q5 join in its NAIVE order — the exact late-restriction
    * shape [[regionalRevenue]] had before r8's hand fix, over the
    * ANALYZEd catalog tables, with ZERO hints. Callers wrap it in
    * [[withCbo]]; the point is that statistics + the cost-based
    * reorderer produce the early-restricted plan WITHOUT the hand
    * reordering (the engine-credit version of the r8 fix — asserted
    * in PlanInvariantsSpec). */
  private[graft] def cboRegionalFrame(s: SparkSession, d: String): DataFrame = {
    val t = cboTables(s, d)
    val r = s.table(t("region")).filter(col("r_name") === "ASIA")
    val n = s.table(t("nation"))
    val c = s.table(t("customer"))
    val o = s.table(t("orders"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = s.table(t("lineitem"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Graded CBO query: identical semantics (and oracle) to
    * [[regionalRevenue]], but the plan quality comes from ANALYZE
    * statistics + cost-based join reordering instead of hand-ordered
    * joins. Executed EAGERLY inside the CBO conf scope (plans
    * optimize at action time, so returning a lazy frame would
    * optimize after the confs are restored); the checkpointed result
    * is re-sorted for the deterministic output contract. */
  def regionalRevenueCbo(s: SparkSession, d: String): DataFrame =
    withCbo(s) { cboRegionalFrame(s, d).localCheckpoint(true) }
      .orderBy(col("n_name"))

  /** Anti-join: customers with no order over 300k — the reference's
    * files-vs-manifest "skip already loaded" shape (`load.ts:98-108`). */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Semi-join (EXISTS): customers with at least one urgent open order. */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Latest-per-group (W1, `download.ts:48-57`): newest order per
    * customer via row_number window, deterministic tie-break. */
  def latestPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** Top-N per group: 3 largest orders per customer (window + filter). */
  def topNPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Ordered slice (O1/L1): deterministic multi-key sort + limit. */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(25)

  /** Point lookup on key (P7 manifest lookup shape). */
  def pointLookup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") === 42)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))

  /** Set ops: UNION (distinct) / EXCEPT / INTERSECT. Key-arithmetic
    * membership keeps all three branches non-empty at every SF (the
    * segment-based version degenerated to 0 rows — every nation
    * appears in every segment once there are >100 customers). */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val threes = c.filter(col("c_custkey") % 3 === 0)
    val fives = c.filter(col("c_custkey") % 5 === 0)
    val fifteens = c.filter(col("c_custkey") % 15 === 0)
    threes.union(fives).distinct()
      .exceptAll(fifteens)
      .intersect(c.filter(col("c_custkey") % 2 === 0))
      .orderBy(col("c_custkey"))
  }

  /** Reproducible sampling at scale: hash-systematic ~5% sample via an
    * md5 prefix on the key — unlike `TABLESAMPLE`/`df.sample`, the
    * selected set is a pure function of the data (same rows on any
    * cluster, any partitioning, any engine — the oracle proves it). */
  def systematicSample(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "0d")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Stratified variant of [[systematicSample]]: per-stratum rates —
    * the corpus-rebalancing shape (downsample the dominant language
    * hard, keep the rest), the first step of most LLM data mixes.
    * Same md5-prefix mechanism, so the selected set is a pure function
    * of the data and the oracle reproduces it row-for-row: en is kept
    * at 32/256 ≈ 12.5%, every other language at 128/256 = 50%. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <
        when(col("lang") === "en", lit("20")).otherwise(lit("80")))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Window frames: per-customer running revenue ordered by date —
    * the frame-spec window surface (extension beyond reference W1). */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(D18_2)).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Ratio-to-report: each nation's share of its REGION's revenue —
    * the window-over-aggregate OLAP shape (share-of-total within a
    * partition) the window family didn't yet cover. One aggregation
    * to nation grain, then a partition-window sum at |nations| = 25
    * rows — the window runs over the AGGREGATE, never the fact table,
    * which is what keeps ratio-to-report cheap at any scale. Shares
    * divide two exact decimal-summed doubles and round(9) (the
    * stat_corr discipline), so the oracle matches bit-for-bit. */
  def ratioToReport(s: SparkSession, d: String): DataFrame = {
    val nationRev = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice").cast(D18_2)).as("rev"))
    val w = Window.partitionBy(col("r_name"))
    nationRev
      .withColumn("region_rev", sum(col("rev")).over(w))
      .select(col("r_name"), col("n_name"),
        col("rev").cast("double").as("nation_revenue"),
        col("region_rev").cast("double").as("region_revenue"),
        round(col("rev").cast("double") /
          col("region_rev").cast("double"), 9).as("share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Supplier-side snowflake: supplier ⋈ nation ⋈ region rollup. */
  def supplierStats(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"))

  /** X10 shuffle parity: the same join forced through sort-merge (no
    * broadcast) must produce identical results — exercises the
    * exchange-based join path the 100 TB fact⋈fact case uses. */
  def shuffleJoinParity(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).hint("merge")
      .join(Tables.lineitem(s, d).hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** Skew-salted join surfaced as a graded query: the same
    * orders ⋈ customer market-segment rollup as a plain join, but
    * executed through `etl.Skew.saltedJoin` — the hot-key tool when
    * one join key dominates so heavily that AQE's skew splitting
    * can't help (AQE splits partitions, not a single key's hash
    * bucket). The salt is internal (the derived (key, salt) join key
    * never escapes the operator), so the oracle is the PLAIN SQL
    * join — grading that the rewrite is semantics-preserving, the
    * property that makes salting safe to deploy at 100 TB. */
  def saltedJoinParity(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    graft.etl.Skew.saltedJoin(o, c, "o_custkey", 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  // --- AQE skew-join twin of saltedJoinParity (VERDICT r8 #1) ------

  /** Deliberately SKEWED fact side for the AQE twin: every even
    * orderkey is redirected to customer 1, so one join key carries
    * half the fact table — the per-state file-size disparity of the
    * reference (CA vs WY) as a join-key hot spot. Deterministic
    * derivation (pure function of the row), so the DuckDB oracle
    * replays the same skew. [[saltedJoinParity]] keeps the NATURAL
    * keys: it grades that the salting rewrite preserves semantics;
    * this frame exists to give the engine a real hot key to split. */
  private[graft] def skewedOrders(s: SparkSession, d: String): DataFrame =
    // fanOut matters here beyond CPU spreading: AQE splits a skewed
    // reduce partition at MAP-OUTPUT boundaries
    // (ShufflePartitionsUtil.createSkewPartitionSpecs groups map
    // ranges), so a single-row-group local scan = ONE map task is
    // atomically unsplittable no matter how skewed — probed: the rule
    // found the 102 KB hot partition but createSkewPartitionSpecs
    // returned None. At 100 TB the scan has thousands of map tasks
    // and this is a no-op (fanOut's documented contract).
    fanOut(Tables.orders(s, d).select(
      when(col("o_orderkey") % 2 === 0, lit(1L))
        .otherwise(col("o_custkey")).as("j_custkey"),
      col("o_totalprice")))

  /** Run `body` with AQE skew-join splitting armed for the small-SF
    * regime, broadcast disabled (at 100 TB neither side broadcasts —
    * the shuffle path is the one under test), restoring previous
    * session values after — the [[withCbo]] scoping discipline.
    * Thresholds: the defaults (256 MB / factor 5) are sized for
    * production shuffles and can never trigger on test-SF partitions,
    * so the scope arms factor 2 + 16 KB — the decision RULE is the
    * engine's, only its scale constants are tuned to the fixture,
    * exactly like shuffle.partitions=32 for local[32]. */
  private[graft] def withSkewAqe[T](s: SparkSession)(body: => T): T =
    withConfs(s,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)

  /** The skewed join with ZERO hand mitigation — no salt, no hints:
    * the engine-credit half of the skew story. Callers wrap it in
    * [[withSkewAqe]]; AQE detects the hot partition at runtime from
    * map-output sizes and splits it across tasks
    * (OptimizeSkewedJoin), which is the mechanism that handles
    * MODERATE runtime skew at 100 TB without code changes — hand
    * salting ([[saltedJoinParity]]) remains for the single-key-
    * exceeds-an-executor regime AQE cannot split. Asserted in
    * PlanInvariantsSpec: the executed plan must carry a skew=true
    * join. */
  private[graft] def skewAqeFrame(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    skewedOrders(s, d)
      .join(c, col("j_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
  }

  /** Graded AQE-skew query: identical semantics to the plain SQL
    * replay of the skewed join (the [[saltedJoinParity]] parity
    * contract — the mitigation must be invisible in results).
    * Executed EAGERLY inside the conf scope (AQE reads its confs at
    * action time — the [[regionalRevenueCbo]] discipline). */
  def skewAqeParity(s: SparkSession, d: String): DataFrame =
    withSkewAqe(s) { skewAqeFrame(s, d).localCheckpoint(true) }
      .orderBy(col("c_mktsegment"))

  // --- runtime Bloom-filter join (engine credit, r9) ---------------

  /** Run `body` with Spark's RUNTIME Bloom-filter injection armed for
    * the small-SF regime and broadcast disabled (at 100 TB neither
    * side of a fact⋈fact broadcasts; runtime filters exist precisely
    * for the shuffle-join case a broadcast would trivialize). The
    * application-side scan threshold defaults to 10 GB — sized for
    * production scans, unreachable at test SF — so the scope arms it
    * at 0; the creation-side threshold and the decision rule stay the
    * engine's. [[withSkewAqe]] scoping discipline. */
  private[graft] def withRuntimeBloom[T](s: SparkSession)(body: => T): T =
    withConfs(s,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)

  /** The brand-filtered part ⋈ lineitem revenue rollup with ZERO
    * hand-written semi-join reduction — the engine-credit face of
    * runtime row pruning, completing the family (CBO = statistics,
    * AQE = skew, DPP = partitions, runtime Bloom = rows): Spark's
    * InjectRuntimeFilter sees the selective dim filter
    * (`p_brand = 'Brand#12'`, 1/25), builds a Bloom filter over the
    * surviving join keys as a scalar subquery, and plants
    * `might_contain(l_partkey)` on the PROBE side scan, so ~96 % of
    * lineitem rows die at the scan instead of crossing the shuffle —
    * the semi-join reduction a 100 TB fact⋈dim shuffle join lives
    * by. Plan-asserted in PlanInvariantsSpec (with the unarmed
    * control); the filter is a pure optimization, so the oracle is
    * the plain SQL join. Executed eagerly inside the conf scope
    * ([[regionalRevenueCbo]] discipline). */
  private[graft] def runtimeBloomFrame(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#12")
      .select(col("p_partkey"), col("p_type"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
  }

  def runtimeBloomJoin(s: SparkSession, d: String): DataFrame =
    withRuntimeBloom(s) { runtimeBloomFrame(s, d).localCheckpoint(true) }
      .orderBy(col("p_type"))

  // --- AQE partition coalescing (engine credit, r9) ----------------

  /** Run `body` with AQE's post-shuffle partition coalescing armed in
    * its SIZE-TARGET regime: `parallelismFirst=false` makes the rule
    * honor `advisoryPartitionSizeInBytes` — the production setting
    * (Spark's own docs recommend it on busy clusters); the default
    * `true` fills local parallelism instead, a dev convenience that
    * under-sizes reducers at scale. [[withSkewAqe]] scoping
    * discipline: previous session values restored after. */
  private[graft] def withCoalesceAqe[T](s: SparkSession)(body: => T): T =
    withConfs(s,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")(body)

  /** A rollup whose static 32 shuffle partitions each carry a few KB —
    * the shape that leaves 31 near-empty reduce tasks without AQE.
    * Exposed unsorted for the plan test ([[skewAqeFrame]] pattern). */
  private[graft] def coalesceAqeFrame(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))

  /** AQE partition-COALESCING engine credit, completing the adaptive
    * family (CBO = statistics, skew AQE = hot keys, DPP = partitions,
    * runtime Bloom = rows; this = reducer COUNT): the engine observes
    * actual map-output sizes at the shuffle boundary and merges
    * under-filled reduce partitions up to the advisory size, so
    * reducer count tracks DATA VOLUME, not the static
    * `shuffle.partitions` guess. At 100 TB this is the mechanism that
    * lets one cluster-wide partition setting serve both a 2 TB and a
    * 2 GB stage without hand-tuning — the inverse problem of skew
    * (too few bytes per task, not too many). Plan-asserted in
    * PlanInvariantsSpec: the final adaptive plan's shuffle read must
    * be `AQEShuffleRead coalesced`, with a coalescing-disabled
    * control. Coalescing is a pure optimization, so the oracle is the
    * plain SQL rollup. Executed eagerly inside the conf scope (AQE
    * reads its confs at action time — [[regionalRevenueCbo]]
    * discipline). */
  def aqeCoalesce(s: SparkSession, d: String): DataFrame =
    withCoalesceAqe(s) { coalesceAqeFrame(s, d).localCheckpoint(true) }
      .orderBy(col("o_orderpriority"))

  // --- parquet aggregate pushdown (engine credit, r9) ---------------

  /** Run `body` with parquet AGGREGATE pushdown armed: MIN/MAX/COUNT
    * with no filter and no grouping are answered from row-group
    * FOOTER statistics — zero data pages read. Two confs because the
    * capability lives in the V2 datasource path only: parquet is
    * removed from the V1 fallback list, and the pushdown itself is
    * opt-in (`spark.sql.parquet.aggregatePushdown`, default false —
    * footer stats can be absent/wrong for externally written files;
    * ours are Spark-written). [[withSkewAqe]] scoping discipline. */
  private[graft] def withAggPushdown[T](s: SparkSession)(body: => T): T =
    withConfs(s,
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")(body)

  /** The whole-table profile frame: global COUNT/MIN/MAX over orders.
    * Exposed for the plan test ([[skewAqeFrame]] pattern).
    *
    * Reads the parquet DIRECTLY, not through [[Tables.orders]]: both
    * armed confs act at SOURCE-RESOLUTION time (V1-fallback-list
    * membership and the pushdown capability are baked into the
    * resolved relation), and Tables' session relation cache (r15)
    * would serve a relation resolved OUTSIDE the armed scope — the
    * one caller pattern that must not share a cached relation. The
    * aggregate touches only pruned numeric columns, so the
    * timestamp-normalization wrapper is irrelevant here. */
  private[graft] def aggPushdownFrame(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/orders.parquet").agg(
      count(lit(1)).as("n_orders"),
      min(col("o_orderkey")).as("min_key"),
      max(col("o_orderkey")).as("max_key"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))

  /** Parquet FOOTER-STATS aggregate pushdown engine credit: the
    * global COUNT/MIN/MAX profile is answered from row-group metadata
    * — the scan's `PushedAggregation` list carries the aggregates and
    * no data page is decoded (plan-asserted with an unarmed control
    * in PlanInvariantsSpec). At 100 TB this turns the monitoring
    * queries every pipeline runs constantly (row counts, key ranges,
    * freshness checks — the reference's count-reconciliation class,
    * `load.ts:330-352`) from full-table scans into pure metadata
    * reads: ~10⁵ footer reads instead of 100 TB of pages. The
    * pushdown is a pure optimization, so the oracle is the plain SQL
    * aggregate. Executed eagerly inside the conf scope
    * ([[regionalRevenueCbo]] discipline). */
  def aggPushdown(s: SparkSession, d: String): DataFrame =
    withAggPushdown(s) { aggPushdownFrame(s, d).localCheckpoint(true) }

  /** P8/P9: deterministic pagination — rows [100, 120) of the
    * o_orderkey total order, the batch analog of the reference's
    * --start/--resume.
    *
    * Keyset form, not a global window: `row_number() OVER (ORDER BY
    * key)` with no partitionBy funnels every row through ONE task
    * (Spark warns about exactly this). Instead (1) find the page
    * bound — the 100th key — with a distributed top-k
    * (TakeOrderedAndProject: per-partition heads, tiny driver merge),
    * then (2) `key > bound ORDER BY key LIMIT 20`, which is sargable:
    * the literal bound is pushed into the parquet scan and the limit
    * is again top-k. In steady-state resume the caller carries the
    * last key of the previous page, so step (1) disappears entirely. */
  def rangeSlice(s: SparkSession, d: String): DataFrame = {
    val key = col("o_orderkey")
    val bound = Tables.orders(s, d).select(key).orderBy(key).limit(100)
      .agg(max(key)).head().get(0)
    Tables.orders(s, d)
      .filter(if (bound == null) lit(true) else key > lit(bound))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(key)
      .limit(20)
  }

  /** S8/A1: per-table row counts — the count-reconciliation scan.
    * A bare `count(lit(1))` aggregate over the raw scan reads ZERO
    * columns: the vectorized parquet reader answers it from row-group
    * metadata (the earlier `select(lit(t)).groupBy(...)` form
    * materialized and hash-grouped every row — 11 s for what footers
    * answer in milliseconds). `events` still goes through its
    * ns-timestamp-aware reader for schema compatibility; the ts
    * projection is pruned away under the count. */
  def rowCounts(s: SparkSession, d: String): DataFrame = {
    val counted = Tables.all.map { t =>
      // all tables read through the footer-dispatching normalized
      // reader (Tables.normalizeTimestamps) — no per-table special case
      val df = Tables.table(s, d, t)
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("tbl"), col("n_rows"))
    }
    counted.reduce(_ unionByName _).orderBy(col("tbl"))
  }

  /** Generic band (range) join: match each fact row to the band whose
    * `[lo, hi)` interval contains `value` — WITHOUT the
    * BroadcastNestedLoopJoin a naive non-equi join plans to. Bands are
    * exploded to the fixed-width key buckets they overlap; the fact
    * side computes its bucket with one `floor`, equi-joins (hash,
    * broadcast for a small band table), and an exact range filter
    * removes bucket-edge false positives. This is the standard
    * interval-bucketing reduction: non-equi → equi + residual filter,
    * which keeps the 100 TB side in a codegen'd hash join instead of
    * an O(n·bands) loop join. */
  def bandJoin(fact: DataFrame, value: org.apache.spark.sql.Column,
      bands: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    // degenerate bands ([lo, hi) with hi <= lo) match nothing — and
    // would reverse the bucket sequence; the upper bucket uses hi
    // itself (exclusive bound, possibly fractional): at most one
    // extra bucket whose false positives the exact filter removes
    val exploded = bands
      .filter(col(hiCol).cast("double") > col(loCol).cast("double"))
      .withColumn("_band_bucket",
        explode(sequence(
          floor(col(loCol).cast("double") / bucketWidth).cast("long"),
          floor(col(hiCol).cast("double") / bucketWidth).cast("long"))))
    fact
      .withColumn("_band_bucket",
        floor(value.cast("double") / bucketWidth).cast("long"))
      .join(broadcast(exploded), Seq("_band_bucket"))
      .filter(value >= col(loCol).cast("double") &&
        value < col(hiCol).cast("double"))
      .drop("_band_bucket")
  }

  /** Order-value histogram over non-uniform price bands via
    * [[bandJoin]] — count + exact revenue per band. */
  def priceBands(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("b0_lt1k", 0L, 1000L), ("b1_1k_5k", 1000L, 5000L),
      ("b2_5k_20k", 5000L, 20000L), ("b3_20k_60k", 20000L, 60000L),
      ("b4_60k_150k", 60000L, 150000L),
      ("b5_150k_400k", 150000L, 400000L),
      ("b6_ge400k", 400000L, 600000L))
      .toDF("band", "lo", "hi")
    bandJoin(Tables.orders(s, d), col("o_totalprice"), bands,
        "lo", "hi", bucketWidth = 50000L)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("band"))
  }

  /** Per-group uniform sample via the bottom-k-by-hash sketch: keep
    * the k docs with the smallest md5 values per source. Reuses
    * [[graft.functions.TopKAggregator]] (score = negated hash), so
    * each partition holds at most k candidates per group and partials
    * merge k-vs-k — a mergeable SAMPLING sketch with the same scale
    * shape as top-k search, vs. the window formulation that sorts
    * every row. The hash is the first 12 hex chars (48 bits — exact
    * in a Double) of md5(doc_id): deterministic, uniform, and
    * order-preserving vs the oracle's lexicographic hex sort. */
  def bottomKSample(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(k))
    Tables.documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long"))
      .groupBy(col("source"))
      .agg(topk((-col("h")).cast("double"), col("doc_id")).as("picked"))
      .select(col("source"), posexplode(col("picked")).as(Seq("pos", "sc")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
        col("sc.id").as("doc_id"))
      .orderBy(col("source"), col("rank"))
  }

  /** Full-outer join with side classification — the reconciliation
    * shape (both / left-only / right-only) completing the join-type
    * surface next to inner/left/semi/anti. One shuffle on the key;
    * the BUILDING filter makes both null sides non-empty. */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .withColumn("side",
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull,
          "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("orders_only"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("n_orders"), lit(0L))).as("sum_orders"))
      .orderBy(col("side"))
  }

  /** Relational DIVISION (the textbook "for-all" operator): customers
    * whose orders span EVERY priority class present in the corpus —
    * x ÷ y where x = (custkey, priority) and y = the priority domain.
    * Division is the one classic relational-algebra operator with no
    * direct SQL keyword; the standard reduction is the distinct-count
    * equality below (the double-NOT-EXISTS form is its worst-case
    * plan — two correlated anti-joins — where this is ONE partial-agg
    * shuffle at the customer grain).
    *
    * The divisor cardinality is a driver scalar off a dictionary-
    * sized aggregate (the sanctioned shape); at 100 TB the priority
    * domain is still 5 values — divisors are dictionary-sized by
    * construction or division is the wrong operator. */
  def relationalDivision(s: SparkSession, d: String): DataFrame = {
    val universe = Tables.orders(s, d)
      .agg(countDistinct(col("o_orderpriority"))).head().getLong(0)
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .filter(col("n_priorities") === universe)
      .select(col("o_custkey"), col("n_orders"))
      .orderBy(col("o_custkey"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE order days per
    * customer — the continuity/streak operator (active-streak,
    * uptime-run, sensor-gap analyses are all this shape). The classic
    * reduction: within a customer, day − row_number(day) is constant
    * exactly along a consecutive run, so grouping on that anchor
    * materializes the islands without any self-join or recursion.
    * Day arithmetic is integer (days since epoch via datediff from a
    * fixed date); windows partition on the customer key over that
    * customer's DISTINCT days (basket-bounded). Two partial-agg
    * shuffles on the same key — co-partitioned at 100×. */
  def gapsIslands(s: SparkSession, d: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
    val days = Tables.orders(s, d)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date"))
          .cast("long").as("day"))
      .distinct()
    val islands = days
      .withColumn("anchor",
        col("day") - row_number().over(byCust).cast("long"))
      .groupBy(col("o_custkey"), col("anchor"))
      .agg(count(lit(1)).as("run_len"))
    islands.groupBy(col("o_custkey"))
      .agg(sum(col("run_len")).as("n_days"),
        count(lit(1)).as("n_islands"),
        max(col("run_len")).as("longest_run"))
      .orderBy(col("o_custkey"))
  }

  /** REFERENTIAL-INTEGRITY AUDIT — the ingest-time FK check every
    * lake runs before publishing a snapshot: one row per foreign-key
    * edge of the star schema with the child cardinality and the
    * orphan count (child keys with no parent). The fixtures are
    * FK-valid by construction, so every true edge reports zero
    * orphans — which alone would grade vacuously. Two controls make
    * the audit falsifiable: a per-edge DISTINCT child-key count
    * (corpus-dependent nonzero — a join that drops or duplicates
    * rows corrupts it), and a segment-restricted CONFORMANCE arm
    * (`orders → customer[AUTOMOBILE]`) whose orphan count is large
    * and nonzero — the same LEFT JOIN + null-count machinery graded
    * against values a broken orphan counter cannot fake.
    *
    * Shape per edge: child scan → LEFT JOIN the DISTINCT parent key
    * set → one partial-agg count. Only FIXED-cardinality parents
    * (nation: 25 rows, region: 5 — they do not grow with the corpus)
    * carry a broadcast() hint; every corpus-scaling parent (orders,
    * customer, part, supplier — distinct o_orderkey is fact-sized at
    * 100 TB) carries NO hint, so the planner/AQE broadcasts them at
    * small SF and shuffles them at scale. A forced broadcast of a
    * billion-key parent is a driver OOM; the hint discipline here is
    * the same round-3 rule SCALE.md records for customer joins, now
    * enforced by PlanInvariantsSpec's attribute-name guard. NULL
    * child keys count as orphans in both engines (no match under
    * either join). The 8 single-row aggregates union into the
    * report. */
  def fkAudit(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String,
        fixedSizeParent: Boolean = false): DataFrame = {
      val keys = parent.select(col(pkey).as("__pk")).distinct()
      val p = if (fixedSizeParent) broadcast(keys) else keys
      // aggregate the child BEFORE the join (guide §2.3): the join
      // input shrinks from every child row to one (key, count) row per
      // distinct key — at fact scale that is the difference between
      // shuffling the fact table and shuffling its key domain — and
      // the joined-frame countDistinct (a second, Expand-style
      // distinct aggregation over |child| joined rows) collapses into
      // a plain count over the already-distinct groups. Counts are
      // per-key exact, so every output is unchanged: n_child = Σ
      // group counts, n_distinct = non-null groups, orphans carry
      // their group's row count (a NULL child key matches nothing
      // under either formulation and stays an orphan).
      val ck = child.select(col(key).as("__ck"))
        .groupBy(col("__ck")).agg(count(lit(1)).as("__n"))
      ck.join(p, col("__ck") === col("__pk"), "left")
        .agg(sum(col("__n")).as("n_child"),
          count(col("__ck")).as("n_distinct"),
          sum(when(col("__pk").isNull, col("__n")).otherwise(0L))
            .as("n_orphans"))
        .select(lit(name).as("edge"), col("n_child"), col("n_distinct"),
          col("n_orphans"))
    }
    Seq(
      edge("customer.c_nationkey->nation", Tables.customer(s, d),
        "c_nationkey", Tables.nation(s, d), "n_nationkey",
        fixedSizeParent = true),
      edge("events.user_id->customer", Tables.events(s, d),
        "user_id", Tables.customer(s, d), "c_custkey"),
      edge("lineitem.l_orderkey->orders", Tables.lineitem(s, d),
        "l_orderkey", Tables.orders(s, d), "o_orderkey"),
      edge("lineitem.l_partkey->part", Tables.lineitem(s, d),
        "l_partkey", Tables.part(s, d), "p_partkey"),
      edge("lineitem.l_suppkey->supplier", Tables.lineitem(s, d),
        "l_suppkey", Tables.supplier(s, d), "s_suppkey"),
      edge("nation.n_regionkey->region", Tables.nation(s, d),
        "n_regionkey", Tables.region(s, d), "r_regionkey",
        fixedSizeParent = true),
      edge("orders.o_custkey->customer", Tables.orders(s, d),
        "o_custkey", Tables.customer(s, d), "c_custkey"),
      // conformance arm (non-vacuity control): restrict the parent
      // domain to one segment; the "orphans" are orders from outside
      // it — large and nonzero, so the orphan counter is graded
      // against real values
      edge("orders.o_custkey->customer[AUTOMOBILE]",
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE"),
        "c_custkey"))
      .reduce(_ unionByName _)
      .orderBy(col("edge"))
  }

  /** PRIMARY-KEY UNIQUENESS AUDIT — [[fkAudit]]'s companion and the
    * other half of the pre-publish constraint check: one row per
    * declared key with the row count, distinct-key count, and
    * duplicate surplus. Every declared key in the fixtures IS unique
    * (zero surplus), so the audit carries a labeled NON-VACUITY
    * control: `lineitem.l_orderkey[as-PK]` treats a deliberately
    * non-unique column as a key and must report its large surplus —
    * the counter is graded against values it cannot fake. One
    * partial-agg scan per table (countDistinct rides the same
    * aggregate); composite keys count distinct over the column
    * tuple. */
  def pkAudit(s: SparkSession, d: String): DataFrame = {
    def arm(name: String, t: DataFrame, keys: Seq[String]): DataFrame =
      t.agg(count(lit(1)).as("n_rows"),
          countDistinct(keys.head, keys.tail: _*).as("n_distinct"))
        .select(lit(name).as("pk"), col("n_rows"), col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("n_dups"))
    Seq(
      arm("customer.c_custkey", Tables.customer(s, d), Seq("c_custkey")),
      arm("documents.doc_id", Tables.documents(s, d), Seq("doc_id")),
      arm("embeddings.vec_id", Tables.embeddings(s, d), Seq("vec_id")),
      arm("events.event_id", Tables.events(s, d), Seq("event_id")),
      arm("lineitem.(l_orderkey,l_linenumber)", Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber")),
      // non-vacuity control: a key that is NOT unique, by design
      arm("lineitem.l_orderkey[as-PK]", Tables.lineitem(s, d),
        Seq("l_orderkey")),
      arm("nation.n_nationkey", Tables.nation(s, d), Seq("n_nationkey")),
      arm("orders.o_orderkey", Tables.orders(s, d), Seq("o_orderkey")),
      arm("part.p_partkey", Tables.part(s, d), Seq("p_partkey")),
      arm("region.r_regionkey", Tables.region(s, d), Seq("r_regionkey")),
      arm("supplier.s_suppkey", Tables.supplier(s, d), Seq("s_suppkey")))
      .reduce(_ unionByName _)
      .orderBy(col("pk"))
  }

  private val PivotPriorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Explicit PIVOT — the wide-matrix report every BI layer emits:
    * revenue by market segment (rows) × order priority (columns).
    * The pivot VALUE LIST is pinned ([[PivotPriorities]]): Spark's
    * `pivot(col, values)` with explicit values skips the extra
    * distinct-scan AND fixes the output schema — a values-less pivot
    * derives columns from a collect at plan time, which at 100 TB is
    * a full scan before planning even starts and a schema that
    * changes under the consumer whenever a new value appears. The
    * customer join carries NO broadcast hint — customer grows with
    * the corpus (the round-3 SCALE.md rule), so the planner/AQE
    * broadcasts it at small SF and shuffles on the key at 100 TB —
    * then one partial-agg shuffle; absent cells
    * surface as NULL (no order of that priority in that segment), the
    * same NULL the oracle's FILTERed sums produce. Exact-decimal
    * sums, one cast to double per cell. */
  def pivotWide(s: SparkSession, d: String): DataFrame = {
    val joined = Tables.orders(s, d)
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    joined.groupBy(col("c_mktsegment"))
      .pivot("o_orderpriority", PivotPriorities)
      .agg(graft.ops.dsum(col("o_totalprice")))
      .orderBy(col("c_mktsegment"))
  }

  /** NTILE quartiles — the bucketed-ranking window member the family
    * still lacked (latest/topn/running/ratio cover the others): each
    * segment's customers quartiled by account balance, then
    * per-(segment, quartile) stats. ntile is POSITION-based, so the
    * window's ORDER BY carries a full tie-break (acctbal, custkey) —
    * without it two engines may split equal balances across quartile
    * boundaries differently and the hash gate catches it. Window
    * partitions on the segment (never global); one partial-agg
    * shuffle after. Balances go through exact cents for the sums. */
  def ntileQuartiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(round(col("c_acctbal") * 100).cast("long")).cast("double") /
          100.0).as("sum_bal"),
        min(col("c_custkey")).as("min_key"),
        max(col("c_custkey")).as("max_key"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_ntile_quartiles" -> ntileQuartiles,
    "agg_pivot_wide" -> pivotWide,
    "quality_pk_audit" -> pkAudit,
    "quality_fk_audit" -> fkAudit,
    "window_gaps_islands" -> gapsIslands,
    "join_relational_division" -> relationalDivision,
    "join_range_bands" -> priceBands,
    "sample_bottomk_per_group" -> ((s, d) => bottomKSample(s, d)),
    "join_full_outer" -> fullOuter,
    "join_supplier_stats" -> supplierStats,
    "join_shuffle_parity" -> shuffleJoinParity,
    "join_salted_parity" -> saltedJoinParity,
    "join_skew_aqe_parity" -> skewAqeParity,
    "join_runtime_bloom" -> runtimeBloomJoin,
    "agg_aqe_coalesce" -> aqeCoalesce,
    "scan_agg_pushdown" -> aggPushdown,
    "filter_range_slice" -> rangeSlice,
    "scan_row_counts" -> rowCounts,
    "agg_pricing_summary" -> pricingSummary,
    "filter_selective" -> selectiveFilter,
    "join_top_revenue" -> topRevenue,
    "join_regional_revenue" -> regionalRevenue,
    "join_regional_revenue_cbo" -> regionalRevenueCbo,
    "join_anti" -> antiJoin,
    "join_semi" -> semiJoin,
    "window_latest_per_group" -> latestPerGroup,
    "window_topn_per_group" -> topNPerGroup,
    "window_running_total" -> runningTotal,
    "window_ratio_to_report" -> ratioToReport,
    "sort_limit" -> sortLimit,
    "filter_point_lookup" -> pointLookup,
    "setop_union_except" -> setOps,
    "sample_systematic" -> systematicSample,
    "sample_stratified" -> stratifiedSample,
  )

  /** One UNION ALL arm per FK edge, identical LEFT JOIN + orphan
    * count semantics (NULL child keys orphan under both engines). */
  private def fkEdgeSql(name: String, child: String, key: String,
      parent: String, pkey: String): String =
    s"""SELECT '$name' AS edge, COUNT(*) AS n_child,
       |  COUNT(DISTINCT c.$key) AS n_distinct,
       |  CAST(SUM(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_orphans
       |FROM $child c LEFT JOIN
       |  (SELECT DISTINCT $pkey AS __pk FROM $parent) p
       |  ON c.$key = p.__pk""".stripMargin

  private def pkArmSql(name: String, table: String,
      keys: Seq[String]): String = {
    val tuple = if (keys.size == 1) keys.head
      else keys.mkString("(", ", ", ")")
    s"""SELECT '$name' AS pk, COUNT(*) AS n_rows,
       |  COUNT(DISTINCT $tuple) AS n_distinct,
       |  COUNT(*) - COUNT(DISTINCT $tuple) AS n_dups
       |FROM $table""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // identical fully-tie-broken window order, exact-cents sums
    "window_ntile_quartiles" ->
      """WITH q AS (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
        |  CAST(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 100.0 AS sum_bal,
        |  MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        |FROM q GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin,
    // conditional aggregation with the identical pinned value list;
    // FILTER sums return NULL for empty cells like Spark's pivot
    "agg_pivot_wide" -> {
      val cells = PivotPriorities.map { p =>
        s"""  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           |    FILTER (WHERE o_orderpriority = '$p') AS DOUBLE)
           |    AS "$p"""".stripMargin
      }.mkString(",\n")
      s"""SELECT c_mktsegment,
         |$cells
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    },
    "quality_pk_audit" -> (Seq(
      pkArmSql("customer.c_custkey", "customer", Seq("c_custkey")),
      pkArmSql("documents.doc_id", "documents", Seq("doc_id")),
      pkArmSql("embeddings.vec_id", "embeddings", Seq("vec_id")),
      pkArmSql("events.event_id", "events", Seq("event_id")),
      pkArmSql("lineitem.(l_orderkey,l_linenumber)", "lineitem",
        Seq("l_orderkey", "l_linenumber")),
      pkArmSql("lineitem.l_orderkey[as-PK]", "lineitem",
        Seq("l_orderkey")),
      pkArmSql("nation.n_nationkey", "nation", Seq("n_nationkey")),
      pkArmSql("orders.o_orderkey", "orders", Seq("o_orderkey")),
      pkArmSql("part.p_partkey", "part", Seq("p_partkey")),
      pkArmSql("region.r_regionkey", "region", Seq("r_regionkey")),
      pkArmSql("supplier.s_suppkey", "supplier", Seq("s_suppkey")))
      .mkString("\nUNION ALL\n") + "\nORDER BY pk"),
    "quality_fk_audit" -> (Seq(
      fkEdgeSql("customer.c_nationkey->nation", "customer",
        "c_nationkey", "nation", "n_nationkey"),
      fkEdgeSql("events.user_id->customer", "events",
        "user_id", "customer", "c_custkey"),
      fkEdgeSql("lineitem.l_orderkey->orders", "lineitem",
        "l_orderkey", "orders", "o_orderkey"),
      fkEdgeSql("lineitem.l_partkey->part", "lineitem",
        "l_partkey", "part", "p_partkey"),
      fkEdgeSql("lineitem.l_suppkey->supplier", "lineitem",
        "l_suppkey", "supplier", "s_suppkey"),
      fkEdgeSql("nation.n_regionkey->region", "nation",
        "n_regionkey", "region", "r_regionkey"),
      fkEdgeSql("orders.o_custkey->customer", "orders",
        "o_custkey", "customer", "c_custkey"),
      fkEdgeSql("orders.o_custkey->customer[AUTOMOBILE]", "orders",
        "o_custkey",
        "(SELECT * FROM customer WHERE c_mktsegment = 'AUTOMOBILE')",
        "c_custkey"))
      .mkString("\nUNION ALL\n") + "\nORDER BY edge"),
    // same day - row_number anchor; DuckDB date_diff('day', ...)
    // equals Spark datediff on the same DATE values
    "window_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT o_custkey,
        |    date_diff('day', DATE '1990-01-01',
        |      CAST(o_orderdate AS DATE)) AS day
        |  FROM orders),
        |anch AS (SELECT o_custkey, day,
        |    day - row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY day) AS anchor
        |  FROM days),
        |runs AS (SELECT o_custkey, anchor, COUNT(*) AS run_len
        |  FROM anch GROUP BY 1, 2)
        |SELECT o_custkey, CAST(SUM(run_len) AS BIGINT) AS n_days,
        |  COUNT(*) AS n_islands,
        |  CAST(MAX(run_len) AS BIGINT) AS longest_run
        |FROM runs GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // same distinct-count-equality reduction; the divisor cardinality
    // is a scalar subquery where the engine collects a scalar
    "join_relational_division" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(DISTINCT o_orderpriority) =
        |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY o_custkey""".stripMargin,
    "join_salted_parity" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    // plain SQL aggregate: answering from footer stats instead of
    // data pages is a pure optimization, invisible in results
    "scan_agg_pushdown" ->
      """SELECT COUNT(*) AS n_orders,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders""".stripMargin,
    // plain SQL rollup: the reducer-count coalescing is a pure
    // optimization and must be invisible in results
    "agg_aqe_coalesce" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // plain SQL join: the injected Bloom filter is a pure
    // optimization and must be invisible in results
    "join_runtime_bloom" ->
      s"""SELECT p_type, COUNT(*) AS n_items,
         |  ${sql.discountedSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = 'Brand#12'
         |GROUP BY p_type ORDER BY p_type""".stripMargin,
    // plain SQL replay of the derived skew: AQE's runtime split (like
    // the salt) must be invisible in results
    "join_skew_aqe_parity" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1
        |             ELSE o_custkey END AS j_custkey, o_totalprice
        |      FROM orders) o
        |JOIN customer c ON o.j_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "join_full_outer" ->
      """WITH c AS (SELECT c_custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_custkey, COUNT(*) AS n_orders
        |      FROM orders GROUP BY o_custkey)
        |SELECT CASE
        |    WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
        |      THEN 'both'
        |    WHEN c.c_custkey IS NOT NULL THEN 'customer_only'
        |    ELSE 'orders_only' END AS side,
        |  COUNT(*) AS n,
        |  CAST(SUM(COALESCE(o.n_orders, 0)) AS BIGINT) AS sum_orders
        |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |GROUP BY side ORDER BY side""".stripMargin,
    // lexicographic sort of the fixed-length lowercase hex prefix ==
    // numeric sort of the parsed 48-bit value the aggregator scores by
    "sample_bottomk_per_group" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS hp
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY hp, doc_id) AS INT) AS rank
        |  FROM h)
        |SELECT source, rank, doc_id FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,
    "join_range_bands" ->
      s"""WITH bands(band, lo, hi) AS (
         |  SELECT * FROM (VALUES
         |    ('b0_lt1k', 0, 1000), ('b1_1k_5k', 1000, 5000),
         |    ('b2_5k_20k', 5000, 20000), ('b3_20k_60k', 20000, 60000),
         |    ('b4_60k_150k', 60000, 150000),
         |    ('b5_150k_400k', 150000, 400000),
         |    ('b6_ge400k', 400000, 600000)))
         |SELECT b.band, COUNT(*) AS n_orders,
         |  ${sql.dsum("o.o_totalprice")} AS sum_price
         |FROM orders o JOIN bands b
         |  ON o.o_totalprice >= CAST(b.lo AS DOUBLE)
         |  AND o.o_totalprice < CAST(b.hi AS DOUBLE)
         |GROUP BY b.band ORDER BY b.band""".stripMargin,
    "join_supplier_stats" ->
      s"""SELECT r_name, COUNT(*) AS n_suppliers,
         |  ${sql.dsum("s_acctbal")} AS sum_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_shuffle_parity" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  ${sql.discountedSum("l_extendedprice", "l_discount")} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "filter_range_slice" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders) t
        |WHERE rn > 100 AND rn <= 120 ORDER BY o_orderkey""".stripMargin,
    "scan_row_counts" ->
      (graft.Tables.all.map(t =>
        s"SELECT '$t' AS tbl, COUNT(*) AS n_rows FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY tbl")),
    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sql.dsum("l_quantity")} AS sum_qty,
         |  ${sql.dsum("l_extendedprice")} AS sum_base_price,
         |  ${sql.discountedSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  ${sql.davg("l_quantity")} AS avg_qty,
         |  ${sql.davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "filter_selective" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-09-01 00:00:00'
        |  AND l_returnflag = 'R' AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_top_revenue" ->
      s"""SELECT l_orderkey,
         |  o_orderdate, o_orderpriority,
         |  ${sql.discountedSum("l_extendedprice", "l_discount")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "join_regional_revenue" ->
      s"""SELECT n_name,
         |  ${sql.discountedSum("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,
    // identical statement: the CBO form must be semantically
    // indistinguishable from the hand-ordered plan — only the plan
    // derivation differs (statistics + cost-based reorder)
    "join_regional_revenue_cbo" ->
      s"""SELECT n_name,
         |  ${sql.discountedSum("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,
    "window_ratio_to_report" ->
      """WITH nr AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM customer
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name,
        |  CAST(rev AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE)
        |    AS region_revenue,
        |  round(CAST(rev AS DOUBLE) /
        |    CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 9)
        |    AS share
        |FROM nr ORDER BY r_name, n_name""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "window_latest_per_group" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "window_topn_per_group" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "window_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "filter_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 42""".stripMargin,
    "setop_union_except" ->
      """SELECT * FROM (
        |  (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0)
        |  EXCEPT ALL
        |  (SELECT c_custkey FROM customer WHERE c_custkey % 15 = 0)
        |) t
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
        |ORDER BY c_custkey""".stripMargin,
    "sample_systematic" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'
        |ORDER BY o_orderkey""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  (CASE WHEN lang = 'en' THEN '20' ELSE '80' END)
        |ORDER BY doc_id""".stripMargin,
  )
}
